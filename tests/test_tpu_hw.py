"""Real-TPU-only parity checks (skipped on the CPU test mesh).

The Mosaic interpreter accepts some programs that the hardware lowering
miscompiles (e.g. dynamic_gather fed by a where-select — see
kernels/alleles._alleles_pallas_windowed_kernel), so the windowed Pallas
kernel must also be proven on the real chip.  Run explicitly with:

    PHASER_TPU_HW_TESTS=1 python -m pytest tests/test_tpu_hw.py -q

(conftest pins JAX_PLATFORMS=cpu for the normal suite; this file spawns a
subprocess with the default platform so it reaches the axon TPU.)
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("PHASER_TPU_HW_TESTS") != "1",
    reason="real-TPU hardware tests (set PHASER_TPU_HW_TESTS=1; needs the "
           "axon chip and tolerance for first-compile latency)")

_SCRIPT = r"""
import sys
sys.path.insert(0, %r)
import numpy as np, jax, jax.numpy as jnp
from phaser_tpu.kernels.alleles import (assign_alleles_device,
                                        assign_alleles_pallas_windowed)
assert jax.default_backend() != "cpu", jax.default_backend()
rng = np.random.default_rng(0)
M = 100_000
CONTIG = 200_000_000
vpos = np.sort(rng.choice(np.arange(1, CONTIG, dtype=np.int64), size=M,
                          replace=False)).astype(np.int32)
ind = rng.integers(1, 9, size=(M, 2)).astype(np.uint8)
ni = np.full(M, 2, np.int8)
N, L = 1 << 15, 128
starts = np.sort(rng.integers(1, CONTIG - L, size=N)).astype(np.int32)
refpos = starts[:, None] + np.arange(L, dtype=np.int32)[None, :]
codes = rng.integers(1, 16, size=(N, L)).astype(np.uint8)
quals = rng.integers(0, 40, size=(N, L)).astype(np.uint8)
jc, jq, jr = jnp.asarray(codes), jnp.asarray(quals), jnp.asarray(refpos)
jv, ji, jn = jnp.asarray(vpos), jnp.asarray(ind), jnp.asarray(ni)
wv, wa = assign_alleles_device(jc, jq, jr, jv, ji, jn, 10)
gv, ga = assign_alleles_pallas_windowed(jc, jq, jr, jv, ji, jn, 10)

@jax.jit
def s(wv, wa, gv, ga):
    return ((wv != gv) | (wa != ga)).sum(), (wv >= 0).sum()

mm, hits = (int(x) for x in np.asarray(jnp.stack(s(wv, wa, gv, ga))))
import json
print(json.dumps({"mismatches": mm, "hits": hits}))
"""


def test_pallas_windowed_matches_xla_on_hw():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run([sys.executable, "-c", _SCRIPT % _REPO],
                          capture_output=True, text=True, timeout=1800,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["hits"] > 1000
    assert payload["mismatches"] == 0, payload
