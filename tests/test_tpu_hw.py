"""Real-TPU parity checks for the windowed Pallas classifier.

The Mosaic interpreter accepts some programs that the hardware lowering
miscompiles (e.g. dynamic_gather fed by a where-select — see
kernels/alleles._alleles_pallas_windowed_kernel), so the windowed Pallas
kernel must be proven on the real chip, not just in the interpreter.

Two tiers:

  * test_windowed_smoke_parity_hw — DEFAULT-ON whenever a TPU backend is
    reachable (the script itself reports `cpu` and the test skips when it
    is not): small shapes, seconds-scale once the compile cache is warm.
  * test_pallas_windowed_matches_xla_on_hw — the whole-contig-width table
    (M=100k), gated behind PHASER_TPU_HW_TESTS=1 (first-compile latency).

Both scripts ASSERT host-side that the windowed plan succeeded
(plan_windows_* is not None) before comparing — a band overflow silently
falls back to the XLA kernel, which would make the comparison vacuous
(round-3 advisor finding: uniform read scatter made every block's band
exceed the 256-entry window, so the old test compared XLA against XLA).

conftest pins JAX_PLATFORMS=cpu for the normal suite; these tests spawn a
subprocess with the default platform so they reach the axon TPU.
Set PHASER_TPU_HW_TESTS=0 to disable even the smoke tier.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_gate = os.environ.get("PHASER_TPU_HW_TESTS")

# Read starts drawn from a few NARROW regions so each 256-read block's
# variant band fits the 256-entry VMEM window even at M=100k table width
# (uniform scatter over 200Mbp gives ~1038-entry bands — guaranteed
# fallback).  The script asserts the plan host-side either way.
_SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
import json
if jax.default_backend() == "cpu":
    print(json.dumps({"skip": "no TPU backend reachable"}))
    sys.exit(0)
from phaser_tpu.kernels.alleles import (assign_alleles_device,
                                        assign_alleles_pallas_windowed,
                                        plan_windows_plane)
rng = np.random.default_rng(0)
M = %(m)d
CONTIG = %(contig)d
vpos = np.sort(rng.choice(np.arange(1, CONTIG, dtype=np.int64), size=M,
                          replace=False)).astype(np.int32)
ind = rng.integers(1, 9, size=(M, 2)).astype(np.uint8)
ni = np.full(M, 2, np.int8)
N, L = %(n)d, 128
# narrow read regions: 8 windows of CONTIG/2000 bp each
region_w = max(CONTIG // 2000, 10 * L)
region_lo = rng.integers(1, CONTIG - region_w - L, size=8)
starts = np.sort(np.concatenate([
    rng.integers(lo, lo + region_w, size=N // 8) for lo in region_lo
])).astype(np.int32)[:N]
refpos = starts[:, None] + np.arange(L, dtype=np.int32)[None, :]
codes = rng.integers(1, 16, size=(N, L)).astype(np.uint8)
quals = rng.integers(0, 40, size=(N, L)).astype(np.uint8)
ws = plan_windows_plane(refpos, vpos)
assert ws is not None, "windowed plan failed: bands exceed the window; " \
    "the parity comparison would be vacuous (XLA vs XLA)"
jc, jq, jr = jnp.asarray(codes), jnp.asarray(quals), jnp.asarray(refpos)
jv, ji, jn = jnp.asarray(vpos), jnp.asarray(ind), jnp.asarray(ni)
wv, wa = assign_alleles_device(jc, jq, jr, jv, ji, jn, 10)
gv, ga = assign_alleles_pallas_windowed(jc, jq, jr, jv, ji, jn, 10,
                                        refpos_host=refpos, vpos_host=vpos)

@jax.jit
def s(wv, wa, gv, ga):
    return ((wv != gv) | (wa != ga)).sum(), (wv >= 0).sum()

mm, hits = (int(x) for x in np.asarray(jnp.stack(s(wv, wa, gv, ga))))
print(json.dumps({"mismatches": mm, "hits": hits, "windowed_taken": True}))
"""


def _run_hw_script(m: int, n: int, contig: int, timeout: int) -> dict:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         _SCRIPT % {"repo": _REPO, "m": m, "n": n, "contig": contig}],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert proc.returncode == 0, (proc.stderr[-2000:] or proc.stdout[-2000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.skipif(_gate == "0", reason="PHASER_TPU_HW_TESTS=0")
def test_windowed_smoke_parity_hw():
    """Default-on hardware smoke: skips (not fails) when no TPU backend is
    reachable; otherwise proves windowed-kernel parity on the chip at small
    shapes (seconds-scale with a warm compile cache)."""
    payload = _run_hw_script(m=4096, n=4096, contig=2_000_000, timeout=600)
    if "skip" in payload:
        pytest.skip(payload["skip"])
    assert payload["windowed_taken"]
    assert payload["hits"] > 100
    assert payload["mismatches"] == 0, payload


@pytest.mark.skipif(
    _gate != "1",
    reason="full-width real-TPU test (set PHASER_TPU_HW_TESTS=1; needs the "
           "axon chip and tolerance for first-compile latency)")
def test_pallas_windowed_matches_xla_on_hw():
    """Whole-contig table width (M=100k): the production configuration of
    the scalar-prefetch windowed kernel."""
    payload = _run_hw_script(m=100_000, n=1 << 15, contig=200_000_000,
                             timeout=1800)
    if "skip" in payload:
        pytest.skip(payload["skip"])
    assert payload["windowed_taken"]
    assert payload["hits"] > 1000
    assert payload["mismatches"] == 0, payload
