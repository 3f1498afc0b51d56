"""Real-TPU VALUE parity for the int16-delta windowed Pallas kernel.

The delta-nibble format is the production TPU path for D/split-M reads
(mapper/dispatch.py routes them through assign_compact_delta_nibble_windowed)
but until round 5 the only on-chip evidence was hit-COUNT equality — exactly
the kind of check the Mosaic gather/select miscompile class defeats (wrong
VALUES with right shapes; see kernels/alleles lookup() and the round-3
vacuous-plan finding).  This test proves the kernel BY VALUE on the chip:

  parent (CPU):  datagen fixture -> pack_delta_nibble (native C++) ->
                 plan_windows_minmax asserted non-None -> expected FULL
                 (row, vidx, allele) hits from the CPU XLA kernel, which the
                 parent itself cross-checks against the HOST mapper
                 (mapper.host.assign_alleles + engine.hits.classify_alleles);
  subprocess (TPU): runs BOTH the XLA delta kernel and the windowed Pallas
                 delta kernel on the real chip and compares their decoded
                 (row, vidx, allele, base) arrays ELEMENTWISE against the
                 expected arrays.

Default-on: skips (not fails) only when no TPU backend is reachable or the
native packer is absent.  Reference semantics being guarded:
/root/reference/phaser/read_variant_map.py:165-234 (per-read allele
extraction over deletion/split-M CIGARs).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_gate = os.environ.get("PHASER_TPU_HW_TESTS")

_SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
import json
import numpy as np, jax, jax.numpy as jnp
if jax.default_backend() == "cpu":
    print(json.dumps({"skip": "no TPU backend reachable"}))
    sys.exit(0)
from phaser_tpu.kernels.alleles import (assign_compact_delta_nibble,
                                        assign_compact_delta_nibble_windowed,
                                        decode_packed_hits)
d = np.load(%(npz)r)
cap = int(d["cap"][0])
jnc, jst, jdl = jnp.asarray(d["ncd"]), jnp.asarray(d["dst"]), \
    jnp.asarray(d["dlt"])
jws, jv = jnp.asarray(d["ws"]), jnp.asarray(d["vpos"])
ji, jn = jnp.asarray(d["ind"]), jnp.asarray(d["ni"])
px = assign_compact_delta_nibble(jnc, jst, jdl, jv, ji, jn, cap)
pw = assign_compact_delta_nibble_windowed(jnc, jst, jdl, jws, jv, ji, jn,
                                          cap)
rx = decode_packed_hits(np.asarray(px))
rw = decode_packed_hits(np.asarray(pw))
exp = [d["er"], d["ev"], d["ea"], d["em"]]
def nmm(got):
    if got[4] != len(exp[0]):
        return abs(int(got[4]) - len(exp[0])) + 10**6
    return int(sum(int((np.asarray(a) != b).sum())
                   for a, b in zip(got[:4], exp)))
print(json.dumps({"hits": int(rx[4]),
                  "mm_xla": nmm(rx), "mm_windowed": nmm(rw)}))
"""


def _delta_fixture(tmp_path):
    """Fixture + packed arrays + CPU-expected hits; skips without the
    native packer. Returns (npz_path, n_hits)."""
    import jax.numpy as jnp

    import datagen
    from phaser_tpu.engine.hits import classify_alleles
    from phaser_tpu.engine.varmap import build_variant_table
    from phaser_tpu.io import bam as bamio
    from phaser_tpu.io import vcf as vcfio
    from phaser_tpu.kernels.alleles import (assign_compact_delta_nibble,
                                            decode_packed_hits,
                                            pack_delta_nibble,
                                            plan_windows_minmax)
    from phaser_tpu.mapper.host import assign_alleles

    # sizes chosen so every 256-row block's variant band fits the 256-entry
    # VMEM window (plan asserted below) while still yielding >1k hits
    vcf, bam, _ = datagen.write_fixture_dir(
        str(tmp_path), seed=45, contigs=("chr20",), contig_len=50000,
        n_variants_per_contig=1000, n_reads_per_contig=10000,
        frac_spliced=0.15, frac_indel_reads=0.8)
    lines = [l for l in vcfio.het_filtered_lines(vcf, 9)
             if not l.startswith("#")]
    hs = vcfio.parse_het_sites(lines, "", ["_", ":"], True)
    vt = build_variant_table("chr20", hs.pool["chr20"])
    bd = bamio.read_bam(bam)
    chunk = bd.select((bd.refid == 0) & ((bd.flag & 0x404) == 0))
    dn = pack_delta_nibble(chunk, 10)
    if dn is None:
        pytest.skip("native packer unavailable")
    ncd, dlt, okm, dst, rmn, rmx = dn
    ok_idx = np.flatnonzero(okm)
    # multiple 256-row blocks AND a ragged tail block
    assert ok_idx.size > 512 and ok_idx.size % 256 != 0, ok_idx.size
    sub = chunk.select(ok_idx)
    vpos = vt.pos.astype(np.int32)
    cap = 1 << 16
    ws = plan_windows_minmax(rmn[ok_idx], rmx[ok_idx],
                             np.ones(ok_idx.size, bool), vpos,
                             ok_idx.size, 256)
    assert ws is not None, \
        "windowed plan failed: the Pallas comparison would be vacuous"
    px = assign_compact_delta_nibble(
        jnp.asarray(ncd[ok_idx]), jnp.asarray(dst[ok_idx]),
        jnp.asarray(dlt[ok_idx]), jnp.asarray(vpos),
        jnp.asarray(vt.ind_codes), jnp.asarray(vt.n_ind), cap)
    er, ev, ea, em, nh = decode_packed_hits(np.asarray(px))
    assert nh > 1000, "fixture too sparse for a meaningful value check"

    # cross-check the CPU-expected hits against the HOST mapper (order-free)
    hits = assign_alleles(sub, vt, baseq=10)
    ha = classify_alleles(hits, vt)
    got = sorted(zip(er.tolist(), ev.tolist(), ea.tolist()))
    want = sorted(zip(hits.read_idx.tolist(), hits.var_idx.tolist(),
                      ha.tolist()))
    assert got == want, "CPU XLA delta kernel disagrees with the host mapper"

    npz = os.path.join(str(tmp_path), "delta_hw.npz")
    np.savez(npz, ncd=ncd[ok_idx], dst=dst[ok_idx], dlt=dlt[ok_idx],
             ws=ws, vpos=vpos, ind=vt.ind_codes, ni=vt.n_ind,
             cap=np.array([cap]), er=er, ev=ev, ea=ea, em=em)
    return npz, nh


@pytest.mark.skipif(_gate == "0", reason="PHASER_TPU_HW_TESTS=0")
def test_delta_nibble_windowed_value_parity_hw(tmp_path):
    """Default-on: both delta kernels (XLA + windowed Pallas) must produce
    the exact expected (row, vidx, allele, base) sequence on the real chip
    over >1k hits."""
    npz, nh = _delta_fixture(tmp_path)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": _REPO, "npz": npz}],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, (proc.stderr[-2000:] or proc.stdout[-2000:])
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    if "skip" in payload:
        pytest.skip(payload["skip"])
    assert payload["hits"] == nh
    assert payload["hits"] > 1000
    assert payload["mm_xla"] == 0, payload
    assert payload["mm_windowed"] == 0, payload
