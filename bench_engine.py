"""Full-ENGINE end-to-end benchmark vs the live reference pipeline.

bench.py measures the mapper stage; this measures the complete phasing
engine — VCF het filter, mapping, AS cutoff, noise, connection tests, block
discovery, 2^n phasing, GW anchoring, all output writers, phased VCF — on a
SKEWED multi-contig workload (chr1 60% / chr2 25% / chr3 15% of reads),
against the ACTUAL reference `phaser.py` running through the repo's tool
shims (tests/refrunner.py) at BOTH --threads 1 and --threads <ncpu> (the
reference ships a fork pool, phaser.py:62 — an honest headline must beat
its parallel form too). Outputs are verified equivalent (canonicalized for
the reference's hash-order-nondeterministic fields) before timings are
reported.

Prints ONE JSON line:
  {"metric": "engine_e2e_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": N, ...}   (vs_baseline is against the BEST reference time)

Sizes via env: ENG_READS = total input READS (1_000_000; split 60/25/15
across three contigs, paired — so ENG_READS/2 pairs are generated),
ENG_BENCH_OUT writes the payload to a JSON file as well.
"""

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

N_READS = int(os.environ.get("ENG_READS", 1_000_000))


def main():
    import datagen
    import compare_outputs as co
    import refrunner
    from phaser_tpu.engine.output_stage import PhaserOptions
    from phaser_tpu.engine.pipeline import run_phaser

    shares = (0.6, 0.25, 0.15)
    pairs = [int(N_READS // 2 * s) for s in shares]
    lens = [max(250_000, p * 12) for p in pairs]
    nvar = [max(100, p // 40) for p in pairs]

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        vcf, bam, data = datagen.write_fixture_dir(
            td, seed=77, contigs=("chr1", "chr2", "chr3"), contig_len=lens,
            n_variants_per_contig=nvar, n_reads_per_contig=pairs,
            error_rate=0.01)
        print("# fixture: %d reads, %d variants in %.0fs"
              % (sum(pairs) * 2, sum(nvar), time.perf_counter() - t0),
              file=sys.stderr)

        ours = os.path.join(td, "ours")
        t0 = time.perf_counter()
        res = run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours,
                         mapq="10", baseq=10, paired_end="1", device="host",
                         opts=PhaserOptions(), log=lambda *a: None)
        t_ours = time.perf_counter() - t0
        print("# ours: %.1fs" % t_ours, file=sys.stderr)

        # our parallel form: 2 position-sharded processes pinned to
        # separate cores (parallel-vs-parallel against the reference's
        # --threads pool below); outputs byte-checked against the single run
        t_ours2 = None
        if (os.cpu_count() or 1) > 1:
            import re
            import socket
            import subprocess
            with socket.socket() as s:
                s.bind(("localhost", 0))
                port = s.getsockname()[1]
            prefix2 = os.path.join(td, "ours2")
            procs = []
            for pid in range(2):
                cmd = ["taskset", "-c", str(pid % (os.cpu_count() or 1)),
                       sys.executable, "-m",
                       "phaser_tpu.dist.engine_multihost",
                       "--bam", bam, "--vcf", vcf, "--sample", data.sample,
                       "--o", prefix2, "--num-processes", "2",
                       "--process-id", str(pid), "--position-shards",
                       "--coordinator", "localhost:%d" % port]
                env = {k: v for k, v in os.environ.items()
                       if k != "XLA_FLAGS"}
                procs.append(subprocess.Popen(
                    cmd, cwd=_REPO, env=env, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, text=True))
            walls = []
            for p in procs:
                out, _ = p.communicate(timeout=7200)
                if p.returncode != 0:
                    raise RuntimeError(out[-2000:])
                walls.append(float(
                    re.search(r"wall_s=([0-9.]+)", out).group(1)))
            t_ours2 = max(walls)
            for sfx in ("haplotypes.txt", "haplotypic_counts.txt",
                        "allelic_counts.txt"):
                a = open(ours + "." + sfx).read()
                b = open(prefix2 + "." + sfx).read()
                assert a == b, "sharded output %s diverged" % sfx
            print("# ours 2-proc: %.1fs" % t_ours2, file=sys.stderr)

        ref = os.path.join(td, "ref")
        t0 = time.perf_counter()
        proc = refrunner.run_reference_phaser(
            vcf, bam, data.sample, ref, timeout=7200)
        t_ref1 = time.perf_counter() - t0
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-1000:])
        print("# reference t1: %.1fs" % t_ref1, file=sys.stderr)

        ncpu = os.cpu_count() or 1
        t_refn = None
        if ncpu > 1:
            refn = os.path.join(td, "refn")
            t0 = time.perf_counter()
            proc = refrunner.run_reference_phaser(
                vcf, bam, data.sample, refn, timeout=7200,
                extra={"threads": str(ncpu)})
            t_refn = time.perf_counter() - t0
            if proc.returncode != 0:
                raise RuntimeError(proc.stderr[-1000:])
            print("# reference t%d: %.1fs" % (ncpu, t_refn), file=sys.stderr)

        # equivalence before timing claims (canonicalized where the
        # reference itself is hash-order nondeterministic)
        co.assert_exact(ref + ".allelic_counts.txt",
                        ours + ".allelic_counts.txt")
        co.assert_same_connections(ref + ".variant_connections.txt",
                                   ours + ".variant_connections.txt")
        co.assert_same_haplotypes(ref + ".haplotypes.txt",
                                  ours + ".haplotypes.txt")
        co.assert_same_hap_counts(ref + ".haplotypic_counts.txt",
                                  ours + ".haplotypic_counts.txt")
        co.assert_same_vcf(ref + ".vcf.gz", ours + ".vcf.gz")

        n_reads = res.total_reads

    t_best_ref = min(t_ref1, t_refn) if t_refn else t_ref1
    payload = {
        "metric": "engine_e2e_reads_per_s",
        "value": round(N_READS / t_ours, 1),  # input reads decoded+filtered
        "unit": "reads/s",
        "vs_baseline": round(t_best_ref / t_ours, 2),
        "baseline_engine": "reference phaser.py (interpreted, through repo "
                           "shims) at its BEST thread count",
        "vs_reference_1thread": round(t_ref1 / t_ours, 2),
        "vs_reference_%dthreads" % (os.cpu_count() or 1):
            round(t_refn / t_ours, 2) if t_refn else None,
        "outputs_equivalent": True,
        "workload": "3 skewed contigs (60/25/15%% of reads), paired",
        "n_reads_used": n_reads,
        "n_input_reads": N_READS,
        "n_variants": sum(nvar),
        "ours_wall_s": round(t_ours, 3),
        "ours_sharded2_wall_s": round(t_ours2, 3) if t_ours2 else None,
        "vs_reference_parallel_vs_parallel":
            round(t_refn / t_ours2, 2) if (t_refn and t_ours2) else None,
        "reference_wall_s_1thread": round(t_ref1, 3),
        "reference_wall_s_%dthreads" % (os.cpu_count() or 1):
            round(t_refn, 3) if t_refn else None,
    }
    print(json.dumps(payload))
    out_json = os.environ.get("ENG_BENCH_OUT", "")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
