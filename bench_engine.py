"""Full-ENGINE end-to-end benchmark vs the live reference pipeline.

bench.py measures the mapper stage; this measures the complete phasing
engine — VCF het filter, mapping, AS cutoff, noise, connection tests, block
discovery, 2^n phasing, GW anchoring, all output writers, phased VCF — on
one synthetic chromosome, against the ACTUAL reference `phaser.py` running
through the repo's tool shims (tests/refrunner.py), single-threaded, same
inputs. Outputs are verified equivalent (canonicalized for the reference's
hash-order-nondeterministic fields) before timings are reported.

Prints ONE JSON line:
  {"metric": "engine_e2e_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": N, ...}

Sizes via env: ENG_READS (120000), ENG_VARIANTS (3000), ENG_CONTIG_LEN
(1200000). ENG_BENCH_OUT writes the payload to a JSON file as well.
"""

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

N_READS = int(os.environ.get("ENG_READS", 120_000))
N_VARIANTS = int(os.environ.get("ENG_VARIANTS", 3000))
CONTIG_LEN = int(os.environ.get("ENG_CONTIG_LEN", 1_200_000))


def main():
    import datagen
    import compare_outputs as co
    import refrunner
    from phaser_tpu.engine.output_stage import PhaserOptions
    from phaser_tpu.engine.pipeline import run_phaser

    with tempfile.TemporaryDirectory() as td:
        vcf, bam, data = datagen.write_fixture_dir(
            td, seed=77, contigs=("chr22",), contig_len=CONTIG_LEN,
            n_variants_per_contig=N_VARIANTS, n_reads_per_contig=N_READS,
            error_rate=0.01)

        ours = os.path.join(td, "ours")
        t0 = time.perf_counter()
        res = run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours,
                         mapq="10", baseq=10, paired_end="1", device="host",
                         opts=PhaserOptions(), log=lambda *a: None)
        t_ours = time.perf_counter() - t0

        ref = os.path.join(td, "ref")
        t0 = time.perf_counter()
        proc = refrunner.run_reference_phaser(
            vcf, bam, data.sample, ref, timeout=3600)
        t_ref = time.perf_counter() - t0
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr[-1000:])

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

    payload = {
        "metric": "engine_e2e_reads_per_s",
        "value": round(N_READS / t_ours, 1),  # input reads decoded+filtered
        "unit": "reads/s",
        "vs_baseline": round(t_ref / t_ours, 2),
        "baseline_engine": "reference phaser.py (interpreted, 1 thread, "
                           "through repo shims)",
        "outputs_equivalent": True,
        "n_reads_used": n_reads,
        "n_input_reads": N_READS,
        "n_variants": N_VARIANTS,
        "ours_wall_s": round(t_ours, 3),
        "reference_wall_s": round(t_ref, 3),
    }
    print(json.dumps(payload))
    out_json = os.environ.get("ENG_BENCH_OUT", "")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
