"""End-to-end phaser_tpu workflow on synthetic data.

Mirrors the reference's documented pipeline (README workflow figure +
phaser_pop/cis_var_example/run.sh): per-sample read-backed phasing ->
gene-level AE -> population expression matrix -> cis-variant effect sizes,
plus compound-het annotation off the phased VCF.

Run:  python examples/full_workflow.py /tmp/phaser_tpu_demo
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np


def main(outdir: str, n_samples: int = 4) -> None:
    import datagen
    from phaser_tpu.analysis.annotate import run_annotate
    from phaser_tpu.analysis.cis_var import run_cis_var
    from phaser_tpu.analysis.expr_matrix import run_expr_matrix
    from phaser_tpu.analysis.gene_ae import run_gene_ae
    from phaser_tpu.engine.output_stage import PhaserOptions
    from phaser_tpu.engine.pipeline import run_phaser
    from phaser_tpu.io import bgzf, tabix

    os.makedirs(outdir, exist_ok=True)
    gene_ae_dir = os.path.join(outdir, "gene_ae")
    os.makedirs(gene_ae_dir, exist_ok=True)

    # shared gene annotation
    rng = np.random.default_rng(0)
    features = os.path.join(outdir, "genes.bed")
    genes = []
    with open(features, "w") as f:
        for g in range(12):
            start = 1000 + g * 2300
            name = "ENSG%08d" % g
            genes.append((name, start))
            f.write("chr22\t%d\t%d\t%s\n" % (start, start + 2000, name))

    # 1..n samples: phase + gene AE
    all_gts = {}
    sample_rows = []
    first_variants = None
    for i in range(n_samples):
        sdir = os.path.join(outdir, "s%d" % i)
        os.makedirs(sdir, exist_ok=True)
        data = datagen.generate(
            seed=100, read_seed=500 + i, contigs=("chr22",),
            contig_len=30000, n_variants_per_contig=120,
            n_reads_per_contig=2500, sample="SAMPLE%d" % i)
        first_variants = data.variants
        vcf = os.path.join(sdir, "s.vcf.gz")
        bam = os.path.join(sdir, "s.bam")
        data.write_vcf(vcf)
        data.write_bam(bam)
        prefix = os.path.join(sdir, "out")
        print("== sample %d: phasing" % i)
        run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=prefix,
                   mapq="10", baseq=10, paired_end="1",
                   opts=PhaserOptions(), device="auto",
                   log=lambda *a: None)
        gene_out = os.path.join(gene_ae_dir, "sample%d.txt" % i)
        run_gene_ae(prefix + ".haplotypic_counts.txt", features, gene_out,
                    log=lambda *a: None)
        txt = open(gene_out).read().replace("\tout\n", "\tS%d\n" % i)
        open(gene_out, "w").write(txt)
        sample_rows.append("V%d\tS%d" % (i, i))

    # 2 expression matrix
    print("== expression matrix")
    matrix_prefix = os.path.join(outdir, "matrix")
    run_expr_matrix(gene_ae_dir, features, matrix_prefix, log=print)

    # 3 population VCF + pairs + map for cis-var
    print("== cis-var")
    vsamples = ["V%d" % i for i in range(n_samples)]
    vlines = ["##fileformat=VCFv4.2",
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" +
              "\t".join(vsamples)]
    pairs = ["gene_id\tvar_id\tvar_contig\tvar_pos\tvar_ref\tvar_alt"]
    for k, v in enumerate(first_variants[:40]):
        if len(v.ref) != 1 or any(len(a) != 1 for a in v.alts):
            continue
        gts = rng.choice(["0|1", "1|0", "0|0", "1|1"], size=n_samples)
        vlines.append("chr22\t%d\t%s\t%s\t%s\t100\tPASS\t.\tGT\t%s"
                      % (v.pos, v.rsid, v.ref, v.alts[0], "\t".join(gts)))
        pairs.append("%s\t%s\tchr22\t%d\t%s\t%s"
                     % (genes[k % len(genes)][0], v.rsid, v.pos, v.ref,
                        v.alts[0]))
    pop_vcf = os.path.join(outdir, "pop.vcf.gz")
    bgzf.compress_to_path(("\n".join(vlines) + "\n").encode(), pop_vcf)
    tabix.build_vcf_index(pop_vcf)
    pairs_path = os.path.join(outdir, "pairs.txt")
    open(pairs_path, "w").write("\n".join(pairs) + "\n")
    map_path = os.path.join(outdir, "sample_map.txt")
    open(map_path, "w").write("vcf_sample\tbed_sample\n" +
                              "\n".join(sample_rows) + "\n")
    cis_out = os.path.join(outdir, "cis_var.txt")
    run_cis_var(matrix_prefix + ".gw_phased.bed.gz", pop_vcf, pairs_path,
                map_path, cis_out, bs=1000, min_cov=2, log=print)

    # 4 compound-het annotation off sample 0's phased VCF
    print("== annotate")
    cadd_rows = []
    for v in first_variants:
        if len(v.ref) != 1 or any(len(a) != 1 for a in v.alts):
            continue
        cols = ["NA"] * 106
        cols[0], cols[1], cols[2], cols[4] = "chr22", str(v.pos), v.ref, v.alts[0]
        cols[10] = "NON_SYNONYMOUS"
        gi = (v.pos - 1000) // 2300
        if 0 <= gi < len(genes):
            cols[92] = genes[gi][0]
            cols[95] = "GENE%d" % gi
        cols[105] = "10.0"
        cadd_rows.append("\t".join(cols))
    cadd = os.path.join(outdir, "cadd.tsv.gz")
    bgzf.compress_to_path(("\n".join(cadd_rows) + "\n").encode(), cadd)
    tabix.build_text_index(cadd, preset="generic", col_seq=1, col_beg=2,
                           col_end=2)
    annot_out = os.path.join(outdir, "compound_hets.txt")
    run_annotate(os.path.join(outdir, "s0", "out.vcf.gz"), "SAMPLE0",
                 annot_out, cadd_file=cadd, log=print)

    print("\nOutputs in %s:" % outdir)
    for root, _, files in os.walk(outdir):
        for f in sorted(files):
            if f.endswith((".txt", ".gz")):
                p = os.path.join(root, f)
                print("  %-60s %8d bytes" % (os.path.relpath(p, outdir),
                                             os.path.getsize(p)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/phaser_tpu_demo")
