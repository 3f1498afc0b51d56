"""phaser_annotate parity vs the reference tool (pysam/vcf shims)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import datagen
import refrunner
from phaser_tpu.analysis.annotate import run_annotate
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser
from phaser_tpu.io import bgzf, tabix

REF_ANNOTATE = "/root/reference/phaser_annotate/phaser_annotate.py"

CADD_NCOL = 106


def _make_cadd(tmp_path, data, rng_seed=0):
    """Synthetic CADD whole_genome_SNVs-like file covering the fixture's
    variants (plus some with GeneID 'NA' so the reference's
    all_genes.remove('NA') doesn't KeyError)."""
    rng = np.random.default_rng(rng_seed)
    rows = []
    for i, v in enumerate(data.variants):
        for alt in v.alts:
            if len(alt) != 1 or len(v.ref) != 1:
                continue
            cols = ["NA"] * CADD_NCOL
            cols[0] = v.chrom
            cols[1] = str(v.pos)
            cols[2] = v.ref
            cols[4] = alt
            cols[10] = rng.choice(["SYNONYMOUS", "NON_SYNONYMOUS",
                                   "STOP_GAINED", "INTRONIC"])
            if i % 7 == 0:
                cols[92] = "NA"       # unannotated gene
                cols[95] = "NA"
            else:
                gi = (v.pos // 3000)
                cols[92] = "ENSG%08d" % gi
                cols[95] = "GENE%d" % gi
            cols[105] = "%0.2f" % rng.uniform(0.1, 40.0)
            rows.append("\t".join(cols))
    path = str(tmp_path / "cadd.tsv.gz")
    bgzf.compress_to_path(("\n".join(rows) + "\n").encode(), path)
    tabix.build_text_index(path, preset="generic", col_seq=1, col_beg=2,
                           col_end=2)
    return path


def test_annotate_parity(tmp_path):
    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=21, contigs=("chr20",), contig_len=30000,
        n_variants_per_contig=100, n_reads_per_contig=1800,
        frac_multiallelic=0.0)
    prefix = str(tmp_path / "out")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=prefix, mapq="10",
               baseq=10, paired_end="1", opts=PhaserOptions(),
               log=lambda *a: None)
    phased_vcf = prefix + ".vcf.gz"
    cadd = _make_cadd(tmp_path, data)

    env = dict(os.environ)
    env["PYTHONPATH"] = refrunner.SHIM_PY + ":" + env.get("PYTHONPATH", "")
    env["PHASER_TPU_REPO"] = refrunner.REPO
    # py3-compat patched oracle copy (the tool is python-2-era)
    src = open(REF_ANNOTATE).read()
    src = src.replace('gzip.open(args.geno_vcf,"r")',
                      'gzip.open(args.geno_vcf,"rt")')
    patched = str(tmp_path / "ref_annotate.py")
    open(patched, "w").write(src)
    ref_out = str(tmp_path / "ref_annot.txt")
    proc = subprocess.run(
        [sys.executable, patched, "--geno_vcf", phased_vcf,
         "--sample", data.sample, "--cadd_file", cadd, "--o", ref_out,
         "--threads", "1"],
        env=env, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    our_out = str(tmp_path / "our_annot.txt")
    run_annotate(phased_vcf, data.sample, our_out, cadd_file=cadd,
                 log=lambda *a: None)

    ref_lines = open(ref_out).read().splitlines()
    our_lines = open(our_out).read().splitlines()
    assert ref_lines[0] == our_lines[0]
    # reference row order is set-iteration over genes; compare sorted
    assert sorted(our_lines[1:]) == sorted(ref_lines[1:])
    assert len(our_lines) > 1
