"""Gene AE parity vs the reference phaser_gene_ae.py (via intervaltree shim)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import datagen
import refrunner
from phaser_tpu.analysis.gene_ae import run_gene_ae
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser

REF_GENE_AE = "/root/reference/phaser_gene_ae/phaser_gene_ae.py"


def _make_features(data, tmp_path, n_genes=25, seed=0):
    rng = np.random.default_rng(seed)
    path = str(tmp_path / "features.bed")
    with open(path, "w") as f:
        for ci, chrom in enumerate(data.contigs):
            L = data.contig_lens[chrom]
            for g in range(n_genes):
                start = int(rng.integers(0, L - 3000))
                stop = start + int(rng.integers(500, 5000))
                f.write("%s\t%d\t%d\tGENE_%d_%d\n" % (chrom, start,
                                                      min(stop, L), ci, g))
    return path


def _run_reference_gene_ae(hap_counts, features, out, extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = refrunner.SHIM_PY + ":" + env.get("PYTHONPATH", "")
    cmd = [sys.executable, REF_GENE_AE, "--haplotypic_counts", hap_counts,
           "--features", features, "--o", out]
    for k, v in (extra or {}).items():
        cmd += ["--" + k, str(v)]
    return subprocess.run(cmd, capture_output=True, text=True, env=env)


@pytest.mark.parametrize("extra", [
    {}, {"gw_cutoff": 0.5}, {"min_cov": 5},
])
def test_gene_ae_parity(tmp_path, extra):
    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=7, contigs=("chr20",), contig_len=30000,
        n_variants_per_contig=110, n_reads_per_contig=2000)
    ref_prefix = str(tmp_path / "ref")
    p = refrunner.run_reference_phaser(vcf, bam, data.sample, ref_prefix)
    assert p.returncode == 0, p.stdout[-2000:]
    features = _make_features(data, tmp_path)

    hap_counts = ref_prefix + ".haplotypic_counts.txt"
    ref_out = str(tmp_path / "ref_gene_ae.txt")
    rp = _run_reference_gene_ae(hap_counts, features, ref_out, extra)
    assert rp.returncode == 0, rp.stdout + rp.stderr

    our_out = str(tmp_path / "our_gene_ae.txt")
    run_gene_ae(hap_counts, features, our_out, log=lambda *a: None, **extra)
    assert open(our_out).read() == open(ref_out).read()


def test_gene_ae_invariant_to_read_index_relabeling(tmp_path):
    """Our engine's canonical aReads indices must give identical gene counts
    to the reference's hash-order indices."""
    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=8, contigs=("chr20",), contig_len=25000,
        n_variants_per_contig=100, n_reads_per_contig=1800)
    ref_prefix = str(tmp_path / "ref")
    p = refrunner.run_reference_phaser(vcf, bam, data.sample, ref_prefix)
    assert p.returncode == 0
    our_prefix = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=our_prefix,
               mapq="10", baseq=10, paired_end="1", opts=PhaserOptions(),
               log=lambda *a: None)
    features = _make_features(data, tmp_path)
    out_a = str(tmp_path / "a.txt")
    out_b = str(tmp_path / "b.txt")
    run_gene_ae(ref_prefix + ".haplotypic_counts.txt", features, out_a,
                log=lambda *a: None)
    run_gene_ae(our_prefix + ".haplotypic_counts.txt", features, out_b,
                log=lambda *a: None)

    def canon(path):
        # the variants column inherits singleton row order, which in the
        # reference is hash-order (varies run to run); sort within the cell
        out = []
        for line in open(path).read().splitlines():
            c = line.split("\t")
            if len(c) >= 10 and c[9]:
                c[9] = ",".join(sorted(c[9].split(",")))
            out.append("\t".join(c))
        return out

    assert canon(out_a) == canon(out_b)


def test_gene_ae_min_haplo_maf_parity(tmp_path):
    """min_haplo_maf path needs real MAFs: run phasing with gw_phase_method 1."""
    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=9, contigs=("chr20",), contig_len=25000,
        n_variants_per_contig=100, n_reads_per_contig=1800)
    ref_prefix = str(tmp_path / "ref")
    p = refrunner.run_reference_phaser(vcf, bam, data.sample, ref_prefix,
                                       extra={"gw_phase_method": 1})
    assert p.returncode == 0, p.stdout[-2000:]
    features = _make_features(data, tmp_path)
    hap_counts = ref_prefix + ".haplotypic_counts.txt"
    ref_out = str(tmp_path / "ref_gene_ae.txt")
    rp = _run_reference_gene_ae(hap_counts, features, ref_out,
                                {"min_haplo_maf": 0.2})
    assert rp.returncode == 0, rp.stdout + rp.stderr
    our_out = str(tmp_path / "our_gene_ae.txt")
    run_gene_ae(hap_counts, features, our_out, min_haplo_maf=0.2,
                log=lambda *a: None)
    assert open(our_out).read() == open(ref_out).read()
