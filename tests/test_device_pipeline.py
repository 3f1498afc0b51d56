"""Device dispatch path must produce byte-identical engine outputs."""

import filecmp

import pytest

import datagen
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser


@pytest.mark.parametrize("gen_kw", [
    dict(seed=51, contigs=("chr20",), contig_len=20000,
         n_variants_per_contig=100, n_reads_per_contig=1500,
         error_rate=0.01),
    dict(seed=52, contigs=("chr20", "chr21"), contig_len=15000,
         n_variants_per_contig=80, n_reads_per_contig=900,
         include_indel_variants=True, frac_indel_reads=0.2,
         frac_multiallelic=0.15),
])
def test_device_vs_host_engine(tmp_path, gen_kw):
    vcf, bam, data = datagen.write_fixture_dir(str(tmp_path), **gen_kw)
    opts = PhaserOptions(include_indels=1)
    a = str(tmp_path / "host")
    b = str(tmp_path / "dev")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=a, mapq="10", baseq=10,
               paired_end="1", opts=opts, device="host", log=lambda *x: None)
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=b, mapq="10", baseq=10,
               paired_end="1", opts=opts, device="auto", log=lambda *x: None)
    for suffix in (".allelic_counts.txt", ".variant_connections.txt",
                   ".allele_config.txt", ".haplotypes.txt",
                   ".haplotypic_counts.txt", ".vcf.gz"):
        assert filecmp.cmp(a + suffix, b + suffix, shallow=False), suffix


def test_streaming_engine_identical(tmp_path, monkeypatch):
    """Forced streaming decode must give byte-identical engine outputs."""
    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=53, contigs=("chr20", "chr21"), contig_len=15000,
        n_variants_per_contig=70, n_reads_per_contig=900)
    a = str(tmp_path / "whole")
    b = str(tmp_path / "stream")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=a, mapq="10", baseq=10,
               paired_end="1", opts=PhaserOptions(), log=lambda *x: None)
    monkeypatch.setenv("PHASER_TPU_STREAM_THRESHOLD_MB", "0.01")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=b, mapq="10", baseq=10,
               paired_end="1", opts=PhaserOptions(), log=lambda *x: None)
    for suffix in (".allelic_counts.txt", ".variant_connections.txt",
                   ".allele_config.txt", ".haplotypes.txt",
                   ".haplotypic_counts.txt", ".vcf.gz"):
        assert filecmp.cmp(a + suffix, b + suffix, shallow=False), suffix
