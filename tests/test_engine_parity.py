"""End-to-end engine parity: run the reference phaser.py (through shims) and
phaser_tpu's pipeline on the same fixtures; compare all output files."""

import os

import pytest

import compare_outputs as cmp
import datagen
import refrunner
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser


def _run_both(tmp_path, gen_kw, ref_extra=None, opts=None, run_kw=None,
              mapq="10", baseq=10, paired_end="1"):
    vcf, bam, data = datagen.write_fixture_dir(str(tmp_path), **gen_kw)
    ref_prefix = str(tmp_path / "ref")
    p = refrunner.run_reference_phaser(vcf, bam, data.sample, ref_prefix,
                                       mapq=mapq, baseq=baseq,
                                       paired_end=paired_end, extra=ref_extra)
    assert p.returncode == 0, p.stdout[-4000:] + p.stderr[-4000:]
    our_prefix = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=our_prefix,
               mapq=mapq, baseq=baseq, paired_end=paired_end,
               opts=opts or PhaserOptions(), log=lambda *a: None,
               **(run_kw or {}))
    return ref_prefix, our_prefix


def _assert_all(ref, ours, vcf_too=True):
    cmp.assert_exact(ref + ".allelic_counts.txt", ours + ".allelic_counts.txt")
    cmp.assert_same_connections(ref + ".variant_connections.txt",
                                ours + ".variant_connections.txt")
    cmp.assert_exact(ref + ".allele_config.txt", ours + ".allele_config.txt")
    cmp.assert_same_haplotypes(ref + ".haplotypes.txt", ours + ".haplotypes.txt")
    cmp.assert_same_hap_counts(ref + ".haplotypic_counts.txt",
                               ours + ".haplotypic_counts.txt")
    if vcf_too:
        cmp.assert_same_vcf(ref + ".vcf.gz", ours + ".vcf.gz")


def test_engine_parity_basic(tmp_path):
    ref, ours = _run_both(tmp_path, dict(
        seed=0, contigs=("chr20", "chr21"), n_variants_per_contig=80,
        n_reads_per_contig=600))
    _assert_all(ref, ours)


def test_engine_parity_dense(tmp_path):
    # denser coverage => real multi-variant blocks, conflicts, pruning
    ref, ours = _run_both(tmp_path, dict(
        seed=1, contigs=("chr20",), contig_len=20000,
        n_variants_per_contig=120, n_reads_per_contig=2500,
        error_rate=0.01))
    _assert_all(ref, ours)


def test_engine_parity_gw_method1(tmp_path):
    ref, ours = _run_both(
        tmp_path,
        dict(seed=2, contigs=("chr20",), contig_len=20000,
             n_variants_per_contig=100, n_reads_per_contig=1500),
        ref_extra={"gw_phase_method": 1},
        opts=PhaserOptions(gw_phase_method=1))
    _assert_all(ref, ours)


def test_engine_parity_small_block_cap(tmp_path):
    """--max_block_size 3 forces weak-point splitting + the left-to-right
    stitcher on nearly every block (stress for find_weak_points /
    split_by_weak / sub_block_phase stitching)."""
    ref, ours = _run_both(
        tmp_path,
        dict(seed=7, contigs=("chr20",), contig_len=20000,
             n_variants_per_contig=120, n_reads_per_contig=2200,
             error_rate=0.01),
        ref_extra={"max_block_size": "3"},
        opts=PhaserOptions(max_block_size=3))
    _assert_all(ref, ours)
