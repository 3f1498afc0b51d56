"""Large-fixture oracle parity (opt-in: PHASER_TPU_BIG_PARITY=1).

The default suite verifies byte parity on small fixtures across a wide
flag matrix; this runs ONE big skewed workload (500k reads, 3 contigs,
index present so decode skipping and the delta device format are in play)
against the live reference — the scale check for the round-4 decode and
dispatch changes. Takes ~2-4 minutes (the reference dominates)."""

import os

import pytest

import compare_outputs as co
import datagen
import refrunner
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser
from phaser_tpu.io.tabix import build_bai_index

pytestmark = pytest.mark.skipif(
    os.environ.get("PHASER_TPU_BIG_PARITY") != "1",
    reason="big-fixture oracle parity (set PHASER_TPU_BIG_PARITY=1; "
           "several minutes — the reference run dominates)")


def test_big_skewed_parity(tmp_path):
    pairs = (150000, 62500, 37500)
    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=123, contigs=("chr1", "chr2", "chr3"),
        contig_len=[max(250_000, p * 12) for p in pairs],
        n_variants_per_contig=[max(100, p // 40) for p in pairs],
        n_reads_per_contig=list(pairs), error_rate=0.01,
        frac_indel_reads=0.2)
    build_bai_index(bam)   # decode skip + region machinery active

    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1", device="host",
               opts=PhaserOptions(), log=lambda *a: None)

    ref = str(tmp_path / "ref")
    proc = refrunner.run_reference_phaser(vcf, bam, data.sample, ref,
                                          timeout=3600)
    assert proc.returncode == 0, proc.stderr[-1500:]

    co.assert_exact(ref + ".allelic_counts.txt", ours + ".allelic_counts.txt")
    co.assert_same_connections(ref + ".variant_connections.txt",
                               ours + ".variant_connections.txt")
    co.assert_same_haplotypes(ref + ".haplotypes.txt",
                              ours + ".haplotypes.txt")
    co.assert_same_hap_counts(ref + ".haplotypic_counts.txt",
                              ours + ".haplotypic_counts.txt")
    co.assert_same_vcf(ref + ".vcf.gz", ours + ".vcf.gz")
