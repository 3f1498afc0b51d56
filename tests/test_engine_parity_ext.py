"""Extended engine parity: flag matrix vs the live reference oracle."""

import os

import numpy as np
import pytest

import compare_outputs as cmp
import datagen
import refrunner
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser


def _fixture(tmp_path, **kw):
    return datagen.write_fixture_dir(str(tmp_path), **kw)


def _run_ref(vcf, bam, sample, prefix, **kw):
    p = refrunner.run_reference_phaser(vcf, bam, sample, prefix, **kw)
    assert p.returncode == 0, p.stdout[-4000:] + p.stderr[-3000:]
    return p


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


GEN = dict(seed=31, contigs=("chr20",), contig_len=22000,
           n_variants_per_contig=110, n_reads_per_contig=2200,
           error_rate=0.008)


def test_parity_multi_bam(tmp_path):
    vcf, bam1, data = _fixture(tmp_path, **GEN)
    data2 = datagen.generate(read_seed=999, **GEN)
    bam2 = str(tmp_path / "second.bam")
    data2.write_bam(bam2)
    bams = bam1 + "," + bam2
    ref = str(tmp_path / "ref")
    _run_ref(vcf, bams, data.sample, ref, mapq="10,30", paired_end="1,1")
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bams, sample=data.sample, o=ours, mapq="10,30",
               baseq=10, paired_end="1,1", opts=PhaserOptions(),
               log=lambda *a: None)
    _assert_all(ref, ours)


def test_parity_blacklists(tmp_path):
    vcf, bam, data = _fixture(tmp_path, **GEN)
    bl = str(tmp_path / "bl.bed")
    hbl = str(tmp_path / "hbl.bed")
    with open(bl, "w") as f:
        f.write("chr20\t3000\t6000\nchr20\t15000\t16000\n")
    with open(hbl, "w") as f:
        f.write("chr20\t8000\t12000\n")
    ref = str(tmp_path / "ref")
    _run_ref(vcf, bam, data.sample, ref,
             extra={"blacklist": bl, "haplo_count_blacklist": hbl})
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1", blacklist=bl,
               haplo_count_blacklist=hbl, opts=PhaserOptions(),
               log=lambda *a: None)
    _assert_all(ref, ours)


def test_parity_unphased_vars_off(tmp_path):
    vcf, bam, data = _fixture(tmp_path, **GEN)
    ref = str(tmp_path / "ref")
    _run_ref(vcf, bam, data.sample, ref, extra={"unphased_vars": 0})
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1", opts=PhaserOptions(unphased_vars=0),
               log=lambda *a: None)
    _assert_all(ref, ours)


@pytest.mark.parametrize("mode", [1, 2])
def test_parity_gw_phase_vcf(tmp_path, mode):
    vcf, bam, data = _fixture(tmp_path, **GEN)
    ref = str(tmp_path / "ref")
    _run_ref(vcf, bam, data.sample, ref,
             extra={"gw_phase_vcf": mode,
                    "gw_phase_vcf_min_confidence": 0.75})
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1",
               opts=PhaserOptions(gw_phase_vcf=mode,
                                  gw_phase_vcf_min_confidence=0.75),
               log=lambda *a: None)
    _assert_all(ref, ours)


def test_parity_include_indels(tmp_path):
    kw = dict(GEN)
    kw.update(seed=33, include_indel_variants=True, frac_indel_reads=0.2)
    vcf, bam, data = _fixture(tmp_path, **kw)
    ref = str(tmp_path / "ref")
    _run_ref(vcf, bam, data.sample, ref, extra={"include_indels": 1})
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1", opts=PhaserOptions(include_indels=1),
               log=lambda *a: None)
    _assert_all(ref, ours)


def test_parity_chr_restrict(tmp_path):
    kw = dict(GEN)
    kw.update(contigs=("chr20", "chr21"))
    vcf, bam, data = _fixture(tmp_path, **kw)
    ref = str(tmp_path / "ref")
    _run_ref(vcf, bam, data.sample, ref, extra={"chr": "chr21"})
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1", chrom="chr21", opts=PhaserOptions(),
               log=lambda *a: None)
    _assert_all(ref, ours)


def test_parity_unique_ids_and_isize(tmp_path):
    vcf, bam, data = _fixture(tmp_path, **GEN)
    ref = str(tmp_path / "ref")
    _run_ref(vcf, bam, data.sample, ref,
             extra={"unique_ids": 1, "isize": "420", "as_q_cutoff": 0})
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1", isize="420",
               opts=PhaserOptions(unique_ids=1, as_q_cutoff=0),
               log=lambda *a: None)
    _assert_all(ref, ours)


def test_parity_cc_threshold_and_unpaired(tmp_path):
    kw = dict(GEN)
    kw.update(seed=35, paired=False)
    vcf, bam, data = _fixture(tmp_path, **kw)
    ref = str(tmp_path / "ref")
    _run_ref(vcf, bam, data.sample, ref, paired_end="0",
             extra={"cc_threshold": 0.2})
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="0",
               opts=PhaserOptions(cc_threshold=0.2), log=lambda *a: None)
    _assert_all(ref, ours)


def test_parity_output_network(tmp_path):
    vcf, bam, data = _fixture(tmp_path, **GEN)
    ref = str(tmp_path / "ref")
    # pick a variant likely to be in a block: run ours first to find one
    ours_probe = str(tmp_path / "probe")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours_probe, mapq="10",
               baseq=10, paired_end="1", opts=PhaserOptions(write_vcf=0),
               log=lambda *a: None)
    # take the first variant_a in allele_config as the network target
    cfg = open(ours_probe + ".allele_config.txt").read().splitlines()
    if len(cfg) < 2:
        pytest.skip("no phased pairs in fixture")
    target = cfg[1].split("\t")[0]
    _run_ref(vcf, bam, data.sample, ref, extra={"output_network": target})
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1",
               opts=PhaserOptions(output_network=target), log=lambda *a: None)
    _assert_all(ref, ours)
    cmp.assert_exact(ref + ".network.links.txt", ours + ".network.links.txt")
    r = sorted(open(ref + ".network.nodes.txt").read().splitlines()[1:])
    o = sorted(open(ours + ".network.nodes.txt").read().splitlines()[1:])
    assert r == o
