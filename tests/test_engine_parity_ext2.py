"""More oracle-parity coverage: --output_read_ids, --chr_prefix."""

import numpy as np
import pytest

import compare_outputs as cmp
import datagen
import refrunner
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser
from phaser_tpu.io import bgzf, tabix


def test_parity_output_read_ids(tmp_path):
    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=41, contigs=("chr20",), contig_len=20000,
        n_variants_per_contig=90, n_reads_per_contig=1500)
    ref = str(tmp_path / "ref")
    p = refrunner.run_reference_phaser(vcf, bam, data.sample, ref,
                                       extra={"output_read_ids": 1})
    assert p.returncode == 0, p.stdout[-3000:]
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1",
               opts=PhaserOptions(output_read_ids=1), log=lambda *a: None)

    def canon(path):
        """read_ids_a/b (cols 14,15) are Python-set-ordered name lists in
        the reference -> compare as sorted sets; aReads/bReads (cols 18,19)
        via index relabeling."""
        lines = open(path).read().splitlines()
        out = [lines[0]]
        body = []
        for l in lines[1:]:
            c = l.split("\t")
            if len(c) >= 20:
                c[14] = ",".join(sorted(c[14].split(",")))
                c[15] = ",".join(sorted(c[15].split(",")))
                c[18], c[19] = cmp.canon_read_indices(c[18], c[19])
                if c[5]:
                    c[5] = ",".join(sorted(c[5].split(",")))
            body.append("\t".join(c))
        return out, sorted(body)

    rh, rb = canon(ref + ".haplotypic_counts.txt")
    oh, ob = canon(ours + ".haplotypic_counts.txt")
    assert rh == oh
    assert rb == ob
    assert len(rb) > 3


def test_parity_chr_prefix(tmp_path):
    data = datagen.generate(seed=43, contigs=("chr20",), contig_len=20000,
                            n_variants_per_contig=80, n_reads_per_contig=1200)
    bam = str(tmp_path / "s.bam")
    data.write_bam(bam)
    # VCF with UNprefixed contig names ("20"), BAM stays "chr20"
    vcf = str(tmp_path / "s.vcf.gz")
    data.write_vcf(vcf)
    text = bgzf.decompress_all(open(vcf, "rb").read()).decode()
    out_lines = []
    for line in text.splitlines():
        if line.startswith("##contig"):
            out_lines.append(line.replace("ID=chr", "ID="))
        elif line.startswith("#"):
            out_lines.append(line)
        else:
            assert line.startswith("chr")
            out_lines.append(line[3:])
    bgzf.compress_to_path(("\n".join(out_lines) + "\n").encode(), vcf)
    tabix.build_vcf_index(vcf)

    ref = str(tmp_path / "ref")
    p = refrunner.run_reference_phaser(vcf, bam, data.sample, ref,
                                       extra={"chr_prefix": "chr"})
    assert p.returncode == 0, p.stdout[-3000:]
    ours = str(tmp_path / "ours")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1",
               opts=PhaserOptions(chr_prefix="chr"), log=lambda *a: None)
    cmp.assert_exact(ref + ".allelic_counts.txt", ours + ".allelic_counts.txt")
    cmp.assert_same_haplotypes(ref + ".haplotypes.txt", ours + ".haplotypes.txt")
    cmp.assert_same_hap_counts(ref + ".haplotypic_counts.txt",
                               ours + ".haplotypic_counts.txt")
    cmp.assert_same_vcf(ref + ".vcf.gz", ours + ".vcf.gz")


def test_parity_multifield_format(tmp_path):
    """GT:DP:GQ FORMAT with truncated sample columns — exercises GT-index
    lookup and the VCF writer's missing-field padding (:1748-1753)."""
    data = datagen.generate(seed=45, contigs=("chr20",), contig_len=20000,
                            n_variants_per_contig=90, n_reads_per_contig=1400)
    vcf = str(tmp_path / "s.vcf.gz")
    bam = str(tmp_path / "s.bam")
    data.write_vcf(vcf, extra_samples=2, extra_format=True)
    data.write_bam(bam)
    ref = str(tmp_path / "ref")
    p = refrunner.run_reference_phaser(vcf, bam, data.sample, ref)
    assert p.returncode == 0, p.stdout[-3000:]
    ours = str(tmp_path / "ours")
    from phaser_tpu.engine.pipeline import run_phaser
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=ours, mapq="10",
               baseq=10, paired_end="1", opts=PhaserOptions(),
               log=lambda *a: None)
    cmp.assert_exact(ref + ".allelic_counts.txt", ours + ".allelic_counts.txt")
    cmp.assert_same_haplotypes(ref + ".haplotypes.txt", ours + ".haplotypes.txt")
    cmp.assert_same_hap_counts(ref + ".haplotypic_counts.txt",
                               ours + ".haplotypic_counts.txt")
    cmp.assert_same_vcf(ref + ".vcf.gz", ours + ".vcf.gz")
