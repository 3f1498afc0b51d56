"""Index-driven decode skipping: with a .bai present and sparse het-site
coverage, the engine inflates only BGZF blocks whose reads can overlap a
variant window (the reference's `samtools view -L sites.bed` filter,
phaser.py:1346,1405 — which still decodes the whole stream). Outputs must
stay byte-identical: skipped reads provably overlap no site, so the hit
rows — including the AS-quantile population (phaser.py:540-553) — are
unchanged."""

import os

import datagen
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser
from phaser_tpu.io import bgzf
from phaser_tpu.io.tabix import build_bai_index

TEXT = ["haplotypes.txt", "haplotypic_counts.txt", "allelic_counts.txt",
        "variant_connections.txt", "allele_config.txt"]


def _snap(prefix):
    out = {s: open(prefix + "." + s).read() for s in TEXT}
    out["vcf"] = bgzf.read_text_auto(prefix + ".vcf.gz")
    return out


def test_index_decode_skip_byte_identical(tmp_path):
    # chr2: 2 Mbp with a single het site — most of its blocks are skippable
    vcf, bam, _ = datagen.write_fixture_dir(
        str(tmp_path), seed=31, contigs=("chr1", "chr2", "chr3"),
        contig_len=(100000, 2000000, 100000),
        n_variants_per_contig=(60, 1, 60),
        n_reads_per_contig=(1500, 12000, 1500))
    kw = dict(vcf=vcf, bam=bam, sample="SAMPLE1", mapq="10", baseq=10,
              paired_end="1", opts=PhaserOptions())
    full_logs = []
    run_phaser(o=str(tmp_path / "full"), log=full_logs.append, **kw)
    assert not any("index decode skip" in l for l in full_logs)

    build_bai_index(bam)
    skip_logs = []
    run_phaser(o=str(tmp_path / "skip"), log=skip_logs.append, **kw)
    skipline = [l for l in skip_logs if "index decode skip" in l]
    assert skipline, "skip did not engage with a sparse-sites index"
    pct = int(skipline[0].split(":")[1].strip().split("%")[0])
    assert pct < 60
    # decoded read count visibly reduced
    dec = [l for l in skip_logs if "bam decode" in l][0]
    n_dec = int(dec.split()[4])
    assert n_dec < 10000, dec

    want, got = _snap(str(tmp_path / "full")), _snap(str(tmp_path / "skip"))
    for k in want:
        assert got[k] == want[k], "file %s differs under decode skip" % k


def test_index_skip_dense_sites_stays_off(tmp_path):
    """Dense coverage: the exact byte gate must keep whole-file decode."""
    vcf, bam, _ = datagen.write_fixture_dir(
        str(tmp_path), seed=32, contigs=("chr21",),
        n_variants_per_contig=120, n_reads_per_contig=1500)
    build_bai_index(bam)
    logs = []
    run_phaser(vcf=vcf, bam=bam, sample="SAMPLE1", o=str(tmp_path / "o"),
               mapq="10", baseq=10, paired_end="1", opts=PhaserOptions(),
               log=logs.append)
    assert not any("index decode skip:" in l for l in logs)
