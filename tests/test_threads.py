"""--threads host-path parallelism: identical outputs at any thread count
(reference semantics: fork-pool per contig, phaser.py:2077-2094)."""

import filecmp

import datagen
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser

FILES = [".allelic_counts.txt", ".variant_connections.txt",
         ".allele_config.txt", ".haplotypes.txt", ".haplotypic_counts.txt",
         ".vcf.gz"]


def test_threads_outputs_identical(tmp_path):
    vcf, bam, data = datagen.write_fixture_dir(str(tmp_path), seed=4,
                                               contigs=("chr20", "chr21"),
                                               n_variants_per_contig=100,
                                               n_reads_per_contig=900)
    outs = {}
    for t in (1, 4):
        prefix = str(tmp_path / ("t%d" % t))
        run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=prefix,
                   mapq="10", baseq=10, paired_end="1",
                   opts=PhaserOptions(), threads=t, log=lambda *a: None)
        outs[t] = prefix
    for sfx in FILES:
        assert filecmp.cmp(outs[1] + sfx, outs[4] + sfx, shallow=False), sfx
