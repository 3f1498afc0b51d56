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


def test_cli_threads_multiprocess_byte_identical(tmp_path):
    """--threads N on the user-facing CLI runs N position-sharded engine
    PROCESSES (true parallelism vs the reference's per-contig fork pool,
    phaser.py:62) with outputs byte-identical to --threads 1, and the
    printed summary carries MERGED totals."""
    import os
    import subprocess
    import sys

    import datagen
    from phaser_tpu.io import bgzf

    vcf, bam, _ = datagen.write_fixture_dir(
        str(tmp_path), seed=51, contigs=("chr21", "chr22"),
        n_variants_per_contig=60, n_reads_per_contig=500)
    outs = {}
    for t in ("1", "2"):
        r = subprocess.run(
            [sys.executable, "-m", "phaser_tpu.cli.phaser_main",
             "--vcf", vcf, "--bam", bam, "--sample", "SAMPLE1",
             "--mapq", "10", "--baseq", "10", "--paired_end", "1",
             "--o", str(tmp_path / ("t" + t)), "--threads", t,
             "--device", "host"],
            capture_output=True, text=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, r.stdout[-2000:]
        outs[t] = r.stdout
    # identical merged summary numbers
    used = {t: [l for l in outs[t].splitlines()
                if "COMPLETED using" in l][0].split("reads")[0]
            for t in outs}
    assert used["1"].split()[-1] == used["2"].split()[-1]
    for sfx in ("haplotypes.txt", "haplotypic_counts.txt",
                "allelic_counts.txt", "variant_connections.txt",
                "allele_config.txt"):
        a = open(str(tmp_path / ("t1." + sfx))).read()
        b = open(str(tmp_path / ("t2." + sfx))).read()
        assert a == b, sfx
    assert bgzf.read_text_auto(str(tmp_path / "t1.vcf.gz")) == \
        bgzf.read_text_auto(str(tmp_path / "t2.vcf.gz"))


def test_cli_threads_device_auto_uses_shards(tmp_path):
    """The CLI DEFAULT (--device auto) must also get sharded parallelism
    from --threads N (round-4 verdict: it silently degraded to in-process
    stage threading unless --device host was passed): thread shards share
    the one local device, outputs byte-identical to --threads 1."""
    import os
    import subprocess
    import sys

    import datagen
    from phaser_tpu.io import bgzf

    vcf, bam, _ = datagen.write_fixture_dir(
        str(tmp_path), seed=52, contigs=("chr21", "chr22"),
        n_variants_per_contig=60, n_reads_per_contig=500)
    outs = {}
    for t in ("1", "2"):
        r = subprocess.run(
            [sys.executable, "-m", "phaser_tpu.cli.phaser_main",
             "--vcf", vcf, "--bam", bam, "--sample", "SAMPLE1",
             "--mapq", "10", "--baseq", "10", "--paired_end", "1",
             "--o", str(tmp_path / ("a" + t)), "--threads", t],
            capture_output=True, text=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, r.stdout[-2000:]
        outs[t] = r.stdout
    # the sharded driver (not stage threading) actually engaged
    assert "sharded engine: 2 position shards" in outs["2"], outs["2"][-1500:]
    for sfx in ("haplotypes.txt", "haplotypic_counts.txt",
                "allelic_counts.txt", "variant_connections.txt",
                "allele_config.txt"):
        a = open(str(tmp_path / ("a1." + sfx))).read()
        b = open(str(tmp_path / ("a2." + sfx))).read()
        assert a == b, sfx
    assert bgzf.read_text_auto(str(tmp_path / "a1.vcf.gz")) == \
        bgzf.read_text_auto(str(tmp_path / "a2.vcf.gz"))
