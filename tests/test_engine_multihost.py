"""Sharded full-engine runs must be BIT-IDENTICAL to the single-process
run: global noise / AS quantile / row-sequence / block-index reductions via
dist_reduce, keyed merges for the globally-sorted output sections, and
streamed VCF body concatenation. (Reference semantics: the fork pool merges
ALL worker state in the parent before edge testing, phaser.py:558-586,
610-632.)"""

import os
import socket
import subprocess
import sys

import datagen
from phaser_tpu.dist.engine_multihost import run_phaser_sharded_threads
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser
from phaser_tpu.io import bgzf

TEXT = ["haplotypes.txt", "haplotypic_counts.txt", "allelic_counts.txt",
        "variant_connections.txt", "allele_config.txt"]


def _snapshot(prefix):
    out = {}
    for sfx in TEXT:
        with open(prefix + "." + sfx) as f:
            out[sfx] = f.read()
    out["vcf"] = bgzf.read_text_auto(prefix + ".vcf.gz").decode()
    return out


def _fixture(tmp_path, **kw):
    kw.setdefault("contigs", ("chr19", "chr20", "chr21", "chr22"))
    kw.setdefault("n_variants_per_contig", 60)
    kw.setdefault("n_reads_per_contig", 500)
    return datagen.write_fixture_dir(str(tmp_path), seed=11, **kw)


def _single(vcf, bam, prefix):
    run_phaser(vcf=vcf, bam=bam, sample="SAMPLE1", o=prefix, mapq="10",
               baseq=10, paired_end="1", opts=PhaserOptions(),
               log=lambda *a: None)
    return _snapshot(prefix)


def test_thread_sharded_bit_identical(tmp_path):
    vcf, bam, _ = _fixture(tmp_path)
    want = _single(vcf, bam, str(tmp_path / "single"))
    res = run_phaser_sharded_threads(
        n_shards=2, vcf=vcf, bam=bam, sample="SAMPLE1",
        o=str(tmp_path / "sh2"), mapq="10", baseq=10, paired_end="1",
        opts=PhaserOptions(), log=lambda *a: None)
    got = _snapshot(str(tmp_path / "sh2"))
    for k in want:
        assert got[k] == want[k], "file %s differs between 2-shard and " \
            "single-process runs" % k
    assert res.total_reads > 0
    # shard intermediates cleaned up
    assert not os.path.isfile(str(tmp_path / "sh2") + ".shard0.haplotypes.txt")


def test_thread_sharded_unbalanced_and_multibam(tmp_path):
    """3 shards over 4 contigs + the same BAM given twice: exercises the
    bam-major global row-sequence interleave (first_seen keys from bam 1
    sort after every bam-0 key) and the last-bam-wins read_vars quirk."""
    vcf, bam, _ = _fixture(tmp_path)
    bam2 = bam + "," + bam
    want = _single(vcf, bam2, str(tmp_path / "single"))
    run_phaser_sharded_threads(
        n_shards=3, vcf=vcf, bam=bam2, sample="SAMPLE1",
        o=str(tmp_path / "sh3"), mapq="10", baseq=10, paired_end="1",
        opts=PhaserOptions(), log=lambda *a: None)
    got = _snapshot(str(tmp_path / "sh3"))
    for k in want:
        assert got[k] == want[k], "file %s differs (multibam, 3 shards)" % k


def test_thread_sharded_more_shards_than_contigs(tmp_path):
    vcf, bam, _ = _fixture(tmp_path, contigs=("chr21", "chr22"))
    want = _single(vcf, bam, str(tmp_path / "single"))
    run_phaser_sharded_threads(
        n_shards=5, vcf=vcf, bam=bam, sample="SAMPLE1",
        o=str(tmp_path / "sh5"), mapq="10", baseq=10, paired_end="1",
        opts=PhaserOptions(), log=lambda *a: None)
    got = _snapshot(str(tmp_path / "sh5"))
    for k in want:
        assert got[k] == want[k]


def test_multiprocess_engine_bit_identical(tmp_path):
    """TRUE 2-process run (jax.distributed + Gloo collectives): the full
    engine per contig shard, globally-reduced noise/AS/rows/blocks, merged
    outputs byte-identical to the single-process run."""
    vcf, bam, _ = _fixture(tmp_path)
    want = _single(vcf, bam, str(tmp_path / "single"))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prefix = str(tmp_path / "mp")
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-m", "phaser_tpu.dist.engine_multihost",
               "--bam", bam, "--vcf", vcf, "--sample", "SAMPLE1",
               "--o", prefix, "--num-processes", "2",
               "--process-id", str(pid),
               "--coordinator", "localhost:%d" % port]
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        procs.append(subprocess.Popen(cmd, cwd=repo, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-3000:]
    got = _snapshot(prefix)
    for k in want:
        assert got[k] == want[k], "file %s differs (2-process vs single)" % k
