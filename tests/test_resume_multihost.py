"""Multihost shard-failure recovery: a completed shard's work is reusable.

Round-4 verdict #4: fail-fast matched the reference's model
(/root/reference/phaser/phaser.py:2032-2034), but a multi-host framework
should not recompute finished shards after a peer dies.  Each shard now
journals its collective payloads + results to `<o>.shardK.ckpt` the moment
its engine run completes (outputs are already on disk); on relaunch with
resume=True a completed shard REPLAYS the journal — re-emitting byte-
identical collective contributions so live (re-running) peers see exactly
the same values — and skips all compute.

The kill is simulated deterministically: PHASER_TPU_TEST_EXIT_BEFORE_BARRIER
makes a worker exit(17) after journaling, INSTEAD of entering the final
barrier — the run dies with every shard's work on disk but unmerged,
exactly the state a crashed rank-0 (or killed job) leaves behind."""

import os
import socket
import subprocess
import sys

import datagen
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser
from phaser_tpu.io import bgzf

FILES = ["haplotypes.txt", "haplotypic_counts.txt", "allelic_counts.txt",
         "variant_connections.txt", "allele_config.txt"]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fixture(tmp_path):
    return datagen.write_fixture_dir(
        str(tmp_path), seed=31, contigs=("chr21", "chr22"),
        n_variants_per_contig=70, n_reads_per_contig=700)


def _snapshot(prefix):
    out = {}
    for sfx in FILES:
        with open(prefix + "." + sfx) as f:
            out[sfx] = f.read()
    out["vcf"] = bgzf.read_text_auto(prefix + ".vcf.gz")
    return out


def _launch(vcf, bam, prefix, resume, die_rank=None, timeout=900):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-m", "phaser_tpu.dist.engine_multihost",
               "--bam", bam, "--vcf", vcf, "--sample", "SAMPLE1",
               "--o", prefix, "--num-processes", "2",
               "--process-id", str(pid), "--position-shards",
               "--coordinator", "localhost:%d" % port]
        if resume:
            cmd.append("--resume")
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        if die_rank is not None and pid in die_rank:
            env["PHASER_TPU_TEST_EXIT_BEFORE_BARRIER"] = "1"
        procs.append(subprocess.Popen(cmd, cwd=_REPO, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs, rcs = [], []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
        rcs.append(p.returncode)
    return rcs, outs


def test_multihost_resume_after_kill(tmp_path):
    vcf, bam, _ = _fixture(tmp_path)
    single = str(tmp_path / "single")
    run_phaser(vcf=vcf, bam=bam, sample="SAMPLE1", o=single, mapq="10",
               baseq=10, paired_end="1", opts=PhaserOptions(),
               log=lambda *a: None)
    want = _snapshot(single)

    prefix = str(tmp_path / "mp")
    # run 1: both workers die after journaling, before the merge barrier —
    # the job is dead but every shard's outputs + .ckpt are on disk
    rcs, outs = _launch(vcf, bam, prefix, resume=False, die_rank={0, 1})
    assert rcs == [17, 17], (rcs, outs[0][-800:])
    assert os.path.isfile(prefix + ".shard0.ckpt")
    assert os.path.isfile(prefix + ".shard1.ckpt")
    assert not os.path.isfile(prefix + ".haplotypes.txt")

    # run 2: kill-one-shard resume — shard 0 lost its work (journal +
    # outputs gone: the crashed rank), shard 1 replays its journal; the
    # live re-run and the replay must interoperate through the collectives
    os.remove(prefix + ".shard0.ckpt")
    for sfx in FILES + ["singletons.haplotypes.part",
                        "singletons.haplotypic_counts.part",
                        "allelic_counts.part", "vcf.gz", "vcfbody.gz",
                        "vcfhdr.gz"]:
        p = prefix + ".shard0." + sfx
        if os.path.isfile(p):
            os.remove(p)
    rcs, outs = _launch(vcf, bam, prefix, resume=True)
    assert rcs == [0, 0], (rcs, outs[0][-1500:], outs[1][-1500:])
    assert any("replaying" in o for o in outs), outs[1][-800:]
    got = _snapshot(prefix)
    for k in want:
        assert got[k] == want[k], "file %s differs after resume" % k
    # journals are consumed by the successful merge
    assert not os.path.isfile(prefix + ".shard1.ckpt")


def test_multihost_resume_both_replay(tmp_path):
    """Pure replay: both shards resume from journals (e.g. only the
    merge/rank-0 step was lost) — byte-identical merged outputs."""
    vcf, bam, _ = _fixture(tmp_path)
    single = str(tmp_path / "single")
    run_phaser(vcf=vcf, bam=bam, sample="SAMPLE1", o=single, mapq="10",
               baseq=10, paired_end="1", opts=PhaserOptions(),
               log=lambda *a: None)
    want = _snapshot(single)
    prefix = str(tmp_path / "mp2")
    rcs, _ = _launch(vcf, bam, prefix, resume=False, die_rank={0, 1})
    assert rcs == [17, 17]
    rcs, outs = _launch(vcf, bam, prefix, resume=True)
    assert rcs == [0, 0], (rcs, outs[0][-1500:])
    assert all("replaying" in o for o in outs)
    got = _snapshot(prefix)
    for k in want:
        assert got[k] == want[k], "file %s differs (both-replay)" % k
