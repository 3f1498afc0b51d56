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


def test_thread_sharded_device_auto_bit_identical(tmp_path):
    """Sharded engine with DEVICE kernels (device='auto'): every shard
    thread drives the shared jax device through mapper.dispatch; outputs
    must still be byte-identical to the single-process HOST run, and each
    shard must report its own device-path seconds."""
    vcf, bam, _ = _fixture(tmp_path)
    want = _single(vcf, bam, str(tmp_path / "single"))
    res = run_phaser_sharded_threads(
        n_shards=2, vcf=vcf, bam=bam, sample="SAMPLE1",
        o=str(tmp_path / "shdev"), mapq="10", baseq=10, paired_end="1",
        opts=PhaserOptions(), device="auto", log=lambda *a: None)
    got = _snapshot(str(tmp_path / "shdev"))
    for k in want:
        assert got[k] == want[k], \
            "file %s differs (device=auto sharded vs host single)" % k
    assert len(res.shard_device) == 2
    for dev_s, wall_s in res.shard_device:
        assert dev_s > 0.0, "shard reported no device-path time under auto"
        assert wall_s >= dev_s


def test_multiprocess_engine_device_auto_bit_identical(tmp_path):
    """TRUE 2-process run (jax.distributed + Gloo collectives) on the
    DEVICE path (--device auto) with POSITION SHARDS: the full engine per
    weight-balanced position-range shard with per-process device kernels,
    globally-reduced noise/AS/rows/blocks plus the cross-process row
    exchange, merged outputs byte-identical to the single-process host
    run."""
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
               "--process-id", str(pid), "--device", "auto",
               "--position-shards",
               "--coordinator", "localhost:%d" % port]
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        procs.append(subprocess.Popen(cmd, cwd=repo, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        # 900 s: must cover a fully COLD persistent jit cache on a loaded
        # 2-core box (round-4 verdict: the first full-suite run compiled
        # everything from scratch here and blew a 300 s cap; warm runs
        # take ~10 s)
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    got = _snapshot(prefix)
    for k in want:
        assert got[k] == want[k], "file %s differs (2-process vs single)" % k
    # per-shard device fraction is reported by each process
    for out in outs:
        done = [l for l in out.splitlines()
                if l.startswith("MULTIHOST_ENGINE_DONE")]
        assert done and "device_s=" in done[0]
        dev_s = float(done[0].split("device_s=")[1].split()[0])
        assert dev_s > 0.0, done[0]


# ---------------------------------------------------------------------------
# distributed exact AS quantile (histogram + boundary-bucket refinement)

def _dist_percentile(shard_values, q, small=0):
    """Run ThreadReducer.as_percentile across real threads, assert every
    shard returns the same value, and return it."""
    import threading
    import numpy as np
    from phaser_tpu.dist.engine_multihost import ThreadReducer, _ThreadGroup

    n = len(shard_values)
    group = _ThreadGroup(n)
    out = [None] * n
    errs = []

    def worker(sid):
        red = ThreadReducer(group, sid, {})
        red._AS_SMALL = small
        try:
            out[sid] = red.as_percentile(np.asarray(shard_values[sid],
                                                    np.float64), q)
        except BaseException as e:  # noqa: BLE001
            errs.append(e)
            group.abort()

    ts = [threading.Thread(target=worker, args=(s,)) for s in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert all(v == out[0] for v in out), out
    return out[0]


def test_as_percentile_distributed_exact():
    """Histogram-refinement percentile must be BIT-identical to
    np.percentile on the concatenated vector — adversarial ties, skewed
    shards, empty shards, extreme ranges, interpolation boundaries."""
    import numpy as np

    rng = np.random.default_rng(7)
    cases = [
        # (shards, list of q values)
        ([rng.normal(40, 5, 5000), rng.normal(60, 1, 3000)],
         [0.0, 5.0, 37.3, 50.0, 95.0, 100.0]),
        # heavy ties: only a few distinct values, boundary buckets huge
        ([np.repeat([1.0, 2.0, 2.0, 3.0], 2000),
          np.repeat([2.0], 4000)], [5.0, 25.0, 50.0, 75.0]),
        # one empty shard + integer AS scores (the real workload)
        ([np.zeros(0), rng.integers(0, 120, 9000).astype(np.float64)],
         [5.0, 50.0]),
        # extreme dynamic range
        ([np.array([1e-30, 2e-30, 1e30]), rng.uniform(0, 1, 5000)],
         [5.0, 99.9]),
        # all-equal values (degenerate span)
        ([np.full(3000, 7.25), np.full(2000, 7.25)], [5.0, 50.0]),
        # three shards, pathological skew
        ([rng.uniform(0, 1, 8000), np.array([0.5]), np.zeros(0)],
         [4.99999, 95.00001]),
    ]
    for shards, qs in cases:
        allv = np.concatenate(shards)
        for q in qs:
            want = float(np.percentile(allv, q))
            got = _dist_percentile(shards, q, small=0)
            assert got == want, (q, got, want, len(allv))
    # small-count path (single full gather) also exact
    small_shards = [rng.normal(0, 1, 50), rng.normal(5, 1, 30)]
    want = float(np.percentile(np.concatenate(small_shards), 5.0))
    assert _dist_percentile(small_shards, 5.0, small=8192) == want
    # empty everywhere -> None
    assert _dist_percentile([np.zeros(0), np.zeros(0)], 5.0) is None


# ---------------------------------------------------------------------------
# position-range sharding (weight-balanced; n_shards > n_contigs)

def _skewed_fixture(tmp_path):
    """chr1 deliberately carries ~78%% of the reads — whole-contig shards
    would cap 2-shard efficiency well below target."""
    return datagen.write_fixture_dir(
        str(tmp_path), seed=21, contigs=("chr1", "chr2"),
        contig_len=(150000, 40000), n_variants_per_contig=(160, 40),
        n_reads_per_contig=(1800, 500))


def test_position_sharded_skewed_bit_identical(tmp_path):
    """4 position shards over 2 skewed contigs (n_shards > n_contigs,
    beating the reference's one-worker-per-contig cap, phaser.py:62):
    big contig split at window granularity, rows exchanged to owners,
    outputs byte-identical to the single-process run."""
    from phaser_tpu.dist.shard_plan import plan_shards
    from phaser_tpu.engine.slow_mode import list_contigs

    vcf, bam, _ = _skewed_fixture(tmp_path)
    want = _single(vcf, bam, str(tmp_path / "single"))
    plans = plan_shards(bam, list_contigs(vcf), 4)
    # the skewed contig must actually be split across shards
    chr1_shards = [i for i, p in enumerate(plans) if "chr1" in p.decode]
    assert len(chr1_shards) >= 3, plans
    assert sum(len(p.decode.get("chr1", [])) for p in plans) >= 3
    # ownership non-decreasing in contig order (merge-order invariant)
    owners = [i for c in list_contigs(vcf)
              for i, p in enumerate(plans) if c in p.own]
    assert owners == sorted(owners)

    res = run_phaser_sharded_threads(
        n_shards=4, position_shards=True, vcf=vcf, bam=bam,
        sample="SAMPLE1", o=str(tmp_path / "pos4"), mapq="10", baseq=10,
        paired_end="1", opts=PhaserOptions(), log=lambda *a: None)
    got = _snapshot(str(tmp_path / "pos4"))
    for k in want:
        assert got[k] == want[k], "file %s differs (position shards)" % k
    assert res.total_reads > 0


def test_position_sharded_multibam(tmp_path):
    """Position shards x 2 BAMs: the bam-major row-sequence interleave and
    the last-bam-wins read_vars quirk must survive the row exchange."""
    vcf, bam, _ = _skewed_fixture(tmp_path)
    bam2 = bam + "," + bam
    want = _single(vcf, bam2, str(tmp_path / "single"))
    run_phaser_sharded_threads(
        n_shards=3, position_shards=True, vcf=vcf, bam=bam2,
        sample="SAMPLE1", o=str(tmp_path / "pos3"), mapq="10", baseq=10,
        paired_end="1", opts=PhaserOptions(), log=lambda *a: None)
    got = _snapshot(str(tmp_path / "pos3"))
    for k in want:
        assert got[k] == want[k], \
            "file %s differs (position shards, multibam)" % k


def test_position_sharded_empty_shards(tmp_path):
    """n_shards far beyond the atom count: empty shards must still reach
    every collective in order (no deadlock) and outputs stay
    byte-identical."""
    vcf, bam, _ = datagen.write_fixture_dir(
        str(tmp_path), seed=61, contigs=("chrA", "chrB"),
        contig_len=(30000, 30000), n_variants_per_contig=(30, 30),
        n_reads_per_contig=(200, 200))
    want = _single(vcf, bam, str(tmp_path / "single"))
    run_phaser_sharded_threads(
        n_shards=16, position_shards=True, vcf=vcf, bam=bam,
        sample="SAMPLE1", o=str(tmp_path / "p16"), mapq="10", baseq=10,
        paired_end="1", opts=PhaserOptions(), log=lambda *a: None)
    got = _snapshot(str(tmp_path / "p16"))
    for k in want:
        assert got[k] == want[k], "file %s differs at 16 shards" % k


def test_thread_sharded_flag_matrix_bit_identical(tmp_path):
    """Non-default writer options under POSITION SHARDS: the balanced VCF
    body path (round-5) must reproduce the single-process bytes for the
    GT-rewrite modes (gw_phase_vcf 1 and 2 — mode 2 exercises the PS
    branch, which must never mutate the writer's cached FORMAT lists),
    output_read_ids (uid name columns through the row exchange), and
    unique_ids."""
    import pytest

    vcf, bam, _ = _fixture(tmp_path)
    for i, opts in enumerate((
            PhaserOptions(gw_phase_vcf=1),
            PhaserOptions(gw_phase_vcf=2,
                          gw_phase_vcf_min_confidence=0.99),
            PhaserOptions(output_read_ids=1),
            PhaserOptions(unique_ids=1))):
        single = str(tmp_path / ("fs%d" % i))
        run_phaser(vcf=vcf, bam=bam, sample="SAMPLE1", o=single, mapq="10",
                   baseq=10, paired_end="1", opts=opts, log=lambda *a: None)
        want = _snapshot(single)
        sharded = str(tmp_path / ("fm%d" % i))
        run_phaser_sharded_threads(
            n_shards=3, vcf=vcf, bam=bam, sample="SAMPLE1", o=sharded,
            mapq="10", baseq=10, paired_end="1", opts=opts,
            position_shards=True, log=lambda *a: None)
        got = _snapshot(sharded)
        for k in want:
            assert got[k] == want[k], \
                "file %s differs (opts case %d)" % (k, i)


def test_thread_sharded_balanced_blocks_bit_identical(tmp_path,
                                                      monkeypatch):
    """Opt-in block-formatting delegation (PHASER_TPU_BALANCE_BLOCKS=1):
    owners ship per-block slices, every shard formats a round-robin share
    into keyed parts, and the merge interleaves them back — byte-identical
    to the single-process run, including with read-id columns (uid names
    shipped per block)."""
    import phaser_tpu.dist.block_exchange as bx

    vcf, bam, _ = _fixture(tmp_path)
    monkeypatch.setenv("PHASER_TPU_BALANCE_BLOCKS", "1")
    bundled = []
    orig_bundle = bx.bundle_block
    monkeypatch.setattr(
        bx, "bundle_block",
        lambda *a, **k: (bundled.append(1) or orig_bundle(*a, **k)))
    for i, opts in enumerate((PhaserOptions(),
                              PhaserOptions(output_read_ids=1))):
        single = str(tmp_path / ("bs%d" % i))
        run_phaser(vcf=vcf, bam=bam, sample="SAMPLE1", o=single, mapq="10",
                   baseq=10, paired_end="1", opts=opts, log=lambda *a: None)
        want = _snapshot(single)
        sharded = str(tmp_path / ("bb%d" % i))
        run_phaser_sharded_threads(
            n_shards=3, vcf=vcf, bam=bam, sample="SAMPLE1", o=sharded,
            mapq="10", baseq=10, paired_end="1", opts=opts,
            position_shards=True, log=lambda *a: None)
        got = _snapshot(sharded)
        for k in want:
            assert got[k] == want[k], \
                "file %s differs (balanced blocks, opts %d)" % (k, i)
        # the delegated path actually ran (bundles were produced) and
        # its keyed parts were merged + cleaned
        assert bundled, "delegation never engaged"
        assert not os.path.isfile(sharded +
                                  ".shard0.blocks.haplotypes.part")
