"""CSI index support for BAM: contigs beyond the 512 Mbp BAI limit.

The reference gets CSI transparently through samtools
(/root/reference/phaser/phaser.py:1346); phaser_tpu carries its own
builder + reader (io/tabix.build_csi_bam_index, io/bam_index.BaiIndex):
the reader generalizes the R-tree query to (min_shift, depth) and
synthesizes a BAI-style 2^min_shift linear index from leaf-bin loffsets
(parent-bin smears keep the start_voff contract for reads resident in
non-leaf bins)."""

import os

import numpy as np
import pytest

import datagen
from phaser_tpu.io import bam as bamio
from phaser_tpu.io.bam_index import (BaiIndex, ensure_bam_index,
                                     read_bam_starts,
                                     read_bam_voffset_ranges)
from phaser_tpu.io.tabix import (build_bai_index, build_csi_bam_index,
                                 _reg2bins_g, reg2bins)


def test_reg2bins_generalized_matches_classic():
    rng = np.random.default_rng(0)
    for _ in range(200):
        beg = int(rng.integers(0, 1 << 29))
        end = beg + int(rng.integers(1, 1 << 20))
        assert _reg2bins_g(beg, end, 14, 5) == reg2bins(beg, end)


def _read_key(bd):
    names = [bd.names[i] for i in range(len(bd))]
    return sorted(zip(names, bd.pos.tolist(), bd.flag.tolist()))


def test_csi_region_decode_matches_bai(tmp_path):
    """Same BAM indexed both ways: region queries and start-range scans
    must return identical read sets."""
    _, bam, _ = datagen.write_fixture_dir(
        str(tmp_path), seed=7, contigs=("chr20", "chr21"),
        n_variants_per_contig=50, n_reads_per_contig=800,
        frac_spliced=0.3)
    build_bai_index(bam)
    build_csi_bam_index(bam)
    bai = BaiIndex.from_path(bam + ".bai")
    csi = BaiIndex.from_path(bam + ".csi")
    assert csi.min_shift == 14 and csi.depth == 5
    assert bai.n_ref() == csi.n_ref()
    rng = np.random.default_rng(1)
    for tid in range(bai.n_ref()):
        for _ in range(6):
            beg = int(rng.integers(0, 50000))
            end = beg + int(rng.integers(500, 20000))
            ra = read_bam_voffset_ranges(
                bam, bai.chunks_for_region(tid, beg, end))
            rc = read_bam_voffset_ranges(
                bam, csi.chunks_for_region(tid, beg, end))
            # CSI chunks may be a (safe) superset; the decoded records
            # restricted to the region must agree exactly
            def region_reads(bd):
                keep = (bd.refid == tid) & (bd.pos < end) & \
                    (bd.pos + 1000 > beg)
                return _read_key(bd.select(keep))
            assert region_reads(rc) == region_reads(ra)
        for _ in range(4):
            lo = int(rng.integers(0, 40000))
            hi = lo + int(rng.integers(1000, 30000))
            sa = read_bam_starts(bam, tid, lo, hi, bai)
            sc = read_bam_starts(bam, tid, lo, hi, csi)
            assert _read_key(sc) == _read_key(sa), (tid, lo, hi)


def _write_long_contig_bam(path, contig_len=700_000_000, n_reads=400,
                           seed=3):
    """Synthetic coordinate-sorted BAM on a >512 Mbp contig (positions
    beyond 1<<29 cannot be BAI-indexed)."""
    rng = np.random.default_rng(seed)
    pos = np.sort(rng.integers(1000, contig_len - 2000, size=n_reads))
    recs = []
    for i, p in enumerate(pos.tolist()):
        recs.append(bamio.BamRecord(
            name="r%06d" % i, refid=0, pos=p, mapq=60, flag=0,
            cigar=[(100, 0)], seq="A" * 100, qual=[30] * 100,
            next_refid=-1, next_pos=-1, tlen=0, tags=[("AS", "C", 99)]))
    bamio.write_bam(path, ["chrBig"], [contig_len], recs)
    return pos


def test_long_contig_routes_to_csi(tmp_path):
    bam = str(tmp_path / "big.bam")
    pos = _write_long_contig_bam(bam)
    idx = ensure_bam_index(bam)
    assert idx is not None and idx.endswith(".csi"), idx
    assert not os.path.isfile(bam + ".bai")
    csi = BaiIndex.from_path(idx)
    assert (1 << (csi.min_shift + 3 * csi.depth)) >= 700_000_000
    full = bamio.read_bam(bam)
    # start-range scans across the whole contig, including >1<<29
    for lo, hi in ((0, 100_000_000), (500_000_000, 600_000_000),
                   (int(1 << 29), 700_000_000), (650_000_000, 700_000_000)):
        got = read_bam_starts(bam, 0, lo, hi, csi)
        keep = (full.pos >= lo) & (full.pos < hi)
        assert _read_key(got) == _read_key(full.select(keep)), (lo, hi)
    # region chunk queries at high coordinates
    beg = int(pos[-10])
    got = read_bam_voffset_ranges(
        bam, csi.chunks_for_region(0, beg, beg + 1))
    assert len(got) >= 1 and int(got.pos.max()) >= beg - 1000


def test_long_contig_shard_plan(tmp_path):
    """plan_shards over a CSI-indexed long contig: shards cover every
    read exactly once."""
    from phaser_tpu.dist.shard_plan import plan_shards

    bam = str(tmp_path / "big.bam")
    _write_long_contig_bam(bam, n_reads=600, seed=8)
    plans = plan_shards(bam, ["chrBig"], 3)
    assert len(plans) == 3
    idx = ensure_bam_index(bam)
    csi = BaiIndex.from_path(idx)
    full = bamio.read_bam(bam)
    seen = []
    for p in plans:
        for (lo, hi) in p.decode.get("chrBig", ()):
            hi_eff = min(hi, 1 << 62)
            bd = read_bam_starts(bam, 0, lo, min(hi_eff, 2**31 - 1), csi)
            seen.extend(_read_key(bd))
    assert sorted(seen) == _read_key(full)
    # the plan actually split the contig (weights resolved, not all-on-0)
    n_active = sum(1 for p in plans if p.decode.get("chrBig"))
    assert n_active >= 2, [p.decode for p in plans]
