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


def test_long_contig_full_engine_sharded(tmp_path):
    """FULL engine end-to-end on a >512 Mbp contig: the BAM can only be
    CSI-indexed, so decode skipping, shard planning, and range decode all
    ride the CSI reader; a 3-shard position-sharded run must stay
    byte-identical to the single-process run."""
    import filecmp

    from phaser_tpu.dist.engine_multihost import run_phaser_sharded_threads
    from phaser_tpu.engine.output_stage import PhaserOptions
    from phaser_tpu.engine.pipeline import run_phaser
    from phaser_tpu.io import bgzf as bgzfio
    from phaser_tpu.io import tabix as tabixio

    contig_len = 700_000_000
    rng = np.random.default_rng(9)
    # het-site clusters across the contig, including beyond 1<<29
    loci = [5_000_000, 260_000_000, int(1 << 29) + 1_000_000, 690_000_000]
    sites = []   # 1-based positions
    for base in loci:
        p = base
        for _ in range(6):
            p += int(rng.integers(20, 60))
            sites.append(p)
    # VCF
    lines = ["##fileformat=VCFv4.2",
             '##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">',
             "##contig=<ID=chrBig,length=%d>" % contig_len,
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1"]
    for i, p in enumerate(sites):
        lines.append("chrBig\t%d\trs%d\tA\tG\t100\tPASS\t.\tGT\t0|1" % (p, i))
    vcf = str(tmp_path / "big.vcf.gz")
    bgzfio.compress_to_path(("\n".join(lines) + "\n").encode(), vcf)
    tabixio.build_vcf_index(vcf)
    # BAM: reads covering consecutive site pairs on alternating haplotypes
    recs = []
    ri = 0
    for i in range(len(sites) - 1):
        a, b = sites[i], sites[i + 1]
        if b - a > 120:
            continue
        for hap in (0, 1):
            for _ in range(3):
                start0 = a - 1 - int(rng.integers(5, 30))
                seq = ["A"] * 150
                for p in (a, b):
                    off = p - 1 - start0
                    if 0 <= off < 150:
                        seq[off] = "G" if hap else "A"
                recs.append(bamio.BamRecord(
                    name="r%05d" % ri, refid=0, pos=start0, mapq=60,
                    flag=0, cigar=[(150, 0)], seq="".join(seq),
                    qual=[35] * 150, tags=[("AS", "C", 99)]))
                ri += 1
    recs.sort(key=lambda r: r.pos)
    bam = str(tmp_path / "big.bam")
    bamio.write_bam(bam, ["chrBig"], [contig_len], recs)

    # index upfront: routes to CSI (>512 Mbp contig), and the engine's
    # decode-skip path then rides the CSI chunks for the sparse sites
    idx = ensure_bam_index(bam)
    assert idx.endswith(".csi") and not os.path.isfile(bam + ".bai")
    opts = PhaserOptions()
    single = str(tmp_path / "sg")
    run_phaser(vcf=vcf, bam=bam, sample="S1", o=single, mapq="10",
               baseq=10, paired_end="0", opts=opts, log=lambda *a: None)
    # real work happened: phased rows exist, incl. at >1<<29 coordinates
    hap = open(single + ".haplotypes.txt").read().splitlines()
    assert len(hap) > 4
    assert any(int(l.split("\t")[1]) > (1 << 29) for l in hap[1:])

    sharded = str(tmp_path / "sh")
    run_phaser_sharded_threads(
        n_shards=3, vcf=vcf, bam=bam, sample="S1", o=sharded, mapq="10",
        baseq=10, paired_end="0", opts=opts, position_shards=True,
        log=lambda *a: None)
    for sfx in (".haplotypes.txt", ".haplotypic_counts.txt",
                ".allelic_counts.txt", ".variant_connections.txt",
                ".allele_config.txt"):
        assert filecmp.cmp(single + sfx, sharded + sfx, shallow=False), sfx
    # VCF: compare decompressed bytes (BGZF block framing differs between
    # the one-shot writer and the sharded stream-concat merge)
    assert bgzfio.read_text_auto(single + ".vcf.gz") == \
        bgzfio.read_text_auto(sharded + ".vcf.gz")
