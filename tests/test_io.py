import gzip
import os

import numpy as np
import pytest

from phaser_tpu.io import bam as bamio
from phaser_tpu.io import bed, bgzf, tabix, vcf

import datagen


def test_bgzf_roundtrip(tmp_path):
    data = os.urandom(300000) + b"tail"
    p = str(tmp_path / "x.gz")
    bgzf.compress_to_path(data, p)
    raw = open(p, "rb").read()
    assert bgzf.decompress_all(raw) == data
    # stdlib gzip can read BGZF (multi-member gzip)
    assert gzip.decompress(raw) == data
    assert bgzf.is_bgzf(p)


def test_bgzf_virtual_offsets(tmp_path):
    p = str(tmp_path / "v.gz")
    with bgzf.BgzfWriter(p) as w:
        w.write(b"hello ")
        voff = w.virtual_offset
        w.write(b"world " * 20000)
    r = bgzf.BgzfReader(p)
    r.seek_virtual(voff)
    assert r.read(5) == b"world"
    assert r.read_all_from(0).startswith(b"hello world")


def test_bam_roundtrip(tmp_path):
    recs = [
        bamio.BamRecord("r1", 0, 100, 60, 0x63, [(10, bamio.OP_M)], "ACGTACGTAC",
                        [30] * 10, 0, 300, 276, tags=[("AS", "i", 99)]),
        bamio.BamRecord("r2", 0, 200, 10, 0x10, [(4, bamio.OP_S), (6, bamio.OP_M)],
                        "TTTTGGGGCC", [38] * 10, -1, -1, 0,
                        tags=[("NH", "i", 2), ("AS", "c", 12)]),
        bamio.BamRecord("r3", 1, 5, 255, 0, [(5, bamio.OP_M), (100, bamio.OP_N), (5, bamio.OP_M)],
                        "ACGTAACGTA", [8] * 10, -1, -1, 0, tags=[("ZZ", "Z", "hi")]),
    ]
    p = str(tmp_path / "t.bam")
    bamio.write_bam(p, ["c1", "c2"], [1000, 1000], recs)
    bd = bamio.read_bam(p)
    assert len(bd) == 3
    assert bd.ref_names == ["c1", "c2"]
    assert list(bd.pos) == [100, 200, 5]
    assert list(bd.mapq) == [60, 10, 255]
    assert list(bd.as_score) == [99, 12, 0]
    assert list(bd.has_as) == [True, True, False]
    assert bd.names == [b"r1", b"r2", b"r3"]
    assert bamio.cigar_to_string(bd.cigar_flat[bd.cigar_off[1]:bd.cigar_off[2]]) == "4S6M"
    seq1 = bd.seq_flat[bd.seq_off[0]:bd.seq_off[1]]
    assert "".join(bamio.SEQ_NIBBLE_CHARS[c] for c in seq1) == "ACGTACGTAC"
    sub = bd.select(np.array([0, 2]))
    assert list(sub.pos) == [100, 5]
    assert bamio.cigar_to_string(sub.cigar_flat[sub.cigar_off[1]:sub.cigar_off[2]]) == "5M100N5M"


def test_interval_set():
    iv = bed.IntervalSet({"c": (np.array([10, 100, 50]), np.array([20, 110, 60]))})
    s = np.array([0, 15, 20, 55, 105, 200])
    e = s + 1
    assert list(iv.overlaps("c", s, e)) == [False, True, False, True, True, False]
    assert list(iv.overlaps("other", s, e)) == [False] * 6
    # whole-range query
    assert iv.overlaps("c", np.array([0]), np.array([1000]))[0]


def test_vcf_fixture_and_tabix(tmp_path):
    data = datagen.generate(seed=1, contigs=("chr21",), n_variants_per_contig=50,
                            n_reads_per_contig=50)
    p = str(tmp_path / "s.vcf.gz")
    data.write_vcf(p, extra_samples=2)
    cmap = vcf.sample_column_map(p)
    assert cmap["SAMPLE1"] == 9
    assert cmap["OTHER1"] == 11
    lines = list(vcf.iter_vcf_lines(p))
    body = [l for l in lines if not l.startswith("#")]
    assert len(body) == 50
    # region fetch via our tabix index
    tf = tabix.TabixFile(p)
    v = data.variants[10]
    got = list(tf.fetch(v.chrom, v.pos - 1, v.pos))
    assert any(int(l.split("\t")[1]) == v.pos for l in got)
    # empty region
    assert list(tf.fetch("chrX", 0, 100)) == []


def test_het_filter_semantics(tmp_path):
    data = datagen.generate(seed=2, contigs=("chr21",), n_variants_per_contig=60,
                            n_reads_per_contig=10, frac_unphased_gt=0.2)
    p = str(tmp_path / "s.vcf.gz")
    data.write_vcf(p, extra_samples=1)
    cmap = vcf.sample_column_map(p)
    flt = vcf.het_filtered_lines(p, cmap["SAMPLE1"])
    body = [l for l in flt if not l.startswith("#")]
    # every surviving line lacks the grep substrings
    for l in body:
        assert "0|0" not in l and "1|1" not in l
        assert len(l.split("\t")) == 10
    hs = vcf.parse_het_sites(body, "", ["_", ":"], pass_only=True)
    assert "chr21" in hs.pool
    for rec in hs.pool["chr21"]:
        xg = rec[10]
        assert len(set(xg)) > 1
        assert "PASS" in rec[6].split(";")


def test_sam_text_matches_bam(tmp_path):
    data = datagen.generate(seed=3, contigs=("chr20",), n_variants_per_contig=30,
                            n_reads_per_contig=40)
    p = str(tmp_path / "t.bam")
    data.write_bam(p)
    bd = bamio.read_bam(p)
    assert len(bd) == len(data.sam_lines)
    # spot-check a rendered SAM line's core fields vs datagen's text
    for i in [0, 5, len(bd) - 1]:
        ours = bamio.record_to_sam_line(bd, i).split("\t")
        theirs = data.sam_lines[i].split("\t")
        assert ours[0] == theirs[0]
        assert ours[1] == theirs[1]
        assert ours[3] == theirs[3]
        assert ours[5] == theirs[5]
        assert ours[9] == theirs[9]
        assert ours[10] == theirs[10]


def test_csi_index_roundtrip(tmp_path):
    data = datagen.generate(seed=13, contigs=("chr21", "chr22"),
                            n_variants_per_contig=60, n_reads_per_contig=10)
    p = str(tmp_path / "c.vcf.gz")
    data.write_vcf(p)
    os.remove(p + ".tbi")
    tabix.build_csi_index(p)
    assert os.path.exists(p + ".csi")
    tf = tabix.TabixFile(p)  # auto-detects the CSI
    v = data.variants[70]
    got = list(tf.fetch(v.chrom, v.pos - 1, v.pos))
    assert any(int(l.split("\t")[1]) == v.pos for l in got)
    assert list(tf.fetch("chrX", 0, 100)) == []
    # whole-contig fetch covers every record of that contig
    n21 = sum(1 for v2 in data.variants if v2.chrom == "chr21")
    assert len(list(tf.fetch("chr21", 0, 10**9))) == n21


def test_csi_vcf_output(tmp_path):
    """Input VCF indexed with .csi -> engine writes a .csi-indexed output."""
    from phaser_tpu.engine.output_stage import PhaserOptions
    from phaser_tpu.engine.pipeline import run_phaser
    data = datagen.generate(seed=14, contigs=("chr21",), contig_len=15000,
                            n_variants_per_contig=50, n_reads_per_contig=500)
    vcf_p = str(tmp_path / "s.vcf.gz")
    bam_p = str(tmp_path / "s.bam")
    data.write_vcf(vcf_p)
    data.write_bam(bam_p)
    os.remove(vcf_p + ".tbi")
    tabix.build_csi_index(vcf_p)
    prefix = str(tmp_path / "out")
    run_phaser(vcf=vcf_p, bam=bam_p, sample=data.sample, o=prefix, mapq="10",
               baseq=10, paired_end="1", opts=PhaserOptions(),
               log=lambda *a: None)
    assert os.path.exists(prefix + ".vcf.gz.csi")
    tf = tabix.TabixFile(prefix + ".vcf.gz")
    assert len(list(tf.fetch("chr21", 0, 10**9))) > 10


def test_bam_streaming_matches_whole(tmp_path):
    data = datagen.generate(seed=15, contigs=("chr20", "chr21"),
                            n_variants_per_contig=30, n_reads_per_contig=400)
    p = str(tmp_path / "s.bam")
    data.write_bam(p)
    whole = bamio.read_bam(p)
    chunks = list(bamio.iter_bam_stream(p, window_bytes=16384))
    assert len(chunks) > 3  # actually windowed
    n = sum(len(c) for c in chunks)
    assert n == len(whole)
    cat_pos = np.concatenate([c.pos for c in chunks])
    np.testing.assert_array_equal(cat_pos, whole.pos)
    cat_seq = np.concatenate([c.seq_flat for c in chunks])
    np.testing.assert_array_equal(cat_seq, whole.seq_flat)
    names = [nm for c in chunks for nm in c.names]
    assert names == whole.names
    assert chunks[0].ref_names == whole.ref_names


def test_bai_writer(tmp_path):
    data = datagen.generate(seed=16, contigs=("chr20",),
                            n_variants_per_contig=20, n_reads_per_contig=100)
    p = str(tmp_path / "b.bam")
    data.write_bam(p)
    tabix.build_bai_index(p)
    raw = open(p + ".bai", "rb").read()
    assert raw[:4] == b"BAI\x01"
    import struct
    (n_ref,) = struct.unpack_from("<i", raw, 4)
    assert n_ref == 1
    (n_bin,) = struct.unpack_from("<i", raw, 8)
    assert n_bin > 0


def test_iter_prefetch_order_exceptions_and_abandon():
    from phaser_tpu.utils.prefetch import iter_prefetch

    assert list(iter_prefetch(range(100), depth=3)) == list(range(100))
    assert list(iter_prefetch(iter([]), depth=1)) == []

    def boom():
        yield 1
        yield 2
        raise ValueError("decode failed")

    got = []
    try:
        for x in iter_prefetch(boom(), depth=2):
            got.append(x)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "decode failed" in str(e)
    assert got == [1, 2]

    # abandoning mid-stream must not hang
    it = iter_prefetch(range(10**6), depth=2)
    assert next(it) == 0
    it.close()


def test_failure_record_written_and_cleared(tmp_path):
    """A failed phaser run writes <o>.failure.json (stage + exception chain);
    a subsequent successful run clears it."""
    import json
    from phaser_tpu.cli.phaser_main import main as phaser_main
    import datagen

    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=3, n_variants_per_contig=30,
        n_reads_per_contig=150, contig_len=20000)
    out = str(tmp_path / "run")

    rc = phaser_main(["--vcf", vcf, "--bam", str(tmp_path / "missing.bam"),
                      "--sample", "SAMPLE1", "--mapq", "10", "--baseq", "10",
                      "--paired_end", "1", "--o", out])
    assert rc == 1
    rec = json.load(open(out + ".failure.json"))
    assert rec["tool"] == "phaser"
    assert rec["exceptions"][0]["type"] == "FileNotFoundError"
    assert rec["argv"][0] == "--vcf"

    rc = phaser_main(["--vcf", vcf, "--bam", bam, "--sample", "SAMPLE1",
                      "--mapq", "10", "--baseq", "10", "--paired_end", "1",
                      "--o", out])
    assert rc == 0
    assert not (tmp_path / "run.failure.json").exists()


def test_failure_record_stage_marking(tmp_path):
    """Stage contextvar lands in the record when a stage is active."""
    from phaser_tpu.utils.failures import (current_stage, failure_stage,
                                           write_failure_record)
    import json
    assert current_stage() is None
    with failure_stage("#3 connections"):
        assert current_stage() == "#3 connections"
        try:
            raise RuntimeError("boom") 
        except RuntimeError as e:
            path = write_failure_record(str(tmp_path / "x"), "phaser", e, [])
    assert current_stage() is None
    rec = json.load(open(path))
    assert rec["stage"] == "#3 connections"
    assert rec["exceptions"] == [{"type": "RuntimeError", "message": "boom"}]


def test_failure_record_downstream_clis(tmp_path):
    """cis_var / expr_matrix / annotate CLIs write failure records on
    missing inputs."""
    import json
    from phaser_tpu.cli.cis_var_main import main as cis_main
    from phaser_tpu.cli.expr_matrix_main import main as em_main
    from phaser_tpu.cli.annotate_main import main as an_main

    o1 = str(tmp_path / "cv.txt")
    rc = cis_main(["--bed", str(tmp_path / "nope.bed"), "--vcf", "x",
                   "--pairs", "y", "--map", "z", "--o", o1])
    assert rc == 1
    assert json.load(open(o1 + ".failure.json"))["tool"] == "phaser_cis_var"

    o2 = str(tmp_path / "mat")
    rc = em_main(["--gene_ae_dir", str(tmp_path / "nodir"),
                  "--features", "x", "--o", o2])
    assert rc == 1
    assert json.load(open(o2 + ".failure.json"))["tool"] == "phaser_expr_matrix"

    o3 = str(tmp_path / "ann")
    rc = an_main(["--geno_vcf", str(tmp_path / "nope.vcf.gz"),
                  "--sample", "S", "--o", o3])
    assert rc == 1
    assert json.load(open(o3 + ".failure.json"))["tool"] == "phaser_annotate"


def test_bai_builder_native_matches_python(tmp_path):
    """The native-scan BAI builder must produce BYTE-IDENTICAL index files
    to the pure-Python fallback (bins, chunk merging, linear fill)."""
    import datagen
    from phaser_tpu.io.tabix import build_bai_index, _build_bai_index_python

    vcf, bam, _ = datagen.write_fixture_dir(
        str(tmp_path), seed=7, contigs=("c1", "c2"),
        n_variants_per_contig=60, n_reads_per_contig=700,
        frac_spliced=0.4, frac_indel_reads=0.3)
    build_bai_index(bam, bam + ".fast.bai")
    _build_bai_index_python(bam, bam + ".py.bai")
    fast = open(bam + ".fast.bai", "rb").read()
    py = open(bam + ".py.bai", "rb").read()
    assert fast == py and len(fast) > 100
