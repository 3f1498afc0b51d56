"""--process_slow per-chromosome mode: merged outputs + block-index
continuity. (Noise is per-chromosome in this mode — the reference warns the
results may differ slightly from the fast path, so we check structure and
count-level invariants, not byte equality with fast mode.)"""

import os

import datagen
from phaser_tpu.engine.output_stage import PhaserOptions
from phaser_tpu.engine.pipeline import run_phaser
from phaser_tpu.engine.slow_mode import list_contigs, run_phaser_slow
from phaser_tpu.io import bgzf


def test_slow_mode_merge(tmp_path):
    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=61, contigs=("chr20", "chr21"), contig_len=15000,
        n_variants_per_contig=60, n_reads_per_contig=800)
    assert list_contigs(vcf) == ["chr20", "chr21"]
    fast = str(tmp_path / "fast")
    slow = str(tmp_path / "slow")
    # as_q_cutoff=0: the AS quantile is per-run, so disabling it makes
    # allelic counts mode-invariant (noise only affects connections)
    opts = PhaserOptions(as_q_cutoff=0)
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=fast, mapq="10",
               baseq=10, paired_end="1", opts=opts, log=lambda *a: None)
    run_phaser_slow(vcf=vcf, bam=bam, sample=data.sample, o=slow, mapq="10",
                    baseq=10, paired_end="1", opts=opts, log=lambda *a: None)
    # allelic counts are noise-independent => identical across modes
    assert open(fast + ".allelic_counts.txt").read() == \
        open(slow + ".allelic_counts.txt").read()
    # per-contig intermediates cleaned up
    assert not os.path.exists(slow + "chr20.haplotypes.txt")
    # merged VCF: same line count as fast mode, PI strictly unique per block
    sv = bgzf.decompress_all(open(slow + ".vcf.gz", "rb").read()).decode().splitlines()
    fv = bgzf.decompress_all(open(fast + ".vcf.gz", "rb").read()).decode().splitlines()
    assert len(sv) == len(fv)
    assert os.path.exists(slow + ".vcf.gz.tbi")
    pis = set()
    n_hap_rows = 0
    for l in open(slow + ".haplotypes.txt").read().splitlines()[1:]:
        if l.split("\t")[15] != "nan":
            n_hap_rows += 1
    for l in sv:
        if l.startswith("#"):
            continue
        f = l.split("\t")
        fmt = f[8].split(":")
        s = f[9].split(":")
        if "PI" in fmt:
            v = s[fmt.index("PI")]
            if v not in (".", ""):
                pis.add(int(v))
    assert len(pis) == n_hap_rows  # block ids unique across contigs


def test_slow_mode_resume(tmp_path):
    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=62, contigs=("chr20", "chr21"), contig_len=12000,
        n_variants_per_contig=50, n_reads_per_contig=600)
    opts = PhaserOptions(as_q_cutoff=0)
    full = str(tmp_path / "full")
    run_phaser_slow(vcf=vcf, bam=bam, sample=data.sample, o=full, mapq="10",
                    baseq=10, paired_end="1", opts=opts, log=lambda *a: None)
    # simulate an interrupted run: only chr20 finished
    part = str(tmp_path / "part")
    run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=part + "chr20",
               mapq="10", baseq=10, paired_end="1", chrom="chr20", opts=opts,
               log=lambda *a: None)
    run_phaser_slow(vcf=vcf, bam=bam, sample=data.sample, o=part, mapq="10",
                    baseq=10, paired_end="1", opts=opts, resume=True,
                    log=lambda *a: None)
    for sfx in (".haplotypes.txt", ".allelic_counts.txt",
                ".haplotypic_counts.txt"):
        assert open(part + sfx).read() == open(full + sfx).read(), sfx


def test_stream_vcf_body_multiblock(tmp_path):
    """_stream_vcf_body on VCFs spanning several BGZF blocks: the carry at
    the header->body transition must flush in place, not at EOF (round-2
    advisor finding: a record lost its contig prefix mid-file and a garbage
    fragment landed at EOF on any real chromosome)."""
    from phaser_tpu.engine.slow_mode import _stream_vcf_body

    def make_vcf(path, contig, n_rows):
        header = ("##fileformat=VCFv4.2\n" +
                  "".join("##x%d=%s\n" % (i, "h" * 120) for i in range(40)) +
                  "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
        body = "".join(
            "%s\t%d\trs%d\tA\tG\t100\tPASS\t%s\tGT\t0|1\n"
            % (contig, i + 1, i, "P" * 180) for i in range(n_rows))
        bgzf.compress_to_path((header + body).encode(), path)
        return header, body

    p1 = str(tmp_path / "c1.vcf.gz")
    p2 = str(tmp_path / "c2.vcf.gz")
    h1, b1 = make_vcf(p1, "chr1", 900)     # ~180 KB: several 64 KB blocks
    h2, b2 = make_vcf(p2, "chr2", 700)
    out = str(tmp_path / "merged.vcf.gz")
    with bgzf.BgzfWriter(out) as w:
        _stream_vcf_body(p1, w, include_header=True)
        _stream_vcf_body(p2, w, include_header=False)
    merged = bgzf.read_text_auto(out).decode()
    assert merged == h1 + b1 + b2


def test_slow_mode_with_position_shards(tmp_path):
    """--process_slow composed with position shards (round-4 verdict #4):
    threads>1 runs each contig through the sharded engine (weight-balanced
    position ranges, bounded per-shard memory) — outputs byte-identical to
    the single-threaded slow run."""
    import filecmp

    vcf, bam, data = datagen.write_fixture_dir(
        str(tmp_path), seed=63, contigs=("chr20", "chr21"), contig_len=15000,
        n_variants_per_contig=60, n_reads_per_contig=900)
    s1 = str(tmp_path / "s1")
    s2 = str(tmp_path / "s2")
    run_phaser_slow(vcf=vcf, bam=bam, sample=data.sample, o=s1, mapq="10",
                    baseq=10, paired_end="1", opts=PhaserOptions(),
                    log=lambda *a: None)
    run_phaser_slow(vcf=vcf, bam=bam, sample=data.sample, o=s2, mapq="10",
                    baseq=10, paired_end="1", opts=PhaserOptions(),
                    threads=3, log=lambda *a: None)
    for sfx in (".haplotypes.txt", ".haplotypic_counts.txt",
                ".allelic_counts.txt", ".variant_connections.txt",
                ".allele_config.txt", ".vcf.gz"):
        assert filecmp.cmp(s1 + sfx, s2 + sfx, shallow=False), sfx
    # per-contig AND per-shard intermediates cleaned up
    leftovers = [f for f in os.listdir(str(tmp_path))
                 if ".shard" in f or "s2chr" in f]
    assert not leftovers, leftovers
