"""phASER-POP parity: expr_matrix vs reference (shimmed), cis_var vs a
py3-patched copy of the reference (deterministic columns only — the
reference bootstraps with an unseeded RNG)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

import datagen
import refrunner
from phaser_tpu.analysis.cis_var import run_cis_var
from phaser_tpu.analysis.expr_matrix import run_expr_matrix
from phaser_tpu.analysis.gene_ae import run_gene_ae
from phaser_tpu.io import bgzf, tabix

REF_POP = "/root/reference/phaser_pop"


def _shim_env():
    env = dict(os.environ)
    env["PATH"] = refrunner.SHIM_BIN + ":" + env.get("PATH", "")
    env["PYTHONPATH"] = refrunner.SHIM_PY + ":" + env.get("PYTHONPATH", "")
    env["PHASER_TPU_REPO"] = refrunner.REPO
    return env


# ---------------------------------------------------------------------------
def test_expr_matrix_parity(tmp_path):
    # build two synthetic per-sample gene AE outputs via the real pipeline
    features = None
    gene_dir = tmp_path / "gene_ae"
    gene_dir.mkdir()
    from phaser_tpu.engine.output_stage import PhaserOptions
    from phaser_tpu.engine.pipeline import run_phaser
    from test_gene_ae_parity import _make_features
    for i, seed in enumerate((11, 12)):
        d = tmp_path / ("s%d" % i)
        d.mkdir()
        vcf, bam, data = datagen.write_fixture_dir(
            str(d), seed=seed, contigs=("chr20",), contig_len=25000,
            n_variants_per_contig=90, n_reads_per_contig=1500)
        prefix = str(d / "out")
        run_phaser(vcf=vcf, bam=bam, sample=data.sample, o=prefix, mapq="10",
                   baseq=10, paired_end="1", opts=PhaserOptions(),
                   log=lambda *a: None)
        if features is None:
            features = _make_features(data, tmp_path, n_genes=20, seed=5)
        run_gene_ae(prefix + ".haplotypic_counts.txt", features,
                    str(gene_dir / ("sample%d.txt" % i)), log=lambda *a: None)
        # give each file a distinct sample name in the bam column
        p = str(gene_dir / ("sample%d.txt" % i))
        txt = open(p).read().replace("\tout\n", "\tS%d\n" % i).replace(
            "\tsample\n", "\tS%d\n" % i)
        open(p, "w").write(txt)

    ref_out = str(tmp_path / "refmat")
    proc = subprocess.run(
        [sys.executable, os.path.join(REF_POP, "phaser_expr_matrix.py"),
         "--gene_ae_dir", str(gene_dir), "--features", features,
         "--o", ref_out],
        cwd=str(tmp_path), env=_shim_env(), capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    our_out = str(tmp_path / "ourmat")
    run_expr_matrix(str(gene_dir), features, our_out, log=lambda *a: None)

    for suffix in (".bed.gz", ".gw_phased.bed.gz"):
        ref_txt = bgzf.decompress_all(open(ref_out + suffix, "rb").read())
        our_txt = bgzf.decompress_all(open(our_out + suffix, "rb").read())
        assert our_txt.decode().splitlines() == ref_txt.decode().splitlines()
        assert os.path.exists(our_out + suffix + ".tbi")


# ---------------------------------------------------------------------------
def _make_cis_var_inputs(tmp_path, n_samples=20, n_genes=8, n_vars=10,
                         seed=3):
    rng = np.random.default_rng(seed)
    vsamples = ["V%d" % i for i in range(n_samples)]
    bsamples = ["B%d" % i for i in range(n_samples)]
    map_path = str(tmp_path / "sample_map.txt")
    with open(map_path, "w") as f:
        f.write("vcf_sample\tbed_sample\n")
        for v, b in zip(vsamples, bsamples):
            f.write("%s\t%s\n" % (v, b))

    genes = ["ENSG%05d.5" % i for i in range(n_genes)]
    bed_path = str(tmp_path / "matrix.bed.gz")
    rows = ["#contig\tstart\tstop\tname\t" + "\t".join(bsamples)]
    gene_pos = {}
    for gi, g in enumerate(genes):
        start = 1000 + gi * 2000
        gene_pos[g] = start
        counts = ["%d|%d" % (rng.integers(0, 30), rng.integers(0, 30))
                  for _ in range(n_samples)]
        rows.append("chr20\t%d\t%d\t%s\t%s" % (start, start + 1500, g,
                                               "\t".join(counts)))
    bgzf.compress_to_path(("\n".join(rows) + "\n").encode(), bed_path)

    vcf_path = str(tmp_path / "pop.vcf.gz")
    vlines = ["##fileformat=VCFv4.2",
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" +
              "\t".join(vsamples)]
    pairs = ["gene_id\tvar_id\tvar_contig\tvar_pos\tvar_ref\tvar_alt"]
    for vi in range(n_vars):
        pos = 1500 + vi * 1700
        ref, alt = "A", "G"
        vid = "rsv%d" % vi
        gts = rng.choice(["0|1", "1|0", "0|0", "1|1", "0/1", "0|1"],
                         size=n_samples)
        vlines.append("chr20\t%d\t%s\t%s\t%s\t100\tPASS\t.\tGT\t%s"
                      % (pos, vid, ref, alt, "\t".join(gts)))
        gene = genes[vi % n_genes]
        pairs.append("%s\t%s\tchr20\t%d\t%s\t%s" % (gene, vid, pos, ref, alt))
    bgzf.compress_to_path(("\n".join(vlines) + "\n").encode(), vcf_path)
    tabix.build_vcf_index(vcf_path)
    pairs_path = str(tmp_path / "pairs.txt")
    open(pairs_path, "w").write("\n".join(pairs) + "\n")
    return bed_path, vcf_path, pairs_path, map_path


def _patched_cis_var(tmp_path) -> str:
    """py3-compat patched copy of the reference cis_var (oracle only)."""
    src = open(os.path.join(REF_POP, "phaser_cis_var.py")).read()
    src = src.replace("from pandas.compat import StringIO",
                      "from io import StringIO")
    src = src.replace("len(df_pairs.index)/args.t",
                      "max(len(df_pairs.index)//args.t, 1)")
    src = src.replace('shell=True).replace("#","")',
                      'shell=True).decode().replace("#","")')
    src = src.replace('gzip.open(in_bed, "r")', 'gzip.open(in_bed, "rt")')
    path = str(tmp_path / "ref_cis_var.py")
    open(path, "w").write(src)
    return path


DET_COLS = ["gene", "var_id", "var_chr", "var_pos", "var_het_n", "var_hom_n",
            "het_hom_pvalue", "var_het_afc", "var_het_abs_afc", "var_hom_afc",
            "var_hom_abs_afc", "var_het_afcs", "var_hom_afcs",
            "var_het_ref_counts", "var_het_alt_counts", "var_hom_hap1_counts",
            "var_hom_hap2_counts", "var_het_sample_ids", "var_hom_sample_ids"]


def test_cis_var_parity(tmp_path):
    bed, vcf, pairs, smap = _make_cis_var_inputs(tmp_path)
    ref_script = _patched_cis_var(tmp_path)
    ref_out = str(tmp_path / "ref_cis.txt")
    proc = subprocess.run(
        [sys.executable, ref_script, "--bed", bed, "--vcf", vcf, "--pairs",
         pairs, "--map", smap, "--o", ref_out, "--bs", "50"],
        cwd=str(tmp_path), env=_shim_env(), capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    our_out = str(tmp_path / "our_cis.txt")
    run_cis_var(bed, vcf, pairs, smap, our_out, bs=50, log=lambda *a: None)

    rdf = pd.read_csv(ref_out, sep="\t", dtype=str).fillna("")
    odf = pd.read_csv(our_out, sep="\t", dtype=str).fillna("")
    assert list(rdf.columns) == list(odf.columns)
    assert len(rdf) == len(odf) > 0
    for col in DET_COLS:
        assert odf[col].tolist() == rdf[col].tolist(), "col %s differs" % col


def test_cis_var_chr_subset(tmp_path):
    """--chr restriction matches full-run rows for that contig."""
    bed, vcf, pairs, smap = _make_cis_var_inputs(tmp_path, n_samples=16,
                                                 n_genes=4, n_vars=8)
    full = str(tmp_path / "full.txt")
    sub = str(tmp_path / "sub.txt")
    run_cis_var(bed, vcf, pairs, smap, full, bs=50, log=lambda *a: None)
    run_cis_var(bed, vcf, pairs, smap, sub, bs=50, chrom="chr20",
                log=lambda *a: None)
    assert open(sub).read() == open(full).read()  # all pairs are chr20
    none = str(tmp_path / "none.txt")
    with pytest.raises(RuntimeError):
        # reference quits with "no phASER data read from input" here
        run_cis_var(bed, vcf, pairs, smap, none, bs=50, chrom="chrX",
                    log=lambda *a: None)


def test_cis_var_zero_usable_samples(tmp_path):
    """A record whose samples map to no matrix columns yields empty cohorts
    (nan CIs), matching the reference's tolerant membership check
    (phaser_cis_var.py:137-140) instead of crashing on a float64 empty
    array (round-2 regression)."""
    bed, vcf, pairs, smap = _make_cis_var_inputs(tmp_path, n_samples=6,
                                                 n_genes=2, n_vars=3)
    # sample map pointing at VCF samples that do not exist
    bad_map = str(tmp_path / "bad_map.txt")
    with open(bad_map, "w") as f:
        f.write("vcf_sample\tbed_sample\n")
        for i in range(6):
            f.write("NOPE%d\tB%d\n" % (i, i))
    out = str(tmp_path / "empty.txt")
    run_cis_var(bed, vcf, pairs, bad_map, out, bs=50, log=lambda *a: None)
    df = pd.read_csv(out, sep="\t")
    assert len(df) > 0
    assert (df["var_het_n"] == 0).all()
    assert df["var_het_afc"].isna().all()


def test_cis_var_malformed_cells(tmp_path):
    """Cells without 'a|b' shape (e.g. 'nan') mark that sample ineligible
    for that gene instead of crashing the whole run; min_cov sums ALL
    |-fields like the reference's sum(counts)."""
    bed, vcf, pairs, smap = _make_cis_var_inputs(tmp_path, n_samples=6,
                                                 n_genes=2, n_vars=3)
    raw = bgzf.read_text_auto(bed).decode().splitlines()
    # corrupt one cell of the first gene row; give another a 3-field cell
    hdr, rows = raw[0], raw[1:]
    cols = rows[0].split("\t")
    cols[4] = "nan"
    cols[5] = "5|5|99"   # all-field sum=109 passes min_cov 11; 5+5 would not
    rows[0] = "\t".join(cols)
    bed2 = str(tmp_path / "matrix2.bed.gz")
    bgzf.compress_to_path(("\n".join([hdr] + rows) + "\n").encode(), bed2)
    out = str(tmp_path / "mal.txt")
    run_cis_var(bed2, vcf, pairs, smap, out, bs=50, min_cov=11,
                log=lambda *a: None)
    df = pd.read_csv(out, sep="\t")
    assert len(df) > 0
