"""Byte-parity of our vectorized mapper vs the reference's pure-Python mapper.

The reference mapper (/root/reference/phaser/read_variant_map.py) is runnable
with only the stdlib, so it serves as a true independent oracle: we feed both
implementations the identical SAM stream + variant table and require identical
TSV bytes.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import datagen
from phaser_tpu.cli import mapper_main
from phaser_tpu.engine.varmap import build_variant_table
from phaser_tpu.io import vcf as vcfio

REF_DIR = "/root/reference/phaser"


def _build_table_text(vcf_path, sample_col, include_indels=False,
                      gw_phase_method=0):
    lines = vcfio.het_filtered_lines(vcf_path, sample_col)
    body = [l for l in lines if not l.startswith("#")]
    hs = vcfio.parse_het_sites(body, "", ["_", ":"], pass_only=True)
    tables = []
    text = []
    for chrom, recs in hs.pool.items():
        vt = build_variant_table(chrom, recs, include_indels=include_indels,
                                 gw_phase_method=gw_phase_method)
        tables.append(vt)
        text.append(vt.mapping_table_text())
    return "".join(text), tables


def _run_reference(sam_text, table_text, tmp_path, baseq=10, splice=1, isize=0):
    tpath = tmp_path / "table.tsv"
    tpath.write_text(table_text)
    opath = tmp_path / "ref_out.tsv"
    proc = subprocess.run(
        [sys.executable, "call_read_variant_map.py",
         "--variant_table", str(tpath), "--baseq", str(baseq),
         "--o", str(opath), "--splice", str(splice),
         "--isize_cutoff", str(isize)],
        cwd=REF_DIR, input=sam_text, capture_output=True, text=True)
    return proc, (opath.read_text() if opath.exists() else None)


def _run_ours(sam_text, table_text, tmp_path, baseq=10, splice=1, isize=0):
    tpath = tmp_path / "table.tsv"
    tpath.write_text(table_text)
    opath = tmp_path / "our_out.tsv"
    rc = mapper_main.run(str(tpath), baseq, str(opath), splice, isize,
                         sam_text.splitlines())
    return rc, opath.read_text()


@pytest.mark.parametrize("seed,baseq,isize", [(0, 10, 0), (1, 30, 0), (2, 10, 400)])
def test_mapper_byte_parity(tmp_path, seed, baseq, isize):
    data = datagen.generate(seed=seed, contigs=("chr20", "chr21"),
                            n_variants_per_contig=80, n_reads_per_contig=400)
    table_text, _ = _build_table_text(
        str(tmp_path / "v.vcf.gz") if False else _write_vcf(data, tmp_path), 9)
    sam = data.sam_text()
    proc, ref_out = _run_reference(sam, table_text, tmp_path, baseq=baseq, isize=isize)
    assert proc.returncode == 0, proc.stderr
    rc, our_out = _run_ours(sam, table_text, tmp_path, baseq=baseq, isize=isize)
    assert rc == 0
    assert our_out == ref_out


def _write_vcf(data, tmp_path):
    p = str(tmp_path / "v.vcf.gz")
    data.write_vcf(p)
    return p


def test_mapper_parity_no_splice(tmp_path):
    data = datagen.generate(seed=3, contigs=("chr20",), n_variants_per_contig=60,
                            n_reads_per_contig=300, frac_spliced=0.4)
    table_text, _ = _build_table_text(_write_vcf(data, tmp_path), 9)
    sam = data.sam_text()
    proc, ref_out = _run_reference(sam, table_text, tmp_path, splice=0)
    assert proc.returncode == 0, proc.stderr
    rc, our_out = _run_ours(sam, table_text, tmp_path, splice=0)
    assert our_out == ref_out


def test_mapper_parity_with_indel_variants(tmp_path):
    data = datagen.generate(seed=4, contigs=("chr20",), n_variants_per_contig=80,
                            n_reads_per_contig=400, include_indel_variants=True,
                            frac_indel_reads=0.25)
    table_text, _ = _build_table_text(_write_vcf(data, tmp_path), 9,
                                      include_indels=True)
    sam = data.sam_text()
    proc, ref_out = _run_reference(sam, table_text, tmp_path)
    assert proc.returncode == 0, proc.stderr
    rc, our_out = _run_ours(sam, table_text, tmp_path)
    assert our_out == ref_out


def test_mapper_contig_mismatch_error(tmp_path):
    data = datagen.generate(seed=5, contigs=("chr20",), n_variants_per_contig=20,
                            n_reads_per_contig=50)
    table_text, _ = _build_table_text(_write_vcf(data, tmp_path), 9)
    # prepend variants on a contig absent from the SAM header
    bogus = "\n".join("\t".join(["chrZ", str(100 + i), "chrZ_%d_A_G" % (100 + i),
                                 ".", "A,G", "1", "0|1", "None"])
                      for i in range(3))
    table_text = bogus + "\n" + table_text
    sam = data.sam_text()
    proc, ref_out = _run_reference(sam, table_text, tmp_path)
    rc, our_out = _run_ours(sam, table_text, tmp_path)
    assert (proc.returncode != 0) == (rc != 0)
    if proc.returncode != 0:
        assert "contigs do not match" in proc.stdout
    assert our_out == ref_out
