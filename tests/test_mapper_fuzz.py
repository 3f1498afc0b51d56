"""Property-based fuzz: arbitrary CIGAR/variant combinations must produce
byte-identical mapper output vs the reference implementation.

Runs the reference in-process (import of the pure-Python module with stdin
redirected) to keep iterations fast.
"""

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/reference/phaser")

from phaser_tpu.cli import mapper_main

BASES = "ACGT"


@st.composite
def cigar_and_read(draw):
    """A structurally valid CIGAR + matching read bases/quals."""
    n_ops = draw(st.integers(1, 6))
    ops = []
    prev = None
    for i in range(n_ops):
        op = draw(st.sampled_from("MIDNSMM"))  # bias toward M
        ln = draw(st.integers(1, 12))
        ops.append((ln, op))
        prev = op
    # ensure at least one M
    if not any(o == "M" for _, o in ops):
        ops.append((draw(st.integers(1, 12)), "M"))
    read_len = sum(l for l, o in ops if o in "MIS")
    seq = "".join(draw(st.sampled_from(BASES)) for _ in range(read_len))
    quals = [draw(st.integers(2, 41)) for _ in range(read_len)]
    return ops, seq, quals


@st.composite
def scenario(draw):
    n_vars = draw(st.integers(1, 8))
    positions = sorted(draw(st.lists(st.integers(90, 180), min_size=n_vars,
                                     max_size=n_vars, unique=True)))
    variants = []
    for p in positions:
        ref_len = draw(st.sampled_from([1, 1, 1, 2, 3]))
        ref = "".join(draw(st.sampled_from(BASES)) for _ in range(ref_len))
        if draw(st.booleans()):
            alt = draw(st.sampled_from([b for b in BASES if b != ref[0]]))
        else:
            alt = ref[0] + "".join(draw(st.sampled_from(BASES))
                                   for _ in range(draw(st.integers(0, 2))))
            if alt == ref:
                alt = alt + "A"
        gt = draw(st.sampled_from(["0|1", "1|0", "0/1"]))
        variants.append((p, ref, alt, gt))
    n_reads = draw(st.integers(1, 6))
    reads = []
    start = 80
    for r in range(n_reads):
        start += draw(st.integers(0, 25))
        ops, seq, quals = draw(cigar_and_read())
        reads.append((start, ops, seq, quals))
    baseq = draw(st.sampled_from([0, 10, 30]))
    return variants, reads, baseq


def _table_text(variants):
    rows = []
    for p, ref, alt, gt in variants:
        uid = "c1_%d_%s_%s" % (p, ref, alt)
        rows.append("\t".join(["c1", str(p), uid, ".", ref + "," + alt,
                               str(len(ref)), gt, "None"]))
    return "\n".join(rows) + "\n"


def _sam_text(reads):
    lines = ["@HD\tVN:1.6\tSO:coordinate", "@SQ\tSN:c1\tLN:10000"]
    for i, (pos, ops, seq, quals) in enumerate(reads):
        cig = "".join("%d%s" % (l, o) for l, o in ops)
        lines.append("\t".join([
            "r%d" % i, "0", "c1", str(pos), "60", cig, "*", "0", "0",
            seq if seq else "*",
            "".join(chr(q + 33) for q in quals) if quals else "*",
            "AS:i:%d" % (100 + i)]))
    return "\n".join(lines) + "\n"


def _run_reference(sam, table, baseq, tmp):
    import importlib
    import read_variant_map
    importlib.reload(read_variant_map)
    tpath = os.path.join(tmp, "t.tsv")
    open(tpath, "w").write(table)
    opath = os.path.join(tmp, "ref.tsv")
    old_stdin = sys.stdin
    try:
        sys.stdin = io.StringIO(sam)
        with redirect_stdout(io.StringIO()):
            read_variant_map.do_read_variant_map(tpath, baseq, opath, 1, 0)
    finally:
        sys.stdin = old_stdin
    return open(opath).read()


@settings(max_examples=150, deadline=None)
@given(scenario())
def test_mapper_fuzz_vs_reference(sc):
    variants, reads, baseq = sc
    sam = _sam_text(reads)
    table = _table_text(variants)
    with tempfile.TemporaryDirectory() as tmp:
        ref_out = _run_reference(sam, table, baseq, tmp)
        our_path = os.path.join(tmp, "ours.tsv")
        tpath = os.path.join(tmp, "t2.tsv")
        open(tpath, "w").write(table)
        rc = mapper_main.run(tpath, baseq, our_path, 1, 0,
                             sam.splitlines())
        assert rc == 0
        ours = open(our_path).read()
    assert ours == ref_out
