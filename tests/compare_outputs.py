"""Comparators for reference-vs-phaser_tpu output files.

Most files must match byte-for-byte.  Exceptions stem from the reference's
Python-set iteration order (hash-randomized):
  - variant_connections.txt: row order        -> compare as sorted lines
  - singleton sections of haplotypes/haplotypic_counts: row order
  - aReads/bReads read indices: values depend on set order -> compare after
    canonical relabeling (first-occurrence renumbering preserves identity
    structure, which is all downstream consumers use)
"""

from __future__ import annotations

from typing import List, Tuple


def read_lines(path: str) -> List[str]:
    with open(path) as fh:
        return fh.read().splitlines()


def canon_read_indices(a_reads: str, b_reads: str) -> Tuple[str, str]:
    out = []
    for reads in (a_reads, b_reads):
        mapping = {}
        groups_out = []
        for group in reads.split(";"):
            ids_out = []
            for tok in group.split(","):
                if tok == "":
                    ids_out.append("")
                    continue
                if tok not in mapping:
                    mapping[tok] = str(len(mapping))
                ids_out.append(mapping[tok])
            groups_out.append(",".join(ids_out))
        out.append(";".join(groups_out))
    return out[0], out[1]


def canon_hap_counts_line(line: str) -> str:
    cols = line.split("\t")
    if len(cols) >= 18:
        cols[16], cols[17] = canon_read_indices(cols[16], cols[17])
        # variantsBlacklisted is a Python set in the reference -> sort
        if cols[5]:
            cols[5] = ",".join(sorted(cols[5].split(",")))
    return "\t".join(cols)


def split_hap_counts(path: str) -> Tuple[List[str], List[str]]:
    """(block rows, singleton rows) of haplotypic_counts.txt — singleton rows
    end with two empty read-index columns AND have gwStat column '1' with
    variantCount 1 written via the :1214 path (blacklisted cols '': '', '0')."""
    lines = read_lines(path)
    header, body = lines[0], lines[1:]
    blocks, singles = [], []
    for l in body:
        c = l.split("\t")
        # singleton rows: variantCount==1, variantsBlacklisted=='', count '0',
        # gwStat=='1', aReads and bReads empty
        if len(c) >= 18 and c[4] == "1" and c[13] == "1" and c[16] == "" and c[17] == "":
            singles.append(l)
        else:
            blocks.append(canon_hap_counts_line(l))
    return blocks, singles


def split_haplotypes(path: str) -> Tuple[List[str], List[str]]:
    """(block rows, singleton rows) — singleton rows have gw_confidence 'nan'."""
    lines = read_lines(path)
    body = lines[1:]
    blocks = [l for l in body if l.split("\t")[15] != "nan"]
    singles = [l for l in body if l.split("\t")[15] == "nan"]
    return blocks, singles


def assert_same_hap_counts(ref_path: str, our_path: str) -> None:
    rb, rs = split_hap_counts(ref_path)
    ob, os_ = split_hap_counts(our_path)
    assert ob == rb, _diff("hap_counts blocks", rb, ob)
    assert sorted(os_) == sorted(rs), _diff("hap_counts singles", sorted(rs),
                                            sorted(os_))
    assert read_lines(ref_path)[0] == read_lines(our_path)[0]


def assert_same_haplotypes(ref_path: str, our_path: str) -> None:
    rb, rs = split_haplotypes(ref_path)
    ob, os_ = split_haplotypes(our_path)
    assert ob == rb, _diff("haplotypes blocks", rb, ob)
    assert sorted(os_) == sorted(rs), _diff("haplotypes singles", sorted(rs),
                                            sorted(os_))


def assert_same_connections(ref_path: str, our_path: str) -> None:
    r = read_lines(ref_path)
    o = read_lines(our_path)
    assert r[0] == o[0]
    assert sorted(r[1:]) == sorted(o[1:]), _diff("connections",
                                                 sorted(r[1:]), sorted(o[1:]))


def assert_exact(ref_path: str, our_path: str) -> None:
    r = read_lines(ref_path)
    o = read_lines(our_path)
    assert o == r, _diff(ref_path, r, o)


def assert_same_vcf(ref_gz: str, our_gz: str) -> None:
    from phaser_tpu.io import bgzf
    r = bgzf.decompress_all(open(ref_gz, "rb").read()).decode().splitlines()
    o = bgzf.decompress_all(open(our_gz, "rb").read()).decode().splitlines()
    assert o == r, _diff("vcf", r, o)


def _diff(what: str, ref: List[str], ours: List[str]) -> str:
    msgs = ["MISMATCH in %s: ref %d lines, ours %d lines" % (what, len(ref),
                                                             len(ours))]
    for i, (a, b) in enumerate(zip(ref, ours)):
        if a != b:
            msgs.append("first diff at line %d:\n  ref: %r\n  our: %r"
                        % (i, a, b))
            break
    else:
        if len(ref) != len(ours):
            longer = ref if len(ref) > len(ours) else ours
            msgs.append("extra line: %r" % longer[min(len(ref), len(ours))])
    return "\n".join(msgs)
