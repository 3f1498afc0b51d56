"""Gene-level haplotypic expression (phASER Gene AE).

Parity implementation of /root/reference/phaser_gene_ae/phaser_gene_ae.py:
feature interval stabbing (numpy sorted-starts + cummax-ends index instead of
an interval tree), block-phase mapping onto gene haplotypes, unique-read
deduplication via read-index sets, best-covered-unphased fallback, and the
log2 aFC with inf/-inf guards.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


def zero_divide(a, b) -> float:
    if b == 0:
        return float("inf")
    return float(a) / float(b)


def zero_log(value, base) -> float:
    if value == 0:
        return float("-inf")
    return math.log(value, base)


@dataclass
class _Feature:
    chrom: str
    start: int
    stop: int
    name: str


class _IntervalIndex:
    """start-sorted intervals + running-max end for contiguous candidate
    ranges; query semantics match intervaltree: begin < qend and end > qbeg."""

    def __init__(self, starts: np.ndarray, ends: np.ndarray, ids: np.ndarray):
        order = np.argsort(starts, kind="stable")
        self.starts = starts[order]
        self.ends = ends[order]
        self.ids = ids[order]
        self.cummax_end = np.maximum.accumulate(self.ends)

    def query(self, qbeg: int, qend: int) -> np.ndarray:
        hi = np.searchsorted(self.starts, qend, side="left")
        lo = np.searchsorted(self.cummax_end, qbeg, side="right")
        if lo >= hi:
            return self.ids[:0]
        cand = slice(lo, hi)
        mask = self.ends[cand] > qbeg
        return self.ids[cand][mask]


def run_gene_ae(haplotypic_counts: str, features: str, o: str,
                id_separator: str = "_", gw_cutoff: float = 0.9,
                min_cov: int = 0, min_haplo_maf: float = 0,
                log=print) -> None:
    if min_haplo_maf < 0 or min_haplo_maf > 0.5:
        raise ValueError("invalid value for min_haplo_maf")

    feats: List[_Feature] = []
    by_chrom: Dict[str, List[int]] = {}
    with open(features) as fh:
        for line in fh:
            cols = line.rstrip().split("\t")
            if len(cols) < 4:
                continue
            f = _Feature(cols[0], int(cols[1]), int(cols[2]), cols[3])
            by_chrom.setdefault(f.chrom, []).append(len(feats))
            feats.append(f)
    index: Dict[str, _IntervalIndex] = {}
    for chrom, ids in by_chrom.items():
        index[chrom] = _IntervalIndex(
            np.asarray([feats[i].start for i in ids]),
            np.asarray([feats[i].stop for i in ids]),
            np.asarray(ids))

    df_master = pd.read_csv(haplotypic_counts, sep="\t", index_col=False)
    if "bam" not in df_master.columns:
        raise ValueError("phaser_gene_ae requires phASER v1.0.0+ results "
                         "(missing 'bam' column)")

    out = open(o, "w")
    out.write("\t".join(["contig", "start", "stop", "name", "aCount", "bCount",
                         "totalCount", "log2_aFC", "n_variants", "variants",
                         "gw_phased", "bam"]) + "\n")

    # canonical bam order: first appearance (reference: set iteration)
    bam_order = list(dict.fromkeys(df_master["bam"].tolist()))
    for xbam in bam_order:
        df = df_master[df_master.bam == xbam]
        state = {i: {"aCount": 0, "bCount": 0, "variants": [],
                     "unphased_aCount": 0, "unphased_bCount": 0,
                     "unphased_variants": ""} for i in range(len(feats))}
        maf_filtered = 0
        has_maf_col = "max_haplo_maf" in df.columns

        for _, row in df.iterrows():
            chrom = str(row["contig"])
            if not (row["totalCount"] > 0 and chrom in index):
                continue
            hits = index[chrom].query(int(row["start"]) - 1, int(row["stop"]))
            if len(hits) == 0:
                continue
            xvars = str(row["variants"]).split(",")
            if id_separator not in xvars[0] or xvars[0].count(id_separator) < 3:
                raise ValueError("ID separator not found in variant ID")
            for fid in hits:
                f = feats[int(fid)]
                mapped = _variant_feature_reads(row, xvars, f, id_separator)
                st = state[int(fid)]
                if row["blockGWPhase"] != "0/1" and \
                        float(row["gwStat"] >= gw_cutoff):
                    if min_haplo_maf > 0 and has_maf_col and \
                            row["max_haplo_maf"] < min_haplo_maf:
                        if mapped["totalCount"] > (st["unphased_aCount"] +
                                                   st["unphased_bCount"]):
                            st["unphased_aCount"] = mapped["aCount"]
                            st["unphased_bCount"] = mapped["bCount"]
                            st["unphased_variants"] = mapped["variants"]
                        maf_filtered += 1
                        continue
                    if row["blockGWPhase"] == "0|1":
                        st["aCount"] += mapped["aCount"]
                        st["bCount"] += mapped["bCount"]
                    elif row["blockGWPhase"] == "1|0":
                        st["aCount"] += mapped["bCount"]
                        st["bCount"] += mapped["aCount"]
                    st["variants"] += mapped["variants"]
                else:
                    if mapped["totalCount"] > (st["unphased_aCount"] +
                                               st["unphased_bCount"]):
                        st["unphased_aCount"] = mapped["aCount"]
                        st["unphased_bCount"] = mapped["bCount"]
                        st["unphased_variants"] = mapped["variants"]

        if maf_filtered > 0:
            log("          %d of %d haplotypes treated as unphased due to "
                "low MAF" % (maf_filtered, len(df.index)))

        for i in range(len(feats)):
            st = state[i]
            f = feats[i]
            phased_tot = st["aCount"] + st["bCount"]
            unphased_tot = st["unphased_aCount"] + st["unphased_bCount"]
            if phased_tot >= unphased_tot:
                total_cov = phased_tot
                log2_afc = zero_log(zero_divide(st["aCount"], st["bCount"]), 2)
                if total_cov >= min_cov:
                    out.write("\t".join(map(str, [
                        f.chrom, f.start, f.stop, f.name, st["aCount"],
                        st["bCount"], total_cov, log2_afc,
                        len(st["variants"]), ",".join(st["variants"]), 1,
                        xbam])) + "\n")
            elif phased_tot < unphased_tot:
                total_cov = unphased_tot
                log2_afc = zero_log(zero_divide(st["unphased_aCount"],
                                                st["unphased_bCount"]), 2)
                if total_cov >= min_cov:
                    out.write("\t".join(map(str, [
                        f.chrom, f.start, f.stop, f.name,
                        st["unphased_aCount"], st["unphased_bCount"],
                        total_cov, log2_afc, len(st["unphased_variants"]),
                        ",".join(st["unphased_variants"]), 0, xbam])) + "\n")
    out.close()


def _variant_feature_reads(row, xvars: List[str], feature: _Feature,
                           id_separator: str) -> dict:
    """variant_feature_reads (:172-219): unique-read counting over variants
    overlapping the feature (inclusive-end quirk preserved)."""
    hap_a_reads: List[str] = []
    hap_b_reads: List[str] = []
    used_vars: List[str] = []
    for xvar in xvars:
        xvar_index = xvars.index(xvar)
        fields = xvar.split(id_separator)
        xvar_pos = int(fields[1])
        if (xvar_pos - 1) - feature.start >= 0 and \
                (xvar_pos - 1) - feature.stop <= 0:
            used_vars.append(xvar)
            if len(xvars) == 1:
                hap_a_reads += [str(x) for x in range(int(row["aCount"]))]
                hap_b_reads += [str(x) for x in range(int(row["bCount"]))]
            else:
                hap_a_reads += str(row["aReads"]).split(";")[xvar_index].split(",")
                hap_b_reads += str(row["bReads"]).split(";")[xvar_index].split(",")
    sa = set(hap_a_reads)
    sb = set(hap_b_reads)
    sa.discard("")
    sb.discard("")
    return {"variants": used_vars, "aCount": len(sa), "bCount": len(sb),
            "totalCount": len(sa) + len(sb)}
