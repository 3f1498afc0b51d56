"""--process_slow mode: per-chromosome runs + output merging.

Mirrors the reference's memory-efficient mode
(/root/reference/phaser/phaser.py:264-372): each contig is processed
independently (which makes the sequencing-noise estimate per-chromosome, as
the reference warns), haplotype block indices stay globally unique, and the
per-contig outputs are merged: text files concatenated under one header,
per-contig VCFs concatenated, sorted by the input VCF's contig order, and
re-bgzipped + indexed.
"""

from __future__ import annotations

import os
from typing import List, Optional

from ..io import bgzf, tabix
from .output_stage import PhaserOptions
from .pipeline import PhaserResult, run_phaser

TEXT_SUFFIXES = ["variant_connections.txt", "allelic_counts.txt",
                 "haplotypes.txt", "haplotypic_counts.txt",
                 "allele_config.txt"]
# merged when present (--output_network)
OPTIONAL_TEXT_SUFFIXES = ["network.links.txt", "network.nodes.txt"]


def list_contigs(vcf_path: str) -> List[str]:
    """Distinct body contigs in appearance order (`tabix -l` equivalent)."""
    seen: List[str] = []
    data = bgzf.read_text_auto(vcf_path).decode()
    for line in data.splitlines():
        if line.startswith("#") or not line:
            continue
        c = line.split("\t", 1)[0]
        if c not in seen:
            seen.append(c)
    return seen


def _existing_block_count(prefix: str) -> int:
    """Blocks already written by a finished per-contig run (gw_confidence
    != 'nan' rows of its haplotypes file) — lets --resume keep PI unique."""
    path = prefix + ".haplotypes.txt"
    n = 0
    with open(path) as fh:
        next(fh, None)
        for line in fh:
            cols = line.rstrip("\n").split("\t")
            if len(cols) > 15 and cols[15] != "nan":
                n += 1
    return n


def run_phaser_slow(*, vcf: str, bam: str, sample: str, o: str, mapq: str,
                    baseq: int, paired_end: str, chrom: str = "",
                    opts: Optional[PhaserOptions] = None,
                    device: str = "host", resume: bool = False,
                    log=print, **kw) -> PhaserResult:
    opts = opts or PhaserOptions()
    contigs = chrom.split(",") if chrom else list_contigs(vcf)
    log("    Memory efficient mode is activated... ")
    log("    WARNING: this may produce slightly different results since the "
        "sequencing noise estimate is generated per chromosome")

    total = PhaserResult()
    pi_block_value = 0
    produced: List[str] = []
    for c in contigs:
        prefix = o + c
        if resume and all(os.path.isfile(prefix + "." + sfx)
                          for sfx in TEXT_SUFFIXES):
            log("     contig %s: resuming from existing outputs" % c)
            pi_block_value += _existing_block_count(prefix)
            produced.append(c)
            continue
        try:
            res = run_phaser(vcf=vcf, bam=bam, sample=sample, o=prefix,
                             mapq=mapq, baseq=baseq, paired_end=paired_end,
                             chrom=c, opts=opts, device=device,
                             pi_block_value=pi_block_value, log=log, **kw)
        except RuntimeError as e:
            log("     contig %s skipped: %s" % (c, e))
            continue
        pi_block_value = res.n_blocks
        produced.append(c)
        total.total_reads += res.total_reads
        total.het_count += res.het_count
        total.phased_variants += res.phased_variants
        total.unphased_count += res.unphased_count
        total.covered_count += res.covered_count
        total.dropped_connections += res.dropped_connections
        total.unphased_phased += res.unphased_phased
        total.phase_corrections += res.phase_corrections
    total.n_blocks = pi_block_value

    log("#8. Merging the results from several contigs/chromosome ...")
    optional_present = [
        sfx for sfx in OPTIONAL_TEXT_SUFFIXES
        if any(os.path.isfile(o + c + "." + sfx) for c in produced)]
    for suffix in TEXT_SUFFIXES + optional_present:
        out_path = o + "." + suffix
        with open(out_path, "w") as out:
            header_written = False
            for c in produced:
                p = o + c + "." + suffix
                if not os.path.isfile(p):
                    continue
                with open(p) as fh:
                    lines = fh.readlines()
                if not header_written and lines:
                    out.write(lines[0])
                    header_written = True
                out.writelines(lines[1:])

    if opts.write_vcf == 1 and produced:
        # concatenate per-contig VCFs: one header (first), bodies in the
        # input VCF's contig order (bcftools concat | sort equivalent)
        body: List[str] = []
        header: List[str] = []
        for i, c in enumerate(produced):
            p = o + c + ".vcf.gz"
            if not os.path.isfile(p):
                continue
            text = bgzf.decompress_all(open(p, "rb").read()).decode()
            for line in text.splitlines():
                if line.startswith("#"):
                    if i == 0:
                        header.append(line)
                else:
                    body.append(line)
        gz = o + ".vcf.gz"
        bgzf.compress_to_path(("\n".join(header + body) + "\n").encode(), gz)
        tabix.build_vcf_index(gz)

    # delete per-contig files
    for c in produced:
        for suffix in TEXT_SUFFIXES + ["vcf.gz", "vcf.gz.tbi", "vcf.gz.csi",
                                       "network.links.txt", "network.nodes.txt"]:
            p = o + c + "." + suffix
            if os.path.isfile(p):
                os.remove(p)
    return total
