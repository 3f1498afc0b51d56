"""Device/host dispatch for allele assignment.

The device kernel (kernels.alleles) covers the overwhelmingly common case —
reads without insertions against single-base variants at unique positions —
and the host path handles the exact-semantics remainder (insertion splicing,
multi-base alleles, duplicate-position table entries).  Row union and order
are identical to the pure host path (verified by tests).

Shapes are bucketed to powers of two to bound XLA recompilation.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..engine.varmap import VariantTable
from ..io.bam import BamData, OP_I, OP_N
from .host import ContigHits, assign_alleles


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _read_op_masks(bd: BamData):
    opc = (bd.cigar_flat & 0xF)
    ops_per_read = np.diff(bd.cigar_off)
    op_read = np.repeat(np.arange(len(bd)), ops_per_read)
    has_ins = np.zeros(len(bd), bool)
    np.logical_or.at(has_ins, op_read, opc == OP_I)
    has_n = np.zeros(len(bd), bool)
    np.logical_or.at(has_n, op_read, opc == OP_N)
    return has_ins, has_n


def assign_alleles_auto(bd: BamData, vt: VariantTable, *, baseq: int,
                        splice: bool = True, isize_cutoff: float = 0,
                        device: str = "auto") -> ContigHits:
    """Device-accelerated assign_alleles with exact host fallback."""
    if device in ("host", "off") or len(bd) == 0 or len(vt) == 0:
        return assign_alleles(bd, vt, baseq=baseq, splice=splice,
                              isize_cutoff=isize_cutoff)
    import jax.numpy as jnp
    from ..kernels.alleles import (assign_alleles_device, compact_hits,
                                   pack_reads)

    if np.any(np.diff(vt.pos) < 0):
        raise ValueError("variant table must be position-sorted")

    has_ins, has_n = _read_op_masks(bd)
    keep_read = np.ones(len(bd), bool)
    if isize_cutoff != 0:
        keep_read &= np.abs(bd.tlen.astype(np.int64)) <= isize_cutoff
    if not splice:
        keep_read &= ~has_n

    # device-eligible variants: simple alleles at unique positions
    pos = vt.pos
    dup = np.zeros(len(vt), bool)
    if len(vt) > 1:
        d = np.diff(pos) == 0
        dup[1:] |= d
        dup[:-1] |= d
    dev_var = vt.is_simple & ~dup
    dev_vidx = np.flatnonzero(dev_var)

    dev_read = keep_read & ~has_ins

    rows_parts = []
    if dev_vidx.size and dev_read.any():
        codes, quals, refpos = pack_reads(bd)
        refpos[~dev_read, :] = 0  # ineligible reads produce no device hits
        # pad shapes to pow2 buckets to bound compilation
        N, L = codes.shape
        Np = _next_pow2(max(N, 8))
        if Np != N:
            codes = np.pad(codes, ((0, Np - N), (0, 0)))
            quals = np.pad(quals, ((0, Np - N), (0, 0)))
            refpos = np.pad(refpos, ((0, Np - N), (0, 0)))
        M = dev_vidx.size
        Mp = _next_pow2(max(M, 8))
        vpos = np.full(Mp, np.iinfo(np.int32).max, np.int32)
        vpos[:M] = pos[dev_vidx].astype(np.int32)
        ind = np.zeros((Mp, 2), np.uint8)
        ind[:M] = vt.ind_codes[dev_vidx]
        ni = np.zeros(Mp, np.int8)
        ni[:M] = vt.n_ind[dev_vidx]
        vidx_m, allele_m = assign_alleles_device(
            jnp.asarray(codes), jnp.asarray(quals), jnp.asarray(refpos),
            jnp.asarray(vpos), jnp.asarray(ind), jnp.asarray(ni), baseq)
        cap = _next_pow2(max(int(codes.size) // 8, 1024))
        r, v, a, nh = compact_hits(vidx_m, allele_m, cap)
        nh = int(nh)
        if nh > cap:
            # capacity overflow: fall back to host entirely (rare)
            return assign_alleles(bd, vt, baseq=baseq, splice=splice,
                                  isize_cutoff=isize_cutoff)
        r = np.asarray(r[:nh]).astype(np.int64)
        v = np.asarray(v[:nh]).astype(np.int64)
        a = np.asarray(a[:nh]).astype(np.int16)
        # map device variant index -> table index; recover nibble code
        vfull = dev_vidx[v]
        codes_out = np.where(
            a == 0, vt.ind_codes[vfull, 0],
            np.where(a == 1, vt.ind_codes[vfull, 1], 0)).astype(np.int16)
        # 'other' hits: recover the actual masked base code
        other = a == 2
        if other.any():
            base_rows = r[other]
            # find the base whose refpos equals the variant position
            # (codes/quals already packed; gather)
            rp = refpos[base_rows]
            target = pos[vfull[other]].astype(np.int32)[:, None]
            col = np.argmax(rp == target, axis=1)
            oc = codes[base_rows, col]
            oq = quals[base_rows, col]
            oc = np.where(oq < baseq, 15, oc)
            codes_out[other] = oc
        rows_parts.append((r, vfull, codes_out))

    # host remainder 1: insertion reads vs all variants
    ins_sel = np.flatnonzero(has_ins & keep_read)
    if ins_sel.size:
        sub = bd.select(ins_sel)
        h = assign_alleles(sub, vt, baseq=baseq, splice=splice,
                           isize_cutoff=isize_cutoff)
        hits_map = {}
        rr = ins_sel[h.read_idx]
        codes16 = h.allele_code.copy()
        part = (rr, h.var_idx.copy(), codes16)
        rows_parts.append(part)
        for row, s in h.allele_strs.items():
            hits_map[(int(rr[row]), int(h.var_idx[row]))] = s
    else:
        hits_map = {}

    # host remainder 2: non-device variants vs non-insertion reads
    rem_vidx = np.flatnonzero(~dev_var)
    nonins_sel = np.flatnonzero(~has_ins)
    if rem_vidx.size and nonins_sel.size:
        sub_vt = VariantTable(
            chrom=vt.chrom, pos=vt.pos[rem_vidx],
            unique_ids=[vt.unique_ids[i] for i in rem_vidx],
            rs_ids=[vt.rs_ids[i] for i in rem_vidx],
            all_alleles=[vt.all_alleles[i] for i in rem_vidx],
            ref_len=vt.ref_len[rem_vidx],
            geno_strings=[vt.geno_strings[i] for i in rem_vidx],
            maf_strs=[vt.maf_strs[i] for i in rem_vidx])
        sub_vt.finalize()
        sub = bd.select(nonins_sel)
        h = assign_alleles(sub, sub_vt, baseq=baseq, splice=splice,
                           isize_cutoff=isize_cutoff)
        rr = nonins_sel[h.read_idx]
        vv = rem_vidx[h.var_idx]
        rows_parts.append((rr, vv, h.allele_code.copy()))
        for row, s in h.allele_strs.items():
            hits_map[(int(rr[row]), int(vv[row]))] = s

    if not rows_parts:
        return ContigHits(np.zeros(0, np.int64), np.zeros(0, np.int64),
                          np.zeros(0, np.int16))
    all_r = np.concatenate([p[0] for p in rows_parts]).astype(np.int64)
    all_v = np.concatenate([p[1] for p in rows_parts]).astype(np.int64)
    all_c = np.concatenate([p[2] for p in rows_parts]).astype(np.int16)
    order = np.lexsort((all_v, all_r))
    hits = ContigHits(all_r[order], all_v[order], all_c[order])
    if hits_map:
        inv_lookup = {}
        for newpos, oldpos in enumerate(order):
            key = (int(all_r[oldpos]), int(all_v[oldpos]))
            if key in hits_map:
                hits.allele_strs[newpos] = hits_map[key]
                hits.allele_code[newpos] = -1
    return hits
