"""Device allele-assignment kernel (the hot loop of the framework).

Semantics match mapper.host's fast path (single-base variants): every
reference-aligned, BASEQ-passing, non-N read base whose genome position hits
a variant produces one (read, variant, allele-class) hit.

Layout: reads are padded to (N, L) int tensors; the variant table is a sorted
position vector plus per-variant individual allele codes.  The kernel is a
fused mask -> vectorized binary search -> gather-compare -> stream-compaction,
all VPU work with no data-dependent shapes (hit capacity is static).

On TPU the production classifier is the WINDOWED Pallas kernel
(assign_compact_affine_nibble_windowed): per-block table windows DMA'd
HBM->VMEM and binary-searched there, slope-measured ~5.7x the XLA
searchsorted kernel's true execution at whole-contig table widths
(ARCHITECTURE.md, "The Pallas question").  The jnp/XLA kernels remain the
CPU path and the exact fallback (band overflow, non-nibble formats).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

OTHER = 2
NO_HIT = 3


@functools.partial(jax.jit, static_argnames=("baseq",))
def assign_alleles_device(codes: jax.Array, quals: jax.Array,
                          refpos: jax.Array, vpos: jax.Array,
                          ind_codes: jax.Array, n_ind: jax.Array,
                          baseq: int) -> Tuple[jax.Array, jax.Array]:
    """Per-base hit classification.

    codes:  (N, L) uint8 nibble codes (0 pad)
    quals:  (N, L) uint8
    refpos: (N, L) int32 1-based aligned genome position (0 = unaligned pad)
    vpos:   (M,) int32 sorted variant positions (must be unique; duplicate
            table entries are resolved host-side)
    ind_codes: (M, 2) uint8 individual's allele codes
    n_ind:  (M,) int8

    Returns (vidx, allele_class) each (N, L) int32:
      allele_class: 0/1 = ind allele index, 2 = other, 3 = no hit
    """
    masked = jnp.where(quals >= baseq, codes, jnp.uint8(15))
    vidx = jnp.searchsorted(vpos, refpos, side="left").astype(jnp.int32)
    M = vpos.shape[0]
    safe = jnp.minimum(vidx, M - 1)
    hit = (refpos > 0) & (vidx < M) & (vpos[safe] == refpos) & (masked != 15)
    a0 = ind_codes[safe, 0]
    a1 = ind_codes[safe, 1]
    ni = n_ind[safe]
    allele = jnp.where(
        (masked == a0) & (ni > 0), 0,
        jnp.where((masked == a1) & (ni > 1), 1, OTHER)).astype(jnp.int32)
    allele = jnp.where(hit, allele, NO_HIT)
    return jnp.where(hit, vidx, -1), allele


@functools.partial(jax.jit, static_argnames=("capacity",))
def compact_hits(vidx: jax.Array, allele: jax.Array,
                 capacity: int) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Stream-compact per-base hits into (read, var, allele) triplets.

    Returns (read_idx, var_idx, allele_class, n_hits); rows beyond n_hits are
    -1 padded.  Order: read-major then base order == (read, variant-position)
    — the reference mapper's row order.
    """
    N, L = vidx.shape
    flat_v = vidx.reshape(-1)
    flat_a = allele.reshape(-1)
    is_hit = flat_a < NO_HIT
    pos = jnp.cumsum(is_hit) - 1
    n_hits = jnp.sum(is_hit)
    read_of = (jnp.arange(N * L, dtype=jnp.int32) // L)
    out_r = jnp.full(capacity, -1, jnp.int32)
    out_v = jnp.full(capacity, -1, jnp.int32)
    out_a = jnp.full(capacity, -1, jnp.int32)
    idx = jnp.where(is_hit, pos, capacity)  # dropped past capacity
    out_r = out_r.at[idx].set(read_of, mode="drop")
    out_v = out_v.at[idx].set(flat_v, mode="drop")
    out_a = out_a.at[idx].set(flat_a, mode="drop")
    return out_r, out_v, out_a, n_hits


import threading as _threading

_pack_tls = _threading.local()  # per-thread scratch: shard threads (the
# device-enabled multi-shard engine) each pack concurrently; a shared dict
# would hand one thread's live view to another mid-upload


def _reuse_buf(tag: str, n: int, L: int, dtype) -> np.ndarray:
    """Cached (n, L) scratch view; grown geometrically, pages stay hot.
    Thread-local: safe under concurrent shard-engine packers."""
    bufs = getattr(_pack_tls, "bufs", None)
    if bufs is None:
        bufs = _pack_tls.bufs = {}
    need = n * L
    flat = bufs.get(tag)
    if flat is None or flat.size < need:
        cap = max(need, 2 * (flat.size if flat is not None else 0), 1)
        flat = np.empty(cap, dtype)
        bufs[tag] = flat
    return flat[:need].reshape(n, L)


def pack_reads(bd, max_len: int = 0, native: bool = True,
               reuse: bool = False) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side packing of a BamData subset into (codes, quals, refpos)
    padded (N, L) tensors. L is rounded up to a multiple of 128 (lane width).

    Uses the C++ packer (CIGAR expansion fused with the copy, multithreaded;
    zero-fills padding itself) when available; numpy fallback otherwise.
    With reuse=True the outputs are views of cached scratch buffers —
    INVALIDATED by the next reuse=True call — avoiding tens of MB of fresh
    page-faulted allocation per batch on the hot path.
    """
    n = len(bd)
    lens = np.diff(bd.seq_off)
    L = int(max(max_len, lens.max() if n else 1))
    L = ((L + 127) // 128) * 128
    native_ok = False
    if native and n:
        from ..io import native as native_mod
        native_ok = native_mod.get_lib() is not None
    if reuse and native_ok:
        codes = _reuse_buf("codes", n, L, np.uint8)
        quals = _reuse_buf("quals", n, L, np.uint8)
        refpos = _reuse_buf("refpos", n, L, np.int32)
    else:
        codes = np.zeros((n, L), np.uint8)
        quals = np.zeros((n, L), np.uint8)
        refpos = np.zeros((n, L), np.int32)
    if native and n:
        from ..io import native as native_mod
        lib = native_mod.get_lib()
        if lib is not None:
            import ctypes
            import os as _os
            ptr = ctypes.c_void_p
            pos = np.ascontiguousarray(bd.pos, np.int32)
            cig = np.ascontiguousarray(bd.cigar_flat, np.uint32)
            coff = np.ascontiguousarray(bd.cigar_off, np.int64)
            seq = np.ascontiguousarray(bd.seq_flat, np.uint8)
            qual = np.ascontiguousarray(bd.qual_flat, np.uint8)
            soff = np.ascontiguousarray(bd.seq_off, np.int64)
            lib.pack_reads_native(
                n, pos.ctypes.data_as(ptr), cig.ctypes.data_as(ptr),
                coff.ctypes.data_as(ptr), seq.ctypes.data_as(ptr),
                qual.ctypes.data_as(ptr), soff.ctypes.data_as(ptr),
                L, codes.ctypes.data_as(ptr), quals.ctypes.data_as(ptr),
                refpos.ctypes.data_as(ptr), min(_os.cpu_count() or 1, 8))
            return codes, quals, refpos
    from ..mapper.host import expand_refpos

    rp_flat, _, _ = expand_refpos(bd)
    idx = np.arange(len(bd.seq_flat)) - np.repeat(bd.seq_off[:-1], lens)
    rows = np.repeat(np.arange(n), lens)
    codes[rows, idx] = bd.seq_flat
    quals[rows, idx] = bd.qual_flat
    refpos[rows, idx] = rp_flat
    return codes, quals, refpos


def _pack_hits(vidx: jax.Array, allele: jax.Array, masked: jax.Array,
               capacity: int) -> jax.Array:
    """Compaction into a transfer-friendly layout for high-latency links:
    ONE (2, capacity+1) int32 array — row 0 is [n_hits, read_0, read_1, ...],
    row 1 is [-1, (var_0 << 8) | (base_code_0 << 4) | allele_0, ...]. The
    caller fetches a >=1024-column head slice (sub-1024 device->host fetches
    cost seconds through the axon tunnel; one batched fetch costs ~5 ms) and
    only goes back for a bigger slice when n_hits spills past the head.
    Embedding the observed (masked) base nibble means hit emission needs NO
    further host-side gathers into the read planes.

    Requires var_idx < 2^23 (dispatch guards this); int32 throughout —
    safe under disabled x64.
    """
    N, L = vidx.shape
    flat_v = vidx.reshape(-1).astype(jnp.int32)
    flat_a = allele.reshape(-1).astype(jnp.int32)
    flat_m = masked.reshape(-1).astype(jnp.int32)
    is_hit = flat_a < NO_HIT
    pos = jnp.cumsum(is_hit) - 1
    n_hits = jnp.sum(is_hit).astype(jnp.int32)
    read_of = (jnp.arange(N * L, dtype=jnp.int32) // L)
    word = (flat_v << 8) | (flat_m << 4) | flat_a
    out = jnp.full((2, capacity + 1), -1, jnp.int32)
    out = out.at[0, 0].set(n_hits)
    idx = jnp.where(is_hit, pos + 1, capacity + 1)  # dropped past capacity
    out = out.at[0, idx].set(read_of, mode="drop")
    return out.at[1, idx].set(word, mode="drop")


@functools.partial(jax.jit, static_argnames=("baseq", "capacity"))
def assign_compact_plane(codes: jax.Array, quals: jax.Array,
                         refpos: jax.Array, vpos: jax.Array,
                         ind_codes: jax.Array, n_ind: jax.Array,
                         baseq: int, capacity: int) -> jax.Array:
    """Fused assign_alleles_device + hit packing: ONE program whose only
    output is the small packed-hit buffer (the (N, L) classification planes
    never leave the device)."""
    vidx, allele = assign_alleles_device(codes, quals, refpos, vpos,
                                         ind_codes, n_ind, baseq)
    masked = jnp.where(quals >= baseq, codes, jnp.uint8(15))
    return _pack_hits(vidx, allele, masked, capacity)


@functools.partial(jax.jit, static_argnames=("baseq", "capacity"))
def assign_compact_affine(codes: jax.Array, quals: jax.Array,
                          start: jax.Array, lo: jax.Array, hi: jax.Array,
                          vpos: jax.Array, ind_codes: jax.Array,
                          n_ind: jax.Array, baseq: int,
                          capacity: int) -> jax.Array:
    """Fused affine assign + hit packing (see assign_compact_plane)."""
    vidx, allele = assign_alleles_affine_device(codes, quals, start, lo, hi,
                                                vpos, ind_codes, n_ind, baseq)
    masked = jnp.where(quals >= baseq, codes, jnp.uint8(15))
    return _pack_hits(vidx, allele, masked, capacity)


def _classify_masked(masked, refpos, vpos, ind_codes, n_ind):
    """Hit classification from a pre-masked plane (15 = low-qual/N/pad)."""
    vidx = jnp.searchsorted(vpos, refpos, side="left").astype(jnp.int32)
    M = vpos.shape[0]
    safe = jnp.minimum(vidx, M - 1)
    hit = (refpos > 0) & (vidx < M) & (vpos[safe] == refpos) & (masked != 15)
    a0 = ind_codes[safe, 0]
    a1 = ind_codes[safe, 1]
    ni = n_ind[safe]
    allele = jnp.where(
        (masked == a0) & (ni > 0), 0,
        jnp.where((masked == a1) & (ni > 1), 1, OTHER)).astype(jnp.int32)
    allele = jnp.where(hit, allele, NO_HIT)
    return jnp.where(hit, vidx, -1), allele


@functools.partial(jax.jit, static_argnames=("capacity",))
def assign_compact_affine_masked(mcodes: jax.Array, start: jax.Array,
                                 lo: jax.Array, hi: jax.Array,
                                 vpos: jax.Array, ind_codes: jax.Array,
                                 n_ind: jax.Array,
                                 capacity: int) -> jax.Array:
    """Affine assign + packing from the 1-byte/base masked plane (BASEQ
    pre-applied by pack_affine_masked) — half the host->device traffic of
    the codes+quals form and no mask op on device."""
    i = jnp.arange(mcodes.shape[1], dtype=jnp.int32)[None, :]
    aligned = (i >= lo[:, None]) & (i < hi[:, None])
    refpos = jnp.where(aligned, start[:, None] + (i - lo[:, None]),
                       jnp.int32(0))
    vidx, allele = _classify_masked(mcodes, refpos, vpos, ind_codes, n_ind)
    return _pack_hits(vidx, allele, mcodes, capacity)


@functools.partial(jax.jit, static_argnames=("capacity",))
def assign_compact_affine_nibble(ncodes: jax.Array, start: jax.Array,
                                 lo: jax.Array, hi: jax.Array,
                                 vpos: jax.Array, ind_codes: jax.Array,
                                 n_ind: jax.Array,
                                 capacity: int) -> jax.Array:
    """Affine assign + packing from the NIBBLE-packed masked plane — two
    bases per byte (even base in the low nibble), HALF the host->device
    traffic of the 1-byte masked form. Unpack is two VPU ops (mask, shift)
    plus an interleave that XLA fuses into the classification."""
    N, Lh = ncodes.shape
    lo_nib = (ncodes & jnp.uint8(0xF))
    hi_nib = (ncodes >> 4)
    mcodes = jnp.stack([lo_nib, hi_nib], axis=-1).reshape(N, 2 * Lh)
    i = jnp.arange(2 * Lh, dtype=jnp.int32)[None, :]
    aligned = (i >= lo[:, None]) & (i < hi[:, None])
    refpos = jnp.where(aligned, start[:, None] + (i - lo[:, None]),
                       jnp.int32(0))
    vidx, allele = _classify_masked(mcodes, refpos, vpos, ind_codes, n_ind)
    return _pack_hits(vidx, allele, mcodes, capacity)


def pack_affine_nibble(bd, baseq: int, max_len: int = 0,
                       reuse: bool = False):
    """One-pass native nibble-packed masked-plane packing + affine
    classification: (n, L/2) uint8 plane with two masked base nibbles per
    byte. Returns (ncodes, is_affine, start, lo, hi) or None without the
    native library."""
    n = len(bd)
    lens = np.diff(bd.seq_off)
    L = int(max(max_len, lens.max() if n else 1))
    L = ((L + 127) // 128) * 128
    from ..io import native as native_mod
    lib = native_mod.get_lib() if n else None
    if lib is None or not hasattr(lib, "pack_affine_nibble_native"):
        return None
    # Lh is a multiple of 64, not 128: the upload is of the packed host
    # buffer (Lh bytes/read — THE point of this path); any sub-lane padding
    # happens on device after the transfer
    Lh = L // 2
    if reuse:
        ncodes = _reuse_buf("ncodes", n, Lh, np.uint8)
    else:
        ncodes = np.empty((n, Lh), np.uint8)
    is_aff = np.empty(n, np.uint8)
    start = np.empty(n, np.int32)
    lo = np.empty(n, np.int32)
    hi = np.empty(n, np.int32)
    import ctypes
    import os as _os
    ptr = ctypes.c_void_p
    pos = np.ascontiguousarray(bd.pos, np.int32)
    cig = np.ascontiguousarray(bd.cigar_flat, np.uint32)
    coff = np.ascontiguousarray(bd.cigar_off, np.int64)
    seq = np.ascontiguousarray(bd.seq_flat, np.uint8)
    qual = np.ascontiguousarray(bd.qual_flat, np.uint8)
    soff = np.ascontiguousarray(bd.seq_off, np.int64)
    lib.pack_affine_nibble_native(
        n, pos.ctypes.data_as(ptr), cig.ctypes.data_as(ptr),
        coff.ctypes.data_as(ptr), seq.ctypes.data_as(ptr),
        qual.ctypes.data_as(ptr), soff.ctypes.data_as(ptr), baseq, Lh,
        ncodes.ctypes.data_as(ptr), is_aff.ctypes.data_as(ptr),
        start.ctypes.data_as(ptr), lo.ctypes.data_as(ptr),
        hi.ctypes.data_as(ptr), min(_os.cpu_count() or 1, 8))
    return ncodes, is_aff.astype(bool), start, lo, hi


def pack_delta_nibble(bd, baseq: int, max_len: int = 0,
                      reuse: bool = False):
    """int16 DELTA-encoded refpos packing for the non-affine, non-spliced
    remainder (deletion / split-M reads): (n, L/2) masked nibble plane +
    (n, L) int16 delta plane, 2.5 B/base vs the 6 B/base
    codes+quals+refpos form (ROADMAP round-3 item). Returns
    (ncodes, delta, ok, start, rp_min, rp_max) or None without the
    native library; rows with ok=False (affine / N/I/P / delta overflow)
    must be routed to other paths."""
    n = len(bd)
    lens = np.diff(bd.seq_off)
    L = int(max(max_len, lens.max() if n else 1))
    L = ((L + 127) // 128) * 128
    from ..io import native as native_mod
    lib = native_mod.get_lib() if n else None
    if lib is None or not hasattr(lib, "pack_delta_nibble_native"):
        return None
    Lh = L // 2
    if reuse:
        ncodes = _reuse_buf("d_ncodes", n, Lh, np.uint8)
        delta = _reuse_buf("d_delta", n, L, np.int16)
    else:
        ncodes = np.empty((n, Lh), np.uint8)
        delta = np.empty((n, L), np.int16)
    ok = np.empty(n, np.uint8)
    start = np.empty(n, np.int32)
    rp_min = np.empty(n, np.int32)
    rp_max = np.empty(n, np.int32)
    import ctypes
    import os as _os
    ptr = ctypes.c_void_p
    pos = np.ascontiguousarray(bd.pos, np.int32)
    cig = np.ascontiguousarray(bd.cigar_flat, np.uint32)
    coff = np.ascontiguousarray(bd.cigar_off, np.int64)
    seq = np.ascontiguousarray(bd.seq_flat, np.uint8)
    qual = np.ascontiguousarray(bd.qual_flat, np.uint8)
    soff = np.ascontiguousarray(bd.seq_off, np.int64)
    lib.pack_delta_nibble_native(
        n, pos.ctypes.data_as(ptr), cig.ctypes.data_as(ptr),
        coff.ctypes.data_as(ptr), seq.ctypes.data_as(ptr),
        qual.ctypes.data_as(ptr), soff.ctypes.data_as(ptr), baseq, Lh,
        ncodes.ctypes.data_as(ptr), delta.ctypes.data_as(ptr),
        ok.ctypes.data_as(ptr), start.ctypes.data_as(ptr),
        rp_min.ctypes.data_as(ptr), rp_max.ctypes.data_as(ptr),
        min(_os.cpu_count() or 1, 8))
    return ncodes, delta, ok.astype(bool), start, rp_min, rp_max


@functools.partial(jax.jit, static_argnames=("capacity",))
def assign_compact_delta_nibble(ncodes: jax.Array, start: jax.Array,
                                delta: jax.Array, vpos: jax.Array,
                                ind_codes: jax.Array, n_ind: jax.Array,
                                capacity: int) -> jax.Array:
    """Fused assign + hit packing from the DELTA-nibble format: refpos is
    reconstructed on device as start + i + delta[i]; masked (15) nibbles
    carry delta 0 and can never hit, so no separate aligned mask ships."""
    N, Lh = ncodes.shape
    L = 2 * Lh
    lo_nib = (ncodes & jnp.uint8(0xF))
    hi_nib = (ncodes >> 4)
    mcodes = jnp.stack([lo_nib, hi_nib], axis=-1).reshape(N, L)
    i = jnp.arange(L, dtype=jnp.int32)[None, :]
    refpos = jnp.where(mcodes != jnp.uint8(15),
                       start[:, None] + i + delta.astype(jnp.int32),
                       jnp.int32(0))
    vidx, allele = _classify_masked(mcodes, refpos, vpos, ind_codes, n_ind)
    return _pack_hits(vidx, allele, mcodes, capacity)


def plan_windows_minmax(rp_min, rp_max, valid, vpos_host, n_rows: int,
                        block_rows: int = 256):
    """Host-side window planning from per-read [rp_min, rp_max] refpos
    bounds (the delta-nibble path — no refpos plane exists host-side).
    Same contract as plan_windows_affine."""
    R = block_rows
    n_blocks = -(-n_rows // R)
    smin = np.where(valid & (rp_max > 0), rp_min.astype(np.int64),
                    np.iinfo(np.int64).max)
    smax = np.where(valid & (rp_max > 0), rp_max.astype(np.int64), 0)
    pad = n_blocks * R - n_rows
    if pad:
        smin = np.pad(smin, (0, pad),
                      constant_values=np.iinfo(np.int64).max)
        smax = np.pad(smax, (0, pad))
    pmin = smin.reshape(n_blocks, R).min(axis=1)
    pmax = smax.reshape(n_blocks, R).max(axis=1)
    M = len(vpos_host)
    lo_idx = np.searchsorted(vpos_host, pmin, side="left")
    hi_idx = np.searchsorted(vpos_host, pmax, side="right")
    ws = np.minimum(lo_idx & ~np.int64(127), max((M - 1) & ~127, 0))
    if np.any(hi_idx - ws > _WIN):
        return None
    return ws.astype(np.int32)


def _delta_windowed_impl(ncodes: jax.Array, start: jax.Array,
                         delta: jax.Array, ws: jax.Array, vpos: jax.Array,
                         ind_codes: jax.Array, n_ind: jax.Array,
                         capacity: int, algo: str = "gather",
                         interpret: bool = False) -> jax.Array:
    """Windowed-Pallas form of the delta-nibble path: nibble unpack +
    delta refpos reconstruction + windowed classification + hit packing,
    one program. `ws` comes from plan_windows_minmax."""
    N, Lh = ncodes.shape
    L = 2 * Lh
    lo_nib = (ncodes & jnp.uint8(0xF))
    hi_nib = (ncodes >> 4)
    mcodes = jnp.stack([lo_nib, hi_nib], axis=-1).reshape(N, L).astype(
        jnp.int32)
    i = jnp.arange(L, dtype=jnp.int32)[None, :]
    refpos = jnp.where(mcodes != 15,
                       start[:, None] + i + delta.astype(jnp.int32),
                       jnp.int32(0))
    R = min(256, N)
    vidx, allele = _pallas_windowed_call(
        mcodes, mcodes, refpos, ws, vpos, ind_codes, n_ind, baseq=0,
        block_rows=R, algo=algo, interpret=interpret)
    return _pack_hits(vidx, allele, mcodes, capacity)


assign_compact_delta_nibble_windowed = jax.jit(
    _delta_windowed_impl,
    static_argnames=("capacity", "algo", "interpret"))


def pack_affine_masked(bd, baseq: int, max_len: int = 0,
                       reuse: bool = False):
    """One-pass native masked-plane packing + affine classification.
    Returns (mcodes, is_affine, start, lo, hi) or None without the
    native library."""
    n = len(bd)
    lens = np.diff(bd.seq_off)
    L = int(max(max_len, lens.max() if n else 1))
    L = ((L + 127) // 128) * 128
    from ..io import native as native_mod
    lib = native_mod.get_lib() if n else None
    if lib is None or not hasattr(lib, "pack_affine_masked_native"):
        return None
    if reuse:
        mcodes = _reuse_buf("mcodes", n, L, np.uint8)
    else:
        mcodes = np.empty((n, L), np.uint8)
    is_aff = np.empty(n, np.uint8)
    start = np.empty(n, np.int32)
    lo = np.empty(n, np.int32)
    hi = np.empty(n, np.int32)
    import ctypes
    import os as _os
    ptr = ctypes.c_void_p
    pos = np.ascontiguousarray(bd.pos, np.int32)
    cig = np.ascontiguousarray(bd.cigar_flat, np.uint32)
    coff = np.ascontiguousarray(bd.cigar_off, np.int64)
    seq = np.ascontiguousarray(bd.seq_flat, np.uint8)
    qual = np.ascontiguousarray(bd.qual_flat, np.uint8)
    soff = np.ascontiguousarray(bd.seq_off, np.int64)
    lib.pack_affine_masked_native(
        n, pos.ctypes.data_as(ptr), cig.ctypes.data_as(ptr),
        coff.ctypes.data_as(ptr), seq.ctypes.data_as(ptr),
        qual.ctypes.data_as(ptr), soff.ctypes.data_as(ptr), baseq, L,
        mcodes.ctypes.data_as(ptr), is_aff.ctypes.data_as(ptr),
        start.ctypes.data_as(ptr), lo.ctypes.data_as(ptr),
        hi.ctypes.data_as(ptr), min(_os.cpu_count() or 1, 8))
    return mcodes, is_aff.astype(bool), start, lo, hi


def decode_packed_hits(full: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                                  np.ndarray, np.ndarray, int]:
    """Decode an already-fetched packed-hit buffer (see _pack_hits layout).
    Returns (read_idx, var_idx, allele_class, base_code, n_hits); n_hits may
    exceed the capacity (overflow — caller falls back)."""
    cap = int(full.shape[1]) - 1
    full = full.astype(np.int64)
    nh = int(full[0, 0])
    if nh > cap:
        return (np.zeros(0, np.int64),) * 2 + \
            (np.zeros(0, np.int16),) * 2 + (nh,)
    body = full[:, 1:1 + nh]
    r = body[0]
    v = body[1] >> 8
    a = (body[1] & 0xF).astype(np.int16)
    mc = ((body[1] >> 4) & 0xF).astype(np.int16)
    return r, v, a, mc, nh


def fetch_packed_hits(packed) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                       np.ndarray, int]:
    """Host fetch of a packed-hit buffer as ONE whole-array transfer.

    Through the axon tunnel raw transfers pay a per-fetch fixed cost plus
    low bandwidth, so batch many chunks with mapper.dispatch.resolve_all
    (one concatenated transfer) where possible."""
    return decode_packed_hits(np.asarray(packed))


def _next_pow2_i(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def pack_codes_quals(bd, max_len: int = 0,
                     reuse: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """codes/quals planes only (no refpos) — the host half of the AFFINE
    device path, where refpos is reconstructed on device from per-read
    (start, lo, hi). Cuts host write traffic from 6 to 2 bytes/element."""
    n = len(bd)
    lens = np.diff(bd.seq_off)
    L = int(max(max_len, lens.max() if n else 1))
    L = ((L + 127) // 128) * 128
    from ..io import native as native_mod
    lib = native_mod.get_lib() if n else None
    if lib is not None and hasattr(lib, "pack_codes_quals_native"):
        if reuse:
            codes = _reuse_buf("codes", n, L, np.uint8)
            quals = _reuse_buf("quals", n, L, np.uint8)
        else:
            codes = np.empty((n, L), np.uint8)
            quals = np.empty((n, L), np.uint8)
        import ctypes
        import os as _os
        ptr = ctypes.c_void_p
        seq = np.ascontiguousarray(bd.seq_flat, np.uint8)
        qual = np.ascontiguousarray(bd.qual_flat, np.uint8)
        soff = np.ascontiguousarray(bd.seq_off, np.int64)
        lib.pack_codes_quals_native(
            n, seq.ctypes.data_as(ptr), qual.ctypes.data_as(ptr),
            soff.ctypes.data_as(ptr), L, codes.ctypes.data_as(ptr),
            quals.ctypes.data_as(ptr), min(_os.cpu_count() or 1, 8))
        return codes, quals
    c, q, _ = pack_reads(bd, max_len=max_len, native=False)
    return c, q


def pack_affine(bd, max_len: int = 0, reuse: bool = False):
    """One-pass native packing of codes/quals planes PLUS per-read affine
    CIGAR classification (is_affine, start, lo, hi). Returns None when the
    native library is unavailable (caller composes pack_codes_quals with
    the numpy classifier instead)."""
    n = len(bd)
    lens = np.diff(bd.seq_off)
    L = int(max(max_len, lens.max() if n else 1))
    L = ((L + 127) // 128) * 128
    from ..io import native as native_mod
    lib = native_mod.get_lib() if n else None
    if lib is None or not hasattr(lib, "pack_affine_native"):
        return None
    if reuse:
        codes = _reuse_buf("codes", n, L, np.uint8)
        quals = _reuse_buf("quals", n, L, np.uint8)
    else:
        codes = np.empty((n, L), np.uint8)
        quals = np.empty((n, L), np.uint8)
    is_aff = np.empty(n, np.uint8)
    start = np.empty(n, np.int32)
    lo = np.empty(n, np.int32)
    hi = np.empty(n, np.int32)
    import ctypes
    import os as _os
    ptr = ctypes.c_void_p
    pos = np.ascontiguousarray(bd.pos, np.int32)
    cig = np.ascontiguousarray(bd.cigar_flat, np.uint32)
    coff = np.ascontiguousarray(bd.cigar_off, np.int64)
    seq = np.ascontiguousarray(bd.seq_flat, np.uint8)
    qual = np.ascontiguousarray(bd.qual_flat, np.uint8)
    soff = np.ascontiguousarray(bd.seq_off, np.int64)
    lib.pack_affine_native(
        n, pos.ctypes.data_as(ptr), cig.ctypes.data_as(ptr),
        coff.ctypes.data_as(ptr), seq.ctypes.data_as(ptr),
        qual.ctypes.data_as(ptr), soff.ctypes.data_as(ptr), L,
        codes.ctypes.data_as(ptr), quals.ctypes.data_as(ptr),
        is_aff.ctypes.data_as(ptr), start.ctypes.data_as(ptr),
        lo.ctypes.data_as(ptr), hi.ctypes.data_as(ptr),
        min(_os.cpu_count() or 1, 8))
    return codes, quals, is_aff.astype(bool), start, lo, hi


@functools.partial(jax.jit, static_argnames=("baseq",))
def assign_alleles_affine_device(codes: jax.Array, quals: jax.Array,
                                 start: jax.Array, lo: jax.Array,
                                 hi: jax.Array, vpos: jax.Array,
                                 ind_codes: jax.Array, n_ind: jax.Array,
                                 baseq: int) -> Tuple[jax.Array, jax.Array]:
    """assign_alleles_device for affine reads (one M/=/X run, clips only):
    refpos[i] = start + (i - lo) for lo <= i < hi, else 0 — materialized in
    HBM on device instead of being written + shipped from the host."""
    i = jnp.arange(codes.shape[1], dtype=jnp.int32)[None, :]
    aligned = (i >= lo[:, None]) & (i < hi[:, None])
    refpos = jnp.where(aligned, start[:, None] + (i - lo[:, None]),
                       jnp.int32(0))
    return assign_alleles_device(codes, quals, refpos, vpos, ind_codes,
                                 n_ind, baseq)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _alleles_pallas_kernel(vpos_ref, a0_ref, a1_ref, ni_ref,
                           codes_ref, quals_ref, refpos_ref,
                           vidx_out, allele_out, *, baseq: int, m_pow2: int):
    codes = codes_ref[...]
    quals = quals_ref[...]
    refpos = refpos_ref[...]
    masked = jnp.where(quals >= baseq, codes, jnp.int32(15))

    # branchless binary search over the padded (power-of-two) variant table,
    # statically unrolled (Mosaic rejects vector-carry scans); table lookups
    # as 2D take_along_axis with the table row-broadcast in VMEM
    M = vpos_ref.shape[-1]
    R = refpos.shape[0]
    lo = jnp.zeros(refpos.shape, jnp.int32)
    vpb = jnp.broadcast_to(vpos_ref[...], (R, M))

    def lut(table_ref, idx):
        tb = jnp.broadcast_to(table_ref[...], (R, M))
        return jnp.take_along_axis(tb, idx, axis=1)

    step = m_pow2
    n_steps = int(np.log2(m_pow2)) if m_pow2 > 1 else 0
    for _ in range(n_steps):
        step = step // 2
        mid = lo + step
        midv = jnp.take_along_axis(vpb, jnp.minimum(mid, M - 1), axis=1)
        go = midv < refpos
        lo = jnp.where(go, mid, lo)
    # lo = index of last element < refpos (or 0); candidate is lo or lo+1
    lov = jnp.take_along_axis(vpb, jnp.minimum(lo, M - 1), axis=1)
    cand = jnp.minimum(jnp.where(lov >= refpos, lo, lo + 1), M - 1)
    cv = jnp.take_along_axis(vpb, cand, axis=1)
    hit = (refpos > 0) & (cv == refpos) & (masked != 15)
    a0 = lut(a0_ref, cand)
    a1 = lut(a1_ref, cand)
    ni = lut(ni_ref, cand)
    allele = jnp.where((masked == a0) & (ni > 0), 0,
                       jnp.where((masked == a1) & (ni > 1), 1, OTHER))
    allele = jnp.where(hit, allele, NO_HIT)
    vidx_out[...] = jnp.where(hit, cand, -1).astype(jnp.int32)
    allele_out[...] = allele.astype(jnp.int32)


_WIN = 256  # table window entries per read block (two 128-lane vregs)


def _alleles_pallas_windowed_kernel(ws_ref, vpos_hbm, a0_hbm, a1_hbm,
                                    ni_hbm, codes_ref, quals_ref, refpos_ref,
                                    vidx_out, allele_out,
                                    vwin, a0w, a1w, niw, sems,
                                    *, baseq: int):
    """Windowed-table body: the 256-entry slice of the variant table that
    this read block can touch is DMA'd HBM->VMEM at a per-block offset taken
    from the scalar-prefetch array, then binary-searched entirely in VMEM.

    Mosaic's lane gather (dynamic_gather) only spans ONE 128-lane vreg, so
    the 256-entry window is addressed through a two-half select-gather and
    the read plane is processed in 128-column slabs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    w0 = pl.multiple_of(ws_ref[b], 128)  # wrapper 128-aligns the offsets
    dmas = []
    for k, (src, dst) in enumerate(((vpos_hbm, vwin), (a0_hbm, a0w),
                                    (a1_hbm, a1w), (ni_hbm, niw))):
        # window halves land in separate SUBLANE rows of a (2, 128) scratch:
        # Mosaic mis-lowers lane-offset VMEM slices ([0:1, 128:256]) under
        # the gather that follows, sublane slices ([1:2, :]) are exact
        for h in range(2):
            d = pltpu.make_async_copy(
                src.at[0, pl.ds(w0 + h * 128, 128)], dst.at[h, :],
                sems.at[2 * k + h])
            d.start()
            dmas.append(d)
    for d in dmas:
        d.wait()

    R = refpos_ref.shape[0]
    L = refpos_ref.shape[1]
    halves = {}

    def lookup(table_ref, idx):
        """Gather table_ref.flat[idx] for idx (R, 128) in [0, 256).

        Gathers BOTH halves and selects the results afterwards: gathering
        from a where-combined operand (`take_along_axis(where(sel, bhi,
        blo), i2)`) silently miscompiles on real TPUs (hardware-verified;
        each primitive alone is fine), while gather-then-select is exact."""
        key = id(table_ref)
        if key not in halves:
            halves[key] = (
                jnp.broadcast_to(table_ref[0:1, :], (R, 128)),
                jnp.broadcast_to(table_ref[1:2, :], (R, 128)))
        blo, bhi = halves[key]
        sel = idx >= 128
        vlo = jnp.take_along_axis(blo, jnp.minimum(idx, 127), axis=1)
        vhi = jnp.take_along_axis(bhi, jnp.clip(idx - 128, 0, 127), axis=1)
        return jnp.where(sel, vhi, vlo)

    for s in range(L // 128):
        sl = slice(s * 128, (s + 1) * 128)
        codes = codes_ref[:, sl]
        quals = quals_ref[:, sl]
        refpos = refpos_ref[:, sl]
        masked = jnp.where(quals >= baseq, codes, jnp.int32(15))

        # binary search over the 256-entry window: lo = last idx with
        # value < refpos (or 0), candidate = lo or lo+1
        lo = jnp.zeros((R, 128), jnp.int32)
        step = _WIN
        for _ in range(8):  # log2(256)
            step = step // 2
            mid = lo + step
            midv = lookup(vwin, jnp.minimum(mid, _WIN - 1))
            lo = jnp.where(midv < refpos, mid, lo)
        lov = lookup(vwin, lo)
        cand = jnp.minimum(jnp.where(lov >= refpos, lo, lo + 1), _WIN - 1)
        cv = lookup(vwin, cand)
        hit = (refpos > 0) & (cv == refpos) & (masked != 15)
        a0 = lookup(a0w, cand)
        a1 = lookup(a1w, cand)
        ni = lookup(niw, cand)
        allele = jnp.where((masked == a0) & (ni > 0), 0,
                           jnp.where((masked == a1) & (ni > 1), 1, OTHER))
        allele = jnp.where(hit, allele, NO_HIT)
        vidx_out[:, sl] = jnp.where(hit, w0 + cand, -1).astype(jnp.int32)
        allele_out[:, sl] = allele.astype(jnp.int32)


def _alleles_pallas_cmp_kernel(ws_ref, vpos_hbm, a0_hbm, a1_hbm,
                               ni_hbm, codes_ref, quals_ref, refpos_ref,
                               vidx_out, allele_out,
                               vwin, a0w, a1w, niw, sems,
                               *, baseq: int):
    """Gather-FREE windowed body: instead of binary-searching the window,
    compare every one of its 256 entries against the slab and accumulate
    matches with selects.  All broadcast-compare VPU work — no
    dynamic_gather (which Mosaic lowers serially and occasionally
    miscompiles), and statically unrolled so every table access is a
    constant-index scalar load."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    w0 = pl.multiple_of(ws_ref[b], 128)
    dmas = []
    for k, (src, dst) in enumerate(((vpos_hbm, vwin), (a0_hbm, a0w),
                                    (a1_hbm, a1w), (ni_hbm, niw))):
        for h in range(2):
            d = pltpu.make_async_copy(
                src.at[0, pl.ds(w0 + h * 128, 128)], dst.at[h, :],
                sems.at[2 * k + h])
            d.start()
            dmas.append(d)
    for d in dmas:
        d.wait()

    R = refpos_ref.shape[0]
    L = refpos_ref.shape[1]
    for s in range(L // 128):
        sl = slice(s * 128, (s + 1) * 128)
        codes = codes_ref[:, sl]
        quals = quals_ref[:, sl]
        refpos = refpos_ref[:, sl]
        masked = jnp.where(quals >= baseq, codes, jnp.int32(15))

        vidx = jnp.full((R, 128), -1, jnp.int32)
        a0m = jnp.zeros((R, 128), jnp.int32)
        a1m = jnp.zeros((R, 128), jnp.int32)
        nim = jnp.zeros((R, 128), jnp.int32)
        for k in range(_WIN):
            vk = vwin[k // 128, k % 128]
            eq = refpos == vk
            vidx = jnp.where(eq, w0 + k, vidx)
            a0m = jnp.where(eq, a0w[k // 128, k % 128], a0m)
            a1m = jnp.where(eq, a1w[k // 128, k % 128], a1m)
            nim = jnp.where(eq, niw[k // 128, k % 128], nim)
        hit = (refpos > 0) & (vidx >= 0) & (masked != 15)
        allele = jnp.where((masked == a0m) & (nim > 0), 0,
                           jnp.where((masked == a1m) & (nim > 1), 1, OTHER))
        allele = jnp.where(hit, allele, NO_HIT)
        vidx_out[:, sl] = jnp.where(hit, vidx, -1).astype(jnp.int32)
        allele_out[:, sl] = allele.astype(jnp.int32)


def assign_alleles_pallas_windowed(codes, quals, refpos, vpos, ind_codes,
                                   n_ind, baseq: int, block_rows: int = 256,
                                   interpret: bool = False,
                                   refpos_host=None, vpos_host=None,
                                   algo: str = "gather"):
    """Whole-contig-table Pallas kernel: scalar-prefetch windowed table.

    Reads are coordinate-sorted, so each block of `block_rows` reads touches
    only a narrow band of the (sorted) variant table.  The wrapper computes
    a per-block 128-aligned window offset host-side; the kernel DMAs the
    W-wide table window into VMEM and binary-searches it there — log2(W)
    VMEM gathers instead of log2(M) HBM gathers, independent of contig-table
    width M.  Falls back to the XLA kernel when any block's variant band
    exceeds the window (sparse coverage spanning >W variants per block —
    checked exactly, host-side).

    Same outputs as assign_alleles_device; `interpret` runs the Mosaic
    interpreter for CPU-backed tests.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, L = codes.shape
    M = int(vpos.shape[0])
    if N == 0 or M == 0 or L % 128 != 0:
        return assign_alleles_device(codes, quals, refpos, vpos, ind_codes,
                                     n_ind, baseq)
    W = _WIN
    R = min(block_rows, max(N, 1))

    # host-side window planning (numpy; pass refpos_host/vpos_host to avoid
    # a device->host fetch when the planes were already uploaded)
    rp = np.asarray(refpos) if refpos_host is None else refpos_host
    vp = np.asarray(vpos) if vpos_host is None else vpos_host
    n_blocks = -(-N // R)
    pad_rows = n_blocks * R - N
    rp_b = rp.reshape(-1) if pad_rows == 0 else np.pad(
        rp, ((0, pad_rows), (0, 0))).reshape(-1)
    rp_b = rp_b.reshape(n_blocks, R * L)
    rp_pos = np.where(rp_b > 0, rp_b, np.iinfo(np.int32).max)
    pmin = rp_pos.min(axis=1)
    pmax = rp_b.max(axis=1)
    lo_idx = np.searchsorted(vp, pmin, side="left")
    hi_idx = np.searchsorted(vp, pmax, side="right")
    # clamp to an ALIGNED maximum: the kernel promises Mosaic the DMA
    # offset is a multiple of 128 (empty blocks land at lo_idx == M)
    ws = np.minimum(lo_idx & ~np.int64(127), max((M - 1) & ~127, 0))
    if np.any(hi_idx - ws > W):
        # a block spans more than W table entries: XLA path handles it
        return assign_alleles_device(codes, quals, refpos, vpos, ind_codes,
                                     n_ind, baseq)
    ws = ws.astype(np.int32)

    def pad_plane(x, fill):
        x = x.astype(jnp.int32)
        if pad_rows:
            x = jnp.pad(x, ((0, pad_rows), (0, 0)), constant_values=fill)
        return x

    vidx, allele = _pallas_windowed_call(
        pad_plane(codes, 15), pad_plane(quals, 0), pad_plane(refpos, 0),
        jnp.asarray(ws), vpos, ind_codes, n_ind, baseq=baseq, block_rows=R,
        algo=algo, interpret=interpret)
    return vidx[:N], allele[:N]


def _pallas_windowed_call(codes_p, quals_p, refpos_p, ws, vpos, ind_codes,
                          n_ind, *, baseq: int, block_rows: int,
                          algo: str, interpret: bool):
    """jit-composable core of the windowed kernel: all-jnp table padding +
    the pallas_call.  codes_p/quals_p/refpos_p are (NB, L) int32; rows are
    padded here to a multiple of block_rows (refpos pads to 0, so padded
    rows can never produce hits) and the outputs sliced back, so callers
    may pass arbitrary row counts; ws is the (ceil(NB/block_rows),) int32
    128-aligned window-offset array (host-planned — plan_windows_affine /
    plan_windows_plane already use the ceil block count)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB, L = codes_p.shape
    M = int(vpos.shape[0])
    R = block_rows
    n_blocks = -(-NB // R)
    if ws.shape[0] != n_blocks:
        raise ValueError("window-offset array has %d entries for %d blocks"
                         % (ws.shape[0], n_blocks))
    pad_rows = n_blocks * R - NB
    if pad_rows:
        codes_p = jnp.pad(codes_p, ((0, pad_rows), (0, 0)),
                          constant_values=15)
        quals_p = jnp.pad(quals_p, ((0, pad_rows), (0, 0)))
        refpos_p = jnp.pad(refpos_p, ((0, pad_rows), (0, 0)))
    W = _WIN
    # pad table so every window [ws, ws+W) is in range
    Mp = ((M + 127) // 128) * 128 + W
    sent = np.iinfo(np.int32).max
    vpos_p = jnp.concatenate([vpos.astype(jnp.int32),
                              jnp.full(Mp - M, sent, jnp.int32)])[None, :]
    a0_p = jnp.concatenate([ind_codes[:, 0].astype(jnp.int32),
                            jnp.zeros(Mp - M, jnp.int32)])[None, :]
    a1_p = jnp.concatenate([ind_codes[:, 1].astype(jnp.int32),
                            jnp.zeros(Mp - M, jnp.int32)])[None, :]
    ni_p = jnp.concatenate([n_ind.astype(jnp.int32),
                            jnp.zeros(Mp - M, jnp.int32)])[None, :]

    body = (_alleles_pallas_cmp_kernel if algo == "cmp"
            else _alleles_pallas_windowed_kernel)
    kernel = functools.partial(body, baseq=baseq)
    NBp = n_blocks * R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4 +
                 [pl.BlockSpec((R, L), lambda i, w: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec((R, L), lambda i, w: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((R, L), lambda i, w: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2, W // 2), jnp.int32)] * 4 +
                       [pltpu.SemaphoreType.DMA((8,))],
    )
    vidx, allele = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((NBp, L), jnp.int32),
                   jax.ShapeDtypeStruct((NBp, L), jnp.int32)),
        interpret=interpret,
    )(ws, vpos_p, a0_p, a1_p, ni_p, codes_p, quals_p, refpos_p)
    return vidx[:NB], allele[:NB]


def plan_windows_affine(start, lo, hi, aff, vpos_host, n_rows: int,
                        block_rows: int = 256):
    """Host-side window planning for AFFINE reads straight from the per-read
    (start, lo, hi) ints — no refpos plane needed.  Rows with aff=False (or
    empty alignments) are ignored.  Returns the (n_blocks,) int32
    128-aligned window-offset array, or None when any block's variant band
    exceeds the 256-entry window (caller falls back to the XLA kernel)."""
    R = block_rows
    n_blocks = -(-n_rows // R)
    span = np.where(aff, hi.astype(np.int64) - lo, 0)
    smin = np.where(aff & (span > 0), start.astype(np.int64),
                    np.iinfo(np.int64).max)
    smax = np.where(aff & (span > 0), start.astype(np.int64) + span - 1, 0)
    pad = n_blocks * R - n_rows
    if pad:
        smin = np.pad(smin, (0, pad),
                      constant_values=np.iinfo(np.int64).max)
        smax = np.pad(smax, (0, pad))
    pmin = smin.reshape(n_blocks, R).min(axis=1)
    pmax = smax.reshape(n_blocks, R).max(axis=1)
    M = len(vpos_host)
    lo_idx = np.searchsorted(vpos_host, pmin, side="left")
    hi_idx = np.searchsorted(vpos_host, pmax, side="right")
    # aligned clamp: see assign_alleles_pallas_windowed planning
    ws = np.minimum(lo_idx & ~np.int64(127), max((M - 1) & ~127, 0))
    if np.any(hi_idx - ws > _WIN):
        return None
    return ws.astype(np.int32)


def _nibble_windowed_impl(ncodes: jax.Array, start: jax.Array,
                          lo: jax.Array, hi: jax.Array,
                          ws: jax.Array, vpos: jax.Array,
                          ind_codes: jax.Array,
                          n_ind: jax.Array, capacity: int,
                          algo: str = "gather",
                          interpret: bool = False) -> jax.Array:
    """Production fused affine path on the WINDOWED Pallas classifier:
    nibble unpack + device refpos reconstruction + windowed-table Pallas
    classification + hit packing, one program.  Slope-measured ~5.7x the
    true execution speed of the XLA searchsorted kernel at whole-contig
    table widths on v5e (the `cmp` algo measured 6x SLOWER than `gather` —
    kept as the recorded negative result; see ARCHITECTURE.md).  `ws`
    comes from plan_windows_affine.  Call the jitted
    assign_compact_affine_nibble_windowed in production; this impl is
    directly callable for interpreter-mode tests (the Mosaic interpreter
    embedded inside jit is orders slower than eager)."""
    N, Lh = ncodes.shape
    L = 2 * Lh
    lo_nib = (ncodes & jnp.uint8(0xF))
    hi_nib = (ncodes >> 4)
    mcodes = jnp.stack([lo_nib, hi_nib], axis=-1).reshape(N, L).astype(
        jnp.int32)
    i = jnp.arange(L, dtype=jnp.int32)[None, :]
    aligned = (i >= lo[:, None]) & (i < hi[:, None])
    refpos = jnp.where(aligned, start[:, None] + (i - lo[:, None]),
                       jnp.int32(0))
    R = min(256, N)
    # baseq=0 with quals=mcodes leaves masked == mcodes (pre-masked plane)
    vidx, allele = _pallas_windowed_call(
        mcodes, mcodes, refpos, ws, vpos, ind_codes, n_ind, baseq=0,
        block_rows=R, algo=algo, interpret=interpret)
    return _pack_hits(vidx, allele, mcodes, capacity)


assign_compact_affine_nibble_windowed = jax.jit(
    _nibble_windowed_impl,
    static_argnames=("capacity", "algo", "interpret"))


def plan_windows_plane(refpos_host: np.ndarray, vpos_host: np.ndarray,
                       block_rows: int = 256):
    """Host-side window planning from an (N, L) refpos plane (the
    D/N/split-M read path — positions are already expanded host-side).
    Same contract as plan_windows_affine."""
    N, L = refpos_host.shape
    R = block_rows
    n_blocks = -(-N // R)
    pad = n_blocks * R - N
    rp = refpos_host if pad == 0 else np.pad(refpos_host, ((0, pad), (0, 0)))
    rp = rp.reshape(n_blocks, R * L)
    rp_pos = np.where(rp > 0, rp, np.iinfo(np.int32).max)
    pmin = rp_pos.min(axis=1)
    pmax = rp.max(axis=1)
    M = len(vpos_host)
    lo_idx = np.searchsorted(vpos_host, pmin, side="left")
    hi_idx = np.searchsorted(vpos_host, pmax, side="right")
    ws = np.minimum(lo_idx & ~np.int64(127), max((M - 1) & ~127, 0))
    if np.any(hi_idx - ws > _WIN):
        return None
    return ws.astype(np.int32)


def _plane_windowed_impl(codes: jax.Array, quals: jax.Array,
                         refpos: jax.Array, ws: jax.Array, vpos: jax.Array,
                         ind_codes: jax.Array, n_ind: jax.Array,
                         baseq: int, capacity: int,
                         algo: str = "gather",
                         interpret: bool = False) -> jax.Array:
    """Windowed-Pallas form of assign_compact_plane (the refpos-plane path
    for D/N/split-M reads): classification + hit packing, one program.
    `ws` comes from plan_windows_plane."""
    N, L = codes.shape
    c32 = codes.astype(jnp.int32)
    q32 = quals.astype(jnp.int32)
    vidx, allele = _pallas_windowed_call(
        c32, q32, refpos.astype(jnp.int32), ws, vpos, ind_codes, n_ind,
        baseq=baseq, block_rows=min(256, N), algo=algo, interpret=interpret)
    masked = jnp.where(q32 >= baseq, c32, jnp.int32(15))
    return _pack_hits(vidx, allele, masked, capacity)


assign_compact_plane_windowed = jax.jit(
    _plane_windowed_impl,
    static_argnames=("baseq", "capacity", "algo", "interpret"))


def assign_alleles_pallas(codes, quals, refpos, vpos, ind_codes, n_ind,
                          baseq: int, block_rows: int = 256):
    """Pallas TPU version of assign_alleles_device (same outputs).

    Mosaic's vector gather requires index shape == operand shape, so the
    VMEM-resident table is padded to the read length L; tables wider than L
    (whole-contig tables) are handled by assign_alleles_pallas_windowed,
    which slides a VMEM window over the table per read block.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, L = codes.shape
    M = int(vpos.shape[0])
    m_pow2 = 1
    while m_pow2 < M:
        m_pow2 *= 2
    if m_pow2 > L:
        return assign_alleles_pallas_windowed(codes, quals, refpos, vpos,
                                              ind_codes, n_ind, baseq,
                                              block_rows=block_rows)
    m_pow2 = L  # pad table width to L for shape-matched gathers
    # pad variant table to pow2 with sentinel
    pad = m_pow2 - M if m_pow2 > M else 0
    vpos_p = jnp.concatenate([vpos.astype(jnp.int32),
                              jnp.full(pad, np.iinfo(np.int32).max, jnp.int32)])
    a0 = jnp.concatenate([ind_codes[:, 0].astype(jnp.int32),
                          jnp.zeros(pad, jnp.int32)])[None, :]
    a1 = jnp.concatenate([ind_codes[:, 1].astype(jnp.int32),
                          jnp.zeros(pad, jnp.int32)])[None, :]
    ni = jnp.concatenate([n_ind.astype(jnp.int32),
                          jnp.zeros(pad, jnp.int32)])[None, :]
    vpos_p = vpos_p[None, :]
    Mp = m_pow2

    rows = min(block_rows, N) if N else 1
    grid = (max(1, -(-N // rows)),)
    kernel = functools.partial(_alleles_pallas_kernel, baseq=baseq,
                               m_pow2=Mp)
    out_shape = (jax.ShapeDtypeStruct((N, L), jnp.int32),
                 jax.ShapeDtypeStruct((N, L), jnp.int32))
    vspec = pl.BlockSpec((1, Mp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    rspec = lambda dt: pl.BlockSpec((rows, L), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vspec, vspec, vspec, vspec,
                  rspec(None), rspec(None), rspec(None)],
        out_specs=(pl.BlockSpec((rows, L), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rows, L), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shape,
    )(vpos_p, a0, a1, ni,
      codes.astype(jnp.int32), quals.astype(jnp.int32), refpos)
