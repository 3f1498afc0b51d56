"""Device pair-configuration counting.

Turns deduplicated (read, variant, allele) hits into per-variant-pair 3x3
configuration count tensors — the device equivalent of the reference's
read-set intersections (/root/reference/phaser/phaser.py:1602-1632) and of
engine.connections's scatter-add path.

Strategy (all static shapes):
  1. hits sorted by read (host provides); per-read spans bucketed to a max
     hit count K; reads with k>K hits fall back to the host path.
  2. emit the K*(K-1)/2 intra-read hit pairs per read with validity masks
  3. encode pair key (vi*M + vj)*9 + ai*3 + aj, sort, segment-count by
     run-length on the sorted keys (sort + shifted-compare + cumsum).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("K",))
def emit_pairs(var_mat: jax.Array, allele_mat: jax.Array, K: int
               ) -> Tuple[jax.Array, jax.Array]:
    """var_mat/allele_mat: (R, K) with -1 padding. Returns flat
    (pair_lo, pair_hi, a_lo, a_hi) arrays of length R*K*(K-1)/2 with -1 pads."""
    ii, jj = np.triu_indices(K, 1)
    ii = jnp.asarray(ii)
    jj = jnp.asarray(jj)
    v1 = var_mat[:, ii]
    v2 = var_mat[:, jj]
    a1 = allele_mat[:, ii]
    a2 = allele_mat[:, jj]
    valid = (v1 >= 0) & (v2 >= 0) & (v1 != v2)
    swap = v1 > v2
    lo = jnp.where(swap, v2, v1)
    hi = jnp.where(swap, v1, v2)
    al = jnp.where(swap, a2, a1)
    ah = jnp.where(swap, a1, a2)
    lo = jnp.where(valid, lo, -1)
    return (lo.reshape(-1), hi.reshape(-1), al.reshape(-1), ah.reshape(-1))


def count_pair_configs(pair_lo, pair_hi, a_lo, a_hi, n_vars: int,
                       max_pairs: int):
    """64-bit-key wrapper (key = ((vi*M+vj)*9+cfg) exceeds int32)."""
    with jax.enable_x64(True):
        return _count_pair_configs(
            jnp.asarray(pair_lo, jnp.int64), jnp.asarray(pair_hi, jnp.int64),
            jnp.asarray(a_lo, jnp.int64), jnp.asarray(a_hi, jnp.int64),
            n_vars, max_pairs)


@functools.partial(jax.jit, static_argnames=("n_vars", "max_pairs"))
def _count_pair_configs(pair_lo: jax.Array, pair_hi: jax.Array,
                        a_lo: jax.Array, a_hi: jax.Array, n_vars: int,
                        max_pairs: int):
    """Aggregate emitted pairs into unique-pair 3x3 count tensors.

    Returns (pair_keys (max_pairs,), counts (max_pairs, 9), n_unique).
    pair_keys encode vi * n_vars + vj; -1 pads.
    """
    SENT = jnp.int64((1 << 59) * 9)  # divisible by 9, < int64 max
    valid = pair_lo >= 0
    key = jnp.where(valid,
                    (pair_lo.astype(jnp.int64) * n_vars + pair_hi) * 9
                    + a_lo * 3 + a_hi,
                    SENT)
    skey = jnp.sort(key)
    # run lengths of identical full keys
    new_run = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    run_id = jnp.cumsum(new_run) - 1
    n_total = skey.shape[0]
    run_count = jnp.zeros(n_total, jnp.int32).at[run_id].add(1)
    run_key = jnp.full(n_total, SENT, jnp.int64).at[run_id].min(skey)
    run_valid = run_key < SENT
    # now reduce runs to unique (vi, vj) pairs
    pkey = run_key // 9
    cfg = (run_key % 9).astype(jnp.int32)
    new_pair = (jnp.concatenate([jnp.array([True]), pkey[1:] != pkey[:-1]])
                & run_valid)
    pair_id = jnp.cumsum(new_pair) - 1
    pair_id = jnp.where(run_valid, pair_id, max_pairs)
    counts = jnp.zeros((max_pairs + 1, 9), jnp.int32)
    counts = counts.at[pair_id, cfg].add(run_count, mode="drop")
    keys_out = jnp.full(max_pairs + 1, -1, jnp.int64)
    keys_out = keys_out.at[pair_id].set(pkey, mode="drop")
    n_unique = jnp.sum(new_pair)
    return keys_out[:max_pairs], counts[:max_pairs], n_unique


def pack_read_hits(uid: np.ndarray, var: np.ndarray, allele: np.ndarray,
                   K: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side: group hits by read into (R, K) matrices (-1 pad).
    Returns (var_mat, allele_mat, overflow_uids) — reads with >K hits are
    returned for the host fallback."""
    order = np.argsort(uid, kind="stable")
    u, v, a = uid[order], var[order], allele[order]
    if len(u) == 0:
        return (np.full((0, K), -1, np.int64), np.full((0, K), -1, np.int64),
                np.zeros(0, np.int64))
    starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
    counts = np.diff(np.concatenate((starts, [len(u)])))
    ok = counts <= K
    R = int(ok.sum())
    # scatter all kept hits at once: row = rank of the hit's group among
    # kept groups, col = offset within the group
    grp = np.cumsum(np.concatenate(([0], (u[1:] != u[:-1]).astype(np.int64))))
    within = np.arange(len(u), dtype=np.int64) - starts[grp]
    kept_rank = np.cumsum(ok) - 1
    sel = ok[grp]
    var_mat = np.full((R, K), -1, np.int64)
    allele_mat = np.full((R, K), -1, np.int64)
    var_mat[kept_rank[grp[sel]], within[sel]] = v[sel]
    allele_mat[kept_rank[grp[sel]], within[sel]] = a[sel]
    overflow = u[starts[~ok]]
    return var_mat, allele_mat, np.asarray(overflow, np.int64)
