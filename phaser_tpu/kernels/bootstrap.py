"""Device bootstrap kernel for phASER-POP cis-var.

The reference draws 4 x 10,000 resamples per (gene, variant) pair serially
with numpy (/root/reference/phaser_pop/phaser_cis_var.py:202-219).  Here all
pairs with the same cohort size run as one batched draw-gather-median on
device: indices (B, bs, n) via threefry, jnp.median over the gathered values,
then percentile bounds — thousands of pairs per dispatch.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("bs",))
def batched_bootstrap_median(x: jax.Array, key: jax.Array, bs: int):
    """x: (B, n) cohorts. Returns (lower (B,), upper (B,), p_two_sided (B,)).

    lower/upper are the 2.5/97.5 percentiles of bootstrap medians; p is the
    two-sided sign test of the median distribution vs 0.
    """
    B, n = x.shape
    idx = jax.random.randint(key, (B, bs, n), 0, n)
    draws = jnp.take_along_axis(x[:, None, :].repeat(bs, 1), idx, axis=2)
    meds = jnp.median(draws, axis=2)             # (B, bs)
    lower = jnp.percentile(meds, 2.5, axis=1)
    upper = jnp.percentile(meds, 97.5, axis=1)
    pos = (meds > 0).sum(axis=1)
    neg = (meds < 0).sum(axis=1)
    p = jnp.minimum(pos, neg) / bs * 2.0
    return lower, upper, p


@functools.partial(jax.jit, static_argnames=("bs", "chunk"))
def batched_bootstrap_median_varn(x: jax.Array, n: jax.Array, key: jax.Array,
                                  bs: int, chunk: int = 256):
    """Variable-cohort-size batched bootstrap: x (B, Npad) padded cohorts,
    n (B,) true sizes (>=1). ONE program for every cohort regardless of
    size — indices are drawn in [0, n_b) per row and the per-draw median of
    the n_b resampled values comes from a masked sort. Draw chunks scan to
    bound the (B, chunk, Npad) working set.

    Returns (lower (B,), upper (B,), p_two_sided (B,))."""
    B, Npad = x.shape
    steps = -(-bs // chunk)
    col = jnp.arange(Npad)[None, None, :]
    lo_i = jnp.broadcast_to(((n - 1) // 2)[:, None, None], (B, chunk, 1))
    hi_i = jnp.broadcast_to((n // 2)[:, None, None], (B, chunk, 1))

    def step(carry, i):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (B, chunk, Npad), 0, n[:, None, None])
        draws = jnp.take_along_axis(
            jnp.broadcast_to(x[:, None, :], (B, chunk, Npad)), idx, axis=2)
        valid = col < n[:, None, None]
        s = jnp.sort(jnp.where(valid, draws, jnp.inf), axis=2)
        med = 0.5 * (jnp.take_along_axis(s, lo_i, 2)[..., 0] +
                     jnp.take_along_axis(s, hi_i, 2)[..., 0])
        return carry, med                      # (B, chunk)

    _, meds = jax.lax.scan(step, 0, jnp.arange(steps))
    meds = jnp.moveaxis(meds, 0, 1).reshape(B, steps * chunk)[:, :bs]
    lower = jnp.percentile(meds, 2.5, axis=1)
    upper = jnp.percentile(meds, 97.5, axis=1)
    pos = (meds > 0).sum(axis=1)
    neg = (meds < 0).sum(axis=1)
    p = jnp.minimum(pos, neg) / bs * 2.0
    return lower, upper, p


def bootstrap_cis_device(cohorts: List[np.ndarray], bs: int,
                         seed: int = 0) -> List[Tuple[float, float, float]]:
    """Run ALL cohorts as one variable-size batched device bootstrap
    (single compile + single launch; pow2-padded batch and cohort dims).

    Returns (lower, upper, p) per cohort; empty cohorts give nans.
    """
    out: List[Tuple[float, float, float]] = [None] * len(cohorts)
    idxs = [i for i, c in enumerate(cohorts) if len(c)]
    for i, c in enumerate(cohorts):
        if not len(c):
            out[i] = (float("nan"), float("nan"), float("nan"))
    if not idxs:
        return out
    ns = np.array([len(cohorts[i]) for i in idxs], np.int32)
    Npad = _pow2(int(ns.max()))
    B = len(idxs)
    Bp = _pow2(B)
    X = np.zeros((Bp, Npad), np.float32)
    for k, i in enumerate(idxs):
        X[k, :ns[k]] = cohorts[i]
    n_arr = np.ones(Bp, np.int32)
    n_arr[:B] = ns
    key = jax.random.key(seed)
    lo, hi, p = batched_bootstrap_median_varn(
        jnp.asarray(X), jnp.asarray(n_arr), key, bs)
    lo, hi, p = np.asarray(lo), np.asarray(hi), np.asarray(p)
    for k, i in enumerate(idxs):
        out[i] = (float(lo[k]), float(hi[k]), float(p[k]))
    return out


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
