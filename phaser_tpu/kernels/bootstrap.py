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


def bootstrap_cis_device(cohorts: List[np.ndarray], bs: int,
                         seed: int = 0) -> List[Tuple[float, float, float]]:
    """Bucket cohorts by size and run batched device bootstraps.

    Returns (lower, upper, p) per cohort; empty cohorts give nans.
    """
    out: List[Tuple[float, float, float]] = [None] * len(cohorts)
    by_n: Dict[int, List[int]] = {}
    for i, c in enumerate(cohorts):
        n = len(c)
        if n == 0:
            out[i] = (float("nan"), float("nan"), float("nan"))
        else:
            by_n.setdefault(n, []).append(i)
    for n, idxs in by_n.items():
        X = np.stack([cohorts[i] for i in idxs]).astype(np.float32)
        # pad batch dim to a power of two so compilations are shared across
        # buckets of the same (padded B, n)
        B = len(idxs)
        Bp = 1
        while Bp < B:
            Bp *= 2
        if Bp != B:
            X = np.concatenate([X, np.zeros((Bp - B, n), np.float32)])
        key = jax.random.key(seed + n)
        lo, hi, p = batched_bootstrap_median(jnp.asarray(X), key, bs)
        lo, hi, p = np.asarray(lo), np.asarray(hi), np.asarray(p)
        for k, i in enumerate(idxs):
            out[i] = (float(lo[k]), float(hi[k]), float(p[k]))
    return out
