"""Device statistics kernels.

binom_cdf matches scipy.stats.binom.cdf (the reference's conflict test,
/root/reference/phaser/phaser.py:1649) via the regularized incomplete beta:
    P(X <= k) = I_{1-p}(n-k, k+1)
computed in float64-free form suitable for TPU (float32 is ~1e-6 accurate;
the engine's pruning decision uses the exact host path, this kernel powers
the all-device pipeline and the bench).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def binom_cdf(k: jax.Array, n: jax.Array, p: jax.Array) -> jax.Array:
    k = jnp.asarray(k, jnp.float32)
    n = jnp.asarray(n, jnp.float32)
    p = jnp.asarray(p, jnp.float32)
    kk = jnp.floor(k)
    full = kk >= n
    a = jnp.maximum(n - kk, 1e-30)
    b = kk + 1.0
    x = jnp.clip(1.0 - p, 0.0, 1.0)
    val = jax.scipy.special.betainc(a, b, x)
    return jnp.where(full, 1.0, jnp.where(kk < 0, 0.0, val))


@jax.jit
def conflicting_config_p(config_a: jax.Array, config_b: jax.Array,
                         other: jax.Array, noise_e: jax.Array) -> jax.Array:
    """Vectorized test_variant_connection p-value (:1645-1652)."""
    c_supporting = jnp.maximum(config_a, config_b)
    c_total = config_a + config_b + other
    p_success = 1.0 - (6.0 * noise_e + 10.0 * noise_e ** 2)
    p = binom_cdf(c_supporting, c_total, p_success)
    p = jnp.where(c_total - c_supporting > 0, p, 1.0)
    p = jnp.where(c_supporting == 0, 0.0, p)
    return p
