"""Order-statistic bootstrap sampler: distribution parity with direct
index-resampling (the numpy engine's method) and edge-case behavior."""

import numpy as np


def _numpy_ci(x, bs, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(x), size=(bs, len(x)))
    meds = np.median(np.asarray(x)[idx], axis=1)
    return (float(np.percentile(meds, 2.5)),
            float(np.percentile(meds, 97.5)))


def test_beta_sampler_matches_resampling_distribution():
    from phaser_tpu.kernels.bootstrap import bootstrap_cis_device
    rng = np.random.default_rng(5)
    cohorts = [rng.normal(size=n) for n in (41, 40, 7, 128)]
    bs = 20000
    dev = bootstrap_cis_device(cohorts, bs, seed=11)
    for c, (lo, hi, p) in zip(cohorts, dev):
        nlo, nhi = _numpy_ci(c, bs, seed=3)
        # same distribution, different RNGs: percentile estimates agree to
        # within Monte-Carlo noise (the bootstrap-median sd here is ~0.2)
        assert abs(lo - nlo) < 0.1, (len(c), lo, nlo)
        assert abs(hi - nhi) < 0.1, (len(c), hi, nhi)
        assert lo <= hi
        assert 0.0 <= p <= 1.0


def test_beta_sampler_edges():
    from phaser_tpu.kernels.bootstrap import bootstrap_cis_device
    out = bootstrap_cis_device([np.array([3.0]), np.array([]),
                                np.array([1.0, 2.0])], 500, seed=0)
    lo, hi, p = out[0]
    assert lo == hi == 3.0  # n=1: every resample is the single value
    assert all(np.isnan(v) for v in out[1])
    lo2, hi2, _ = out[2]
    # n=2 medians take values {1, 1.5, 2}
    assert 1.0 <= lo2 <= hi2 <= 2.0
