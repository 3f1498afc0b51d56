"""split_by_weak termination guard: for max_block_size < 3 the reference's
loop can never satisfy max_frag <= max_size (fragments of size >= 2 always
remain when no more weak points split) and spins forever
(/root/reference/phaser/phaser.py:2271-2294). phaser_tpu bails after a guard
count and phases the smallest fragments it reached — this test pins that
documented divergence."""

import time

from phaser_tpu.engine.phasing import phase_v3, split_by_weak


def _chain(n):
    """Variants 0..n-1 connected in a chain (every interior point weak)."""
    vc = {}
    for i in range(n - 1):
        vc.setdefault(i, set()).add(i + 1)
        vc.setdefault(i + 1, set()).add(i)
    return vc


def test_split_by_weak_guard_terminates():
    variants = list(range(12))
    vc = _chain(12)
    for max_size in (1, 2):
        t0 = time.time()
        frags = split_by_weak(variants, vc, max_size)
        assert time.time() - t0 < 10  # the reference would hang here
        # every variant lands in exactly one fragment, order preserved
        flat = [v for f in frags for v in f]
        assert flat == variants
        assert all(len(f) >= 1 for f in frags)


def test_phase_v3_small_max_block_size():
    """phase_v3 completes for max_block_size < 3 and returns consistent
    (variant, allele) assignments over the guard-terminated fragments."""
    variants = list(range(8))
    vc = _chain(8)
    ac = {}
    for i in range(7):
        # allele edges all in cis config
        ac.setdefault((i, 0), set()).add((i + 1, 0))
        ac.setdefault((i + 1, 0), set()).add((i, 0))
        ac.setdefault((i, 1), set()).add((i + 1, 1))
        ac.setdefault((i + 1, 1), set()).add((i, 1))
    out = phase_v3(variants, vc, ac, 2)
    for block in out:
        assert all(ch in "01" for _, ch in block)
        assert [v for v, _ in block] == sorted(v for v, _ in block)
