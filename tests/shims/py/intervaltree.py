"""Minimal intervaltree shim for running the reference phaser_gene_ae.py as
an oracle. Implements the two operations it uses: slice-assignment insertion
and slice-query returning overlapping intervals (iv.begin < qend and
iv.end > qbegin), matching the intervaltree package's semantics."""

from collections import namedtuple

Interval = namedtuple("Interval", ["begin", "end", "data"])


class IntervalTree:
    def __init__(self):
        self._ivs = []

    def __setitem__(self, key, value):
        self._ivs.append(Interval(key.start, key.stop, value))

    def __getitem__(self, key):
        if isinstance(key, slice):
            qs, qe = key.start, key.stop
            return set(iv for iv in self._ivs if iv.begin < qe and iv.end > qs)
        raise TypeError(key)
