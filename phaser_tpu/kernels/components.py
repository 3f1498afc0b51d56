"""Device connected components: pointer-jumping label propagation.

The reference finds haplotype blocks as connected components of the pruned
variant-overlap graph by iterative Python-set frontier expansion
(/root/reference/phaser/phaser.py:1861-1882, 1985-1998). The device
equivalent (SURVEY §7 L1(d)): min-label propagation over a static edge list
with pointer jumping — each round every vertex takes the minimum label over
its neighbors, then labels are path-compressed by two label[label[v]] hops,
so convergence needs O(log n) rounds. All shapes static; the loop is a
lax.while_loop on a did-anything-change flag.

Self-loop edges are harmless, so callers pad the edge arrays with (0, 0).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n",))
def label_components(edge_a: jax.Array, edge_b: jax.Array, n: int
                     ) -> jax.Array:
    """edge_a/edge_b: (E,) int32 vertex ids in [0, n) (undirected edges;
    pad with self-loops). Returns (n,) int32 labels — the minimum vertex id
    reachable from each vertex; equal label <=> same component."""
    init = jnp.arange(n, dtype=jnp.int32)

    def body(state):
        lab, _ = state
        la = lab[edge_a]
        lb = lab[edge_b]
        m = jnp.minimum(la, lb)
        nxt = lab.at[edge_a].min(m).at[edge_b].min(m)
        # pointer jumping: two hops of path compression per round
        nxt = nxt[nxt]
        nxt = nxt[nxt]
        return nxt, jnp.any(nxt != lab)

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(cond, body, (init, jnp.array(True)))
    return lab


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def connected_components(edge_a: np.ndarray, edge_b: np.ndarray,
                         n_vertices: int) -> List[List[int]]:
    """Host wrapper: components of the (edge_a, edge_b) graph over vertices
    0..n_vertices-1 that appear in at least one edge. Returns one member
    list per component (unordered — callers impose the reference ordering).
    """
    if len(edge_a) == 0:
        return []
    # compact vertex ids so the label array is sized to touched vertices
    verts = np.unique(np.concatenate([edge_a, edge_b]))
    n = len(verts)
    ca = np.searchsorted(verts, edge_a).astype(np.int32)
    cb = np.searchsorted(verts, edge_b).astype(np.int32)
    Ep = _next_pow2(max(len(ca), 8))
    if Ep != len(ca):
        ca = np.pad(ca, (0, Ep - len(ca)))
        cb = np.pad(cb, (0, Ep - len(cb)))
    Np = _next_pow2(max(n, 8))
    labels = np.asarray(label_components(jnp.asarray(ca), jnp.asarray(cb),
                                         Np))[:n]
    comps: dict = {}
    for i in range(n):
        comps.setdefault(int(labels[i]), []).append(int(verts[i]))
    return list(comps.values())
