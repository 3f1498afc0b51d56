"""Haplotype-block discovery: connected components of the pruned
variant-overlap graph (mirrors build_haplotypes/build_haplotype_v3,
/root/reference/phaser/phaser.py:1861-1882, 1985-1998).

Union-find on the host; the device path (kernels.components) runs
pointer-jumping label propagation for large edge sets — both produce the same
components; ordering here reproduces the reference's seed order.
"""

from __future__ import annotations

from typing import Dict, List, Set

import numpy as np

from .connections import ContigConnections


def find_blocks(conn: ContigConnections, vt) -> List[List[int]]:
    """Blocks as lists of table indices.

    Order: by first overlap-key rank among members (reference seed order).
    Within a block: sort_var_ids semantics — (contig, int(pos)), ties by
    table index (the reference's tie order is Python-set-iteration dependent).
    """
    adj = conn.adj
    if not adj:
        return []
    parent: Dict[int, int] = {v: v for v in adj}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, nbrs in adj.items():
        for b in nbrs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb

    comps: Dict[int, List[int]] = {}
    for v in adj:
        comps.setdefault(find(v), []).append(v)

    blocks = list(comps.values())
    rank = conn.var_rank
    blocks.sort(key=lambda mem: min(int(rank[v]) for v in mem))
    out = []
    for mem in blocks:
        mem = sorted(mem, key=lambda v: (int(vt.pos[v]), v))
        out.append(mem)
    return out
