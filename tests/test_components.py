"""Device connected-components kernel parity + the >=200k-pair device
pair-count gate in engine.connections (exercised end-to-end)."""

import numpy as np
import pytest


def _host_components(ea, eb):
    touched = sorted(set(ea.tolist()) | set(eb.tolist()))
    parent = {v: v for v in touched}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ea.tolist(), eb.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for v in touched:
        comps.setdefault(find(v), set()).add(v)
    return sorted(tuple(sorted(c)) for c in comps.values())


def test_components_match_host_unionfind():
    from phaser_tpu.kernels.components import connected_components
    rng = np.random.default_rng(0)
    for _ in range(6):
        n = int(rng.integers(10, 400))
        e = int(rng.integers(1, 1200))
        ea = rng.integers(0, n, e).astype(np.int64)
        eb = rng.integers(0, n, e).astype(np.int64)
        dev = sorted(tuple(sorted(c))
                     for c in connected_components(ea, eb, n))
        assert dev == _host_components(ea, eb)


def test_find_blocks_device_matches_host(monkeypatch):
    from types import SimpleNamespace
    from phaser_tpu.engine import blocks as blk

    monkeypatch.setattr(blk, "_DEVICE_EDGE_GATE", 0)
    rng = np.random.default_rng(3)
    n = 500
    adj = {}
    for _ in range(900):
        a, b = map(int, rng.integers(0, n, 2))
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    var_rank = rng.permutation(n).astype(np.int64)
    conn = SimpleNamespace(adj=adj, var_rank=var_rank)
    vt = SimpleNamespace(pos=rng.integers(0, 10**6, n).astype(np.int64))
    host = blk.find_blocks(conn, vt, device="host")
    dev = blk.find_blocks(conn, vt, device="auto")
    assert host == dev


class _FakeVT:
    """Minimal variant-table stand-in for build_connections."""

    def __init__(self, n):
        self._n = n
        self.phases = ["-"] * n          # skip phase-concordance branches
        self.ind_alleles = [("A", "G")] * n

    def __len__(self):
        return self._n


def test_build_connections_crosses_device_gate():
    """A >=200k-unique-pair workload actually engages the device pair-count
    path (engine/connections gate) and matches the host path exactly."""
    from types import SimpleNamespace
    from phaser_tpu.engine.connections import build_connections

    rng = np.random.default_rng(1)
    n_vars = 5000
    n_reads = 250_000
    v1 = rng.integers(0, n_vars, n_reads)
    v2 = np.minimum(v1 + 1 + rng.integers(0, 200, n_reads), n_vars - 1)
    ok = v1 != v2
    v1, v2 = v1[ok], v2[ok]
    uid = np.arange(len(v1), dtype=np.int64)
    rv_uid = np.repeat(uid, 2)
    rv_var = np.stack([v1, v2], 1).ravel().astype(np.int64)
    allele = rng.integers(0, 2, size=2 * len(v1)).astype(np.int64)
    vr = SimpleNamespace(vt=_FakeVT(n_vars), rv_uid=rv_uid, rv_var=rv_var,
                         h_uid=rv_uid, h_var=rv_var, h_allele=allele)

    host = build_connections(vr, 0.002, 0.01, device="host")
    dev = build_connections(vr, 0.002, 0.01, device="auto")
    assert host.n_pairs >= 200_000  # the gate threshold really is crossed
    np.testing.assert_array_equal(host.var_a, dev.var_a)
    np.testing.assert_array_equal(host.var_b, dev.var_b)
    np.testing.assert_array_equal(host.c_supporting, dev.c_supporting)
    np.testing.assert_array_equal(host.c_total, dev.c_total)
    np.testing.assert_array_equal(host.p_value, dev.p_value)
    np.testing.assert_array_equal(host.chosen_config, dev.chosen_config)
    np.testing.assert_array_equal(host.pruned, dev.pruned)
    assert host.adj == dev.adj
    assert host.allele_conn == dev.allele_conn
