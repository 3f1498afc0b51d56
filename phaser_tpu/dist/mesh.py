"""Genomic sharding over a jax.sharding.Mesh.

The reference's parallelism is a fork pool over contigs with parent-side
merges (/root/reference/phaser/phaser.py:2077-2094, 558-586).  Here the
data-parallel axis is genomic: read batches shard along axis "reads" of a
device mesh; per-shard count tensors merge with psum — the collective runs
over ICI on a real slice, and the same program runs on the
xla_force_host_platform_device_count virtual mesh in tests/dry runs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "reads") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_reads(mesh: Mesh, *arrays, axis_name: str = "reads"):
    """Place (N, ...) read-major arrays row-sharded across the mesh.
    N must be divisible by the mesh size (callers pad)."""
    sh = NamedSharding(mesh, P(axis_name))
    return tuple(jax.device_put(a, sh) for a in arrays)


def pad_to_multiple(a: np.ndarray, mult: int, axis: int = 0,
                    fill=0) -> np.ndarray:
    n = a.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return np.pad(a, widths, constant_values=fill)


def sharded_allele_counts(mesh: Mesh, codes, quals, refpos, vpos, ind_codes,
                          n_ind, baseq: int):
    """Full sharded hot path: per-device allele assignment + psum'd
    per-(variant, allele-class) count tensor. Returns (n_vars, 3) counts.

    This is the merge semantics of phaser.py:558-586 as one reduction.
    """
    from jax.experimental.shard_map import shard_map
    from ..kernels.alleles import assign_alleles_device

    n_vars = int(vpos.shape[0])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("reads"), P("reads"), P("reads"), P(), P(), P()),
        out_specs=P())
    def step(codes, quals, refpos, vpos, ind_codes, n_ind):
        vidx, allele = assign_alleles_device(codes, quals, refpos, vpos,
                                             ind_codes, n_ind, baseq)
        hit = allele < 3
        flat_v = jnp.where(hit, vidx, 0).reshape(-1)
        flat_a = jnp.where(hit, allele, 0).reshape(-1)
        local = jnp.zeros((n_vars, 3), jnp.int32)
        local = local.at[flat_v, flat_a].add(hit.reshape(-1).astype(jnp.int32))
        return jax.lax.psum(local, "reads")

    return step(codes, quals, refpos, vpos, ind_codes, n_ind)
