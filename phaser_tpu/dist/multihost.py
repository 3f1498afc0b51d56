"""Multi-host execution scaffolding.

The reference is strictly single-node (fork pool + temp files, SURVEY §2.4).
The phaser_tpu equivalent per that survey: a JAX global runtime over ICI
within a slice and DCN across hosts —

  1. `initialize()` -> jax.distributed.initialize (env- or flag-driven)
  2. each host decodes its own BAM shard (reads partitioned by position
     range, halo-extended so read PAIRS spanning a shard boundary land on
     both owners and dedupe by uid downstream)
  3. `global_read_tensors()` assembles process-local (N, L) tensors into
     globally-sharded arrays via jax.make_array_from_process_local_data
  4. the same `sharded_phasing_step` program runs over the global mesh;
     count-tensor psums ride ICI/DCN

Single-chip environments exercise everything below through the virtual CPU
mesh (tests + the driver's dryrun); a real pod slice only changes
`initialize()` arguments.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks; no-op when single."""
    import jax
    if num_processes is None:
        num_processes = int(os.environ.get("PHASER_TPU_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("PHASER_TPU_COORDINATOR", "localhost:9701"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("PHASER_TPU_PROCESS_ID", "0")))


def position_shards(contig_length: int, n_shards: int,
                    halo: int = 1000) -> Sequence[Tuple[int, int]]:
    """Half-open position ranges per shard, halo-extended on the right so
    fragments spanning a boundary are fully visible to the left owner.
    A read is OWNED by the shard containing its leftmost position; hits are
    deduplicated by read uid when merged, so the halo introduces no double
    counting."""
    step = -(-contig_length // n_shards)
    out = []
    for i in range(n_shards):
        lo = i * step
        hi = min((i + 1) * step + halo, contig_length)
        out.append((lo, hi))
    return out


def local_read_selection(bd, shard: Tuple[int, int]) -> np.ndarray:
    """Indices of reads owned by this host's position shard."""
    lo, hi = shard
    pos = bd.pos.astype(np.int64)
    return np.flatnonzero((pos >= lo) & (pos < hi))


def global_read_tensors(mesh, codes: np.ndarray, quals: np.ndarray,
                        refpos: np.ndarray, axis: str = "reads"):
    """Assemble process-local read tensors into globally-sharded arrays.

    On a single process this is equivalent to device_put with a row
    sharding; across processes each host contributes its local batch and
    the global array spans all of them.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    n_proc = jax.process_count()
    out = []
    for local in (codes, quals, refpos):
        global_shape = (local.shape[0] * n_proc,) + local.shape[1:]
        out.append(jax.make_array_from_process_local_data(
            sharding, local, global_shape))
    return tuple(out)


def run_sharded_step(mesh, codes, quals, refpos, vpos, ind_codes, n_ind,
                     baseq: int):
    """Global-array version of the sharded pipeline step."""
    from .mesh import sharded_phasing_step

    g_codes, g_quals, g_refpos = global_read_tensors(mesh, codes, quals,
                                                     refpos)
    return sharded_phasing_step(mesh, g_codes, g_quals, g_refpos, vpos,
                                ind_codes, n_ind, baseq)
