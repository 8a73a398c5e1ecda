"""Multi-host execution layer (jax.distributed).

The reference has NO distributed execution at all — its only multi-process
residue is the vendored baselines logger reading MPI rank env vars
(osmosis_utils/logger.py:403-439). The TPU-native replacement (SURVEY.md
section 2.7): every host runs the same program, `jax.distributed.initialize`
wires the cluster, images stride across hosts (they are embarrassingly
parallel — the right multi-host topology here is per-host DP with NO
cross-host collectives in the hot loop; DCN traffic is coordination only),
and `multihost_utils` gathers results/metrics at the end.

Launch (same command on every host):

    python osmosis_sampling.py -c config.yaml \
        --coordinator <host0>:<port> --num-processes N --process-id I

or rely on the TPU pod metadata / env vars (JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID) and call with --multihost alone.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """`jax.distributed.initialize` with env-var fallbacks.

    On TPU pods all three arguments are discovered from the metadata server
    and may be omitted; on CPU/GPU clusters pass them (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    kw = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
    n = num_processes if num_processes is not None else os.environ.get("JAX_NUM_PROCESSES")
    if n is not None:
        kw["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    if local_device_ids is not None:
        kw["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kw)
    # Force backend creation NOW, while every rank is still inside the
    # coordinator-connect window: this blocks on the cross-process topology
    # exchange (minutes-scale timeout), re-synchronizing the ranks.
    jax.device_count()
    if jax.process_count() > 1:
        # Then immediately run one trivial collective. The CPU backend's Gloo
        # context is created lazily at the FIRST collective, with a fixed 30 s
        # key-value rendezvous; if that first collective is the real workload,
        # per-rank compile skew (minutes on a loaded 1-core host) races the
        # window and bring-up intermittently dies with "Gloo context
        # initialization failed: GetKeyValue() timed out". A zero-size
        # allgather here compiles in well under a second on every rank, so the
        # context is established while skew is tiny and is reused afterwards.
        from jax.experimental import multihost_utils

        multihost_utils.process_allgather(np.zeros((), np.float32))


def is_multihost() -> bool:
    return jax.process_count() > 1


def host_slice(n_items: int) -> list:
    """Indices this host owns: stride-by-process so early-exit (`stop_after`)
    stays balanced across hosts."""
    return list(range(jax.process_index(), n_items, jax.process_count()))


def gather_pytree(tree):
    """All-gather a host-local pytree across processes: every host receives
    the full [process_count, ...] stack (multihost_utils.process_allgather)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def gather_scalars(values: dict) -> dict:
    """Gather {name: float} host-local metrics → {name: np.ndarray[P]}."""
    from jax.experimental import multihost_utils

    keys = sorted(values)
    stacked = multihost_utils.process_allgather(
        np.asarray([float(values[k]) for k in keys], np.float64)
    )
    return {k: np.asarray(stacked)[..., i] for i, k in enumerate(keys)}


def barrier(name: str = "osmosis") -> None:
    """Cross-host sync point (e.g. 'all hosts finished their image slice')."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def rank_suffix() -> str:
    """Log-file suffix for non-primary hosts — the baselines logger's
    MPI-rank behavior (osmosis_utils/logger.py:403-409): rank 0 writes
    log.txt, rank k writes log-rank{k:03}.txt."""
    r = jax.process_index()
    return "" if r == 0 else f"-rank{r:03d}"
