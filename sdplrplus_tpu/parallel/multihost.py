"""Multi-host (DCN) bring-up: jax.distributed initialization + global-mesh
helpers for running the SPMD solver across processes.

The reference has no distributed machinery at all (SURVEY §5: its only
parallelism is GNU-parallel over independent instances,
/root/reference/exps/README.md:17-23); this module is the TPU-native
scaling path of BASELINE.md (≥0.8 efficiency at 4 hosts). Design:

  * one process per host, `initialize()` wires jax.distributed (DCN
    coordination); `jax.devices()` then spans all hosts,
  * a 1-D global mesh over every chip; R/G/L-BFGS histories and the ELL
    rows shard over it exactly as in the single-host shard_map path
    (parallel/shardmap.py) — the device-local program is unchanged, the
    all-gather of the factor's row support simply crosses DCN between
    hosts and ICI within them,
  * problem placement: every host compiles the same CompiledProblem
    (deterministic) and `jax.device_put` with a NamedSharding places each
    host's addressable shards from the host-replicated arrays — no
    peer-to-peer scatter step is needed at this problem scale (the
    compiled arrays are O(nnz), the factor O(n·r)).

Real multi-chip hardware is not reachable from this environment; the
code path is exercised by a localhost multi-process CPU smoke test
(tests/test_multihost.py) that runs the fused shard_map driver over
2 processes × 4 virtual devices and checks step-for-step equality with
a single-process run.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_count: int | None = None,
               platform: str | None = None) -> None:
    """Wire this process into a multi-host JAX cluster.

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) all
    arguments are auto-detected and ``initialize()`` suffices. For
    CPU/GPU clusters (or the localhost smoke test) pass the coordinator
    ``host:port``, the world size, and this process's rank.

    ``platform``: force the backend (e.g. "cpu"). Uses jax.config rather
    than the JAX_PLATFORMS env var — site configs (e.g. the axon TPU
    tunnel) can override the env var after process start, but the config
    value wins as long as it is set before backend initialization.

    ``local_device_count``: for CPU runs, how many virtual devices this
    process exposes. CPU cross-process collectives go through Gloo.
    """
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", int(local_device_count))
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # newer JAX enables a CPU collectives impl by default
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "x") -> Mesh:
    """1-D mesh over every device in the cluster (all hosts).

    Device order follows jax.devices(), which groups by process — so a
    row-block sharding over this mesh keeps each host's block contiguous
    and the SpMM all-gather does one DCN hop per remote host-block."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def is_coordinator() -> bool:
    return jax.process_index() == 0


def process_info() -> dict:
    """Cluster topology summary (for logs / result JSON)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
