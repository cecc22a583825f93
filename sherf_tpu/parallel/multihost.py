"""Multi-host (pod) scaffolding: one JAX process per host.

The reference distributes by spawning one torch process per GPU with an
NCCL file-rendezvous (train.py:32-52) and manually all_reducing gradients
(training_loop.py:374-384).  The TPU-native story (SURVEY §2.4) is one JAX
process per HOST over ICI/DCN:

  * :func:`maybe_initialize_distributed` — ``jax.distributed.initialize``
    from explicit args or the standard env vars; a no-op for single-process
    runs, so the same entry point serves laptop and pod.
  * data: each host loads only its shard of the global batch
    (``InfiniteSampler(rank=process_index, num_replicas=process_count)``,
    the per-host equivalent of misc.InfiniteSampler's rank sharding) and
    :func:`host_local_batch_to_global` assembles the global jax.Array
    without any host<->host copy of array data.
  * params: replicated via :func:`replicate_from_host0` (the reference's
    rank-0 broadcast, training_loop.py:229-236).
  * gradients: the shard_map train step's psum/pmean rides ICI within a
    host's slice and DCN across hosts — XLA places the collectives; there
    is no NCCL-style process-group management to port.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None
                                 ) -> Tuple[int, int]:
    """Initialize the JAX process group when multi-process info is present.

    Sources, in order: explicit args; ``SHERF_COORDINATOR`` /
    ``SHERF_NUM_PROCESSES`` / ``SHERF_PROCESS_ID`` env vars; cloud TPU
    auto-detection (args all None but JAX can discover the pod).  Returns
    (process_index, process_count).  Single-process runs return (0, 1)
    without touching jax.distributed.
    """
    coordinator = coordinator or os.environ.get("SHERF_COORDINATOR")
    if num_processes is None and os.environ.get("SHERF_NUM_PROCESSES"):
        num_processes = int(os.environ["SHERF_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SHERF_PROCESS_ID"):
        process_id = int(os.environ["SHERF_PROCESS_ID"])

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def global_batch_size(per_host_batch: int) -> int:
    return per_host_batch * jax.process_count()


def coordination_barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Block until every process reaches ``name`` (coordination-service
    gRPC barrier — no device collective involved).

    The CPU Gloo collectives backend gives each new communicator a hard
    30 s key-value rendezvous: if one process enters a collective while a
    peer is still minutes inside a local XLA compile (common on shared
    CPUs), the whole job dies with "Gloo context initialization failed:
    DEADLINE_EXCEEDED".  Placing this barrier right before the first
    execution of each collective program bounds the rendezvous skew to the
    program-launch skew.  No-op for single-process runs.
    """
    if jax.process_count() == 1:
        return
    try:
        # private API (no stability guarantee) — but the only pure-gRPC
        # barrier: no device collective, so no Gloo communicator rendezvous
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
            return
    except (ImportError, AttributeError):
        pass
    # public fallback: sync_global_devices runs a device collective, which
    # re-introduces the communicator-rendezvous timeout this barrier
    # exists to avoid — acceptable as a degraded path after a JAX upgrade
    # moves the private client (better than crashing pod startup)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def host_local_batch_to_global(batch, mesh: Mesh, specs):
    """Assemble per-host batch shards into global arrays.

    ``batch`` holds this host's items (leading dim = per-host batch);
    ``specs`` the per-leaf PartitionSpecs (parallel.mesh.batch_pspecs).
    Uses jax.make_array_from_process_local_data — each device keeps only
    its local shard, no cross-host array traffic.
    """
    def put(x, spec):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree.map(put, batch, specs)


def replicate_from_host0(tree, mesh: Mesh):
    """Replicate host-0's values to every device of the global mesh (the
    reference's rank-0 param broadcast, training_loop.py:229-236).  With a
    deterministic seed all hosts init identically, so outside of resume
    this is belt-and-braces; after a host-0-only checkpoint restore it is
    required."""
    if jax.process_count() == 1:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    from jax.experimental import multihost_utils

    tree = multihost_utils.broadcast_one_to_all(tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, P()), lambda idx: x[idx]), tree)
