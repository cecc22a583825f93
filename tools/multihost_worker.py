"""Worker for the 2-process multi-host CPU smoke test (tests/test_multihost.py).

Run as: python tools/multihost_worker.py <coordinator> <num_procs> <proc_id>
with JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=2.

Exercises the pod scaffolding end to end on a 2-process x 2-device CPU
"cluster" (SURVEY §2.4, reference train.py:32-52):
  1. jax.distributed.initialize via parallel.multihost
  2. per-process InfiniteSampler shards are disjoint + exhaustive
  3. host-local batch shards -> global array (make_array_from_process_local_data)
  4. a pjit'd global-sum over the 'data' axis equals the true global sum
  5. replicate_from_host0 broadcast
Prints MULTIHOST_OK on success.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from sherf_tpu.parallel.multihost import (
        host_local_batch_to_global, maybe_initialize_distributed,
        replicate_from_host0,
    )

    proc, total = maybe_initialize_distributed(coordinator, n_proc, pid)
    assert (proc, total) == (pid, n_proc), (proc, total)

    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    assert len(jax.devices()) == 2 * n_proc, jax.devices()

    # sampler sharding: rank shards are disjoint and cover every index
    from sherf_tpu.data.sampler import InfiniteSampler

    n = 12
    mine = []
    it = iter(InfiniteSampler(n, rank=proc, num_replicas=total,
                              shuffle=False, seed=0))
    for _ in range(n // total):
        mine.append(next(it))
    assert sorted(mine) == list(range(proc, n, total)), mine

    # host-local batch -> global array -> global collective
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 1), ("data", "rays"))
    local = np.arange(4, dtype=np.float32).reshape(2, 2) + 10 * proc
    glob = host_local_batch_to_global(local, mesh, P("data"))
    assert glob.shape == (2 * n_proc, 2), glob.shape

    total_sum = jax.jit(lambda x: x.sum())(glob)
    expect = sum(float((np.arange(4) + 10 * p).sum()) for p in range(n_proc))
    assert abs(float(total_sum) - expect) < 1e-6, (float(total_sum), expect)

    # host-0 broadcast
    tree = {"w": np.full((3,), float(proc), np.float32)}
    rep = replicate_from_host0(tree, mesh)
    np.testing.assert_allclose(np.asarray(rep["w"]), 0.0)

    print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
