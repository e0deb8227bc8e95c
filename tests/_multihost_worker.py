"""Worker process for test_multihost_two_process (run via subprocess).

Each of the two workers initializes jax.distributed over a localhost
coordinator with the CPU gloo collectives backend, builds an 8-device
('data',) mesh spanning both processes (4 virtual CPU devices each), feeds
a process-local batch through local_batch_to_global, and runs a jitted
global reduction — the same collective path a v5e pod uses over DCN
(SURVEY.md §2f multihost equivalence). Prints WORKER_OK <pid> on success.
"""
import os
import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from omnidata_tpu.train.multihost import (
        barrier,
        initialize,
        local_batch_to_global,
        process_local_batch_size,
        stripe,
    )

    ok = initialize(coordinator_address=f"localhost:{port}",
                    num_processes=2, process_id=pid)
    assert ok, "initialize() must report a multi-process runtime"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))

    # per-process local shard -> one global array on the mesh
    local = np.full((4, 3), float(pid), np.float32)
    g = local_batch_to_global(mesh, {"x": local})["x"]
    assert g.shape == (8, 3)

    # jitted cross-process reduction (gloo collective): sum = 4*3*0 + 4*3*1
    s = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(g)
    assert float(s) == 12.0, float(s)

    # striping is disjoint + covering and keyed on the real process index
    mine = stripe(list(range(10)))
    assert mine == list(range(10))[pid::2]
    assert process_local_batch_size(8) == 4

    barrier("test-e2e")
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
