"""Multi-host (multi-process) scaffolding — the TPU-native replacement for
the reference's multi-machine story: Lightning DDP process launch
(train_normal.py:376-378) and download striping `num_chunk::total`
(dataset/download.py:271). SURVEY.md §2f names jax.distributed + process
sharding as the required equivalent.

One JAX process per host; `initialize()` wires them into one runtime so
`jax.devices()` spans the slice and pjit/NamedSharding collectives ride
ICI/DCN. Work distribution is deterministic striping keyed on
`jax.process_index()`:

- `stripe(items)`: host-side work lists (buildings to annotate, tars to
  download, views to render) — disjoint, covering, order-stable
- `local_batch_to_global(mesh, batch)`: per-host data feeding — each process
  supplies its local shard and the result is one global jax.Array laid out
  on the mesh (jax.make_array_from_process_local_data)
- `barrier(tag)`: multihost sync replacing the reference's pool joins

Everything degrades to a no-op in a single-process run, so the same train /
annotate drivers work unmodified from a laptop to a multi-host pod.
"""
from __future__ import annotations

import os
from typing import Any, Iterable, Sequence

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """jax.distributed.initialize with env-var defaults; returns True if a
    multi-process runtime was started.

    On TPU pods the three arguments are auto-detected from the metadata
    server, so a bare `initialize()` is correct; elsewhere set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (or pass
    explicitly). Single-process runs (nothing configured) are a no-op."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # jax.distributed.initialize() must run BEFORE anything initializes the
    # XLA backend, so TPU-pod detection must not call jax.default_backend()
    # (jax 0.9 raises 'must be called before any JAX calls' otherwise).
    # Positive pod evidence is required: JAX_PLATFORMS=tpu alone also holds
    # on a SINGLE TPU host (or a tunneled dev box), where a bare
    # jax.distributed.initialize() would block on a metadata server that
    # does not exist. Cloud TPU only sets TPU_WORKER_HOSTNAMES /
    # MEGASCALE_COORDINATOR_ADDRESS on real multi-host slices.
    on_tpu_pod = coordinator_address is None and (
        os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    )
    if not on_tpu_pod and coordinator_address is None:
        return False  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def stripe(
    items: Sequence,
    process_index: int | None = None,
    process_count: int | None = None,
) -> list:
    """This process's slice of a global work list (round-robin striping —
    the `num_chunk::total` grammar of the reference's downloader, keyed on
    jax.process_index()). Disjoint and covering across processes;
    deterministic in the input order."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} outside [0, {pc})")
    return list(items[pi::pc])


def local_batch_to_global(mesh, batch: Any, pspec=None):
    """Assemble each process's host-local numpy batch into one global
    jax.Array sharded over the mesh ('data' leading axis by default).

    The global batch size is local_batch * process_count; every process must
    call this collectively with equally-shaped local data."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if pspec is None:
        pspec = P(mesh.axis_names[0])
    sharding = NamedSharding(mesh, pspec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )


def barrier(tag: str = "sync") -> None:
    """Block until every process reaches this point (pool-join equivalent).
    No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def process_local_batch_size(global_batch: int) -> int:
    """Per-host batch for an evenly divided global batch."""
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by {pc}")
    return global_batch // pc
