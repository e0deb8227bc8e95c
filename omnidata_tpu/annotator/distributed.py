"""Multi-chip annotation: shard camera batches over the ('data',) mesh axis.

The reference scales annotation by CPU process pools over views
(create_images_nonblender_utils.py:39-67); the TPU-native equivalent
shard_maps the FUSED batched pipeline (annotate_views — the single-chip
throughput path, one Pallas dispatch per K cameras) over chips: every
device renders its slice of viewpoints against the same replicated
HBM-resident mesh, no collectives needed (embarrassingly parallel, like
the reference).

Validated on the virtual 8-device CPU mesh in tests (interpret-mode
kernel); on a v5e-8 this is the path to the full-pod viewpoint throughput
(single-chip bench x n_devices).
"""
from __future__ import annotations

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.cameras import Camera
from .pipeline import DEVICE_MODALITIES, annotate_views


def make_annotate_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    import numpy as np

    return Mesh(np.asarray(devices[:n]), ("data",))


def annotate_views_sharded(
    cameras: Camera,  # batched: location (B,3), R (B,3,3), fov (B,)
    mesh_geom,
    curvature_mesh=None,
    device_mesh: Mesh | None = None,
    tile: int = 64,
    cap: int = 1024,
    chunk: int = 128,
    modalities: tuple = DEVICE_MODALITIES,
    interpret: bool | None = None,
) -> dict:
    """Annotate B viewpoints with the batch sharded over 'data': each device
    runs the fused batched pipeline on its B/n cameras.

    B must be divisible by the mesh size. Returns a dict of (B,H,W[,C])
    label arrays, each sharded over its leading axis. interpret: None = auto
    (compiled Pallas on TPU, interpret elsewhere)."""
    device_mesh = device_mesh or make_annotate_mesh()
    n = device_mesh.shape["data"]
    B = cameras.location.shape[0]
    assert B % n == 0, f"batch {B} not divisible by mesh size {n}"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch_sharding = NamedSharding(device_mesh, P("data"))
    loc = jax.device_put(cameras.location, batch_sharding)
    R = jax.device_put(cameras.R, batch_sharding)
    fov = jax.device_put(cameras.fov, batch_sharding)

    def local(loc, R, fov):
        return annotate_views(
            Camera(loc, R, fov, cameras.resolution), mesh_geom,
            curvature_mesh, tile=tile, cap=cap, chunk=chunk,
            modalities=modalities, interpret=interpret,
        )

    sharded = shard_map(
        local, mesh=device_mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_rep=False,
    )
    with device_mesh:
        return jax.jit(sharded)(loc, R, fov)
