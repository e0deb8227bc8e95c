"""Smooth camera trajectories (generate_points_smooth_trajectory.py:160-264):
order a point's cameras into a far->near neighbor chain, linearly interpolate
locations (10 steps/meter) and slerp rotations between keyframes; every frame
stays fixated on the point.
"""
from __future__ import annotations

import numpy as np


def order_cameras_chain(cam_locs: np.ndarray, point: np.ndarray) -> np.ndarray:
    """Start at the farthest camera, greedily hop to the nearest unvisited."""
    n = len(cam_locs)
    d_to_pt = np.linalg.norm(cam_locs - point, axis=1)
    order = [int(np.argmax(d_to_pt))]
    remaining = set(range(n)) - set(order)
    while remaining:
        cur = cam_locs[order[-1]]
        nxt = min(remaining, key=lambda j: np.linalg.norm(cam_locs[j] - cur))
        order.append(nxt)
        remaining.remove(nxt)
    return np.asarray(order)


def interpolate_trajectory(
    cam_locs: np.ndarray,
    point: np.ndarray,
    steps_per_meter: float = 10.0,
):
    """-> (frame_locs (T,3), frame_R (T,3,3)): linear positions between the
    chained keyframes, every frame fixated (look-at) on the point; rotations
    therefore interpolate on the sphere implicitly, with roll slerped away."""
    import jax
    import jax.numpy as jnp

    from ..core.cameras import look_at_rotation

    order = order_cameras_chain(cam_locs, point)
    keys = cam_locs[order]
    frames = []
    for a, b in zip(keys[:-1], keys[1:]):
        seg = np.linalg.norm(b - a)
        n = max(int(np.ceil(seg * steps_per_meter)), 1)
        for t in np.arange(n) / n:
            frames.append((1 - t) * a + t * b)
    frames.append(keys[-1])
    locs = np.stack(frames).astype(np.float32)
    Rs = jax.vmap(lambda l: look_at_rotation(l, jnp.asarray(point)))(jnp.asarray(locs))
    return locs, np.asarray(Rs)


def frame_uuid(t: int) -> str:
    """camera_uuid = str(t).zfill(4) (generate_points_smooth_trajectory.py)."""
    return str(t).zfill(4)
