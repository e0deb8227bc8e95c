"""Principal curvature: per-vertex (K1, K2) -> clipped -> RG vertex colors ->
rasterized via the mesh renderer.

Capability match for the reference's MeshLab APSS pipeline
(create_curvature_images.py:52-338, create_curvature_meshes.py:17-52
colorize_curvature_apss(filterscale=0.1, K1/K2)): curvature is computed once
per mesh on the host, baked into vertex colors with the reference's exact
clip/remap (clip to ±1/r, r = 0.03 m; map [-1/r, 1/r] -> [0,254]/255 into the
R (K1) and G (K2) channels, B = 0), then rendered with the shared rasterizer.

Estimator: local quadric patch fit. For each vertex, neighbors within the
k-ring graph are projected into the tangent frame and z = ax^2 + bxy + cy^2 is
least-squares fit; principal curvatures are the eigenvalues of -[[2a, b],
[b, 2c]]. (APSS fits algebraic spheres instead; both converge to the true
curvatures on smooth dense meshes — validated on analytic sphere/torus/saddle
tests.)

Sign convention (matches MeshLab APSS / the published principal_curvature
labels): POSITIVE where the surface bends away from the oriented normal —
a sphere with outward normals has K1 = K2 = +1/R, so convex regions encode
bright (> 0.5) in the R/G channels and concave corners dark, as in the
reference assets (create_curvature_images.py:183: "a principal curvature of
k corresponds to the curvature of a sphere of radius r = 1/k").
Ordering: K1 >= K2 (K1 is the max curvature, R channel).
"""
from __future__ import annotations

import numpy as np


def vertex_principal_curvatures(
    vertices: np.ndarray,
    faces: np.ndarray,
    vertex_normals: np.ndarray,
    rings: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """(K1, K2) per vertex, K1 >= K2. Host numpy; O(V * ring_size)."""
    V = vertices.shape[0]
    # adjacency (k-ring via sparse matrix powers)
    import scipy.sparse as sp

    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    A = sp.coo_matrix(
        (np.ones(len(e) * 2), (np.concatenate([e[:, 0], e[:, 1]]),
                               np.concatenate([e[:, 1], e[:, 0]]))),
        shape=(V, V),
    ).tocsr()
    A.data[:] = 1.0
    reach = A.copy()
    for _ in range(rings - 1):
        reach = reach + reach @ A
    reach = reach.tolil()

    k1 = np.zeros(V)
    k2 = np.zeros(V)
    for i in range(V):
        nbrs = reach.rows[i]
        if len(nbrs) < 5:
            continue
        n = vertex_normals[i]
        # tangent frame
        t1 = np.cross(n, [1.0, 0.0, 0.0])
        if np.linalg.norm(t1) < 1e-6:
            t1 = np.cross(n, [0.0, 1.0, 0.0])
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(n, t1)
        d = vertices[nbrs] - vertices[i]
        x = d @ t1
        y = d @ t2
        z = d @ n
        M = np.stack([x * x, x * y, y * y], -1)
        coef, *_ = np.linalg.lstsq(M, z, rcond=None)
        a, b, c = coef
        # minus: convex-positive (bend away from the normal), see module doc
        S = -np.array([[2 * a, b], [b, 2 * c]])
        w = np.linalg.eigvalsh(S)
        k1[i], k2[i] = w[1], w[0]
    return k1, k2


def clip_curvatures(vals: np.ndarray, radius: float = 0.03) -> np.ndarray:
    """Clip to ±1/radius (create_curvature_images.py:183-198)."""
    m = 1.0 / radius
    return np.clip(vals, -m, m)


def curvature_colors(k1: np.ndarray, k2: np.ndarray,
                     min_radius: float = 0.03) -> np.ndarray:
    """map_to_color 'principal' (create_curvature_images.py:201-222):
    [-1/r, 1/r] -> round(((k*r)+1)/2 * 254)/255 into R=K1, G=K2, B=0."""
    max_val = 254.0
    r1 = np.round(((k1 * min_radius) + 1.0) / 2.0 * max_val) / (max_val + 1.0)
    r2 = np.round(((k2 * min_radius) + 1.0) / 2.0 * max_val) / (max_val + 1.0)
    return np.stack([r1, r2, np.zeros_like(r1)], -1).astype(np.float32)


def bake_curvature_colors(mesh, rings: int = 2, min_radius: float = 0.03):
    """TriangleMesh -> TriangleMesh with curvature RG vertex colors."""
    import jax.numpy as jnp

    v = np.asarray(mesh.vertices)
    f = np.asarray(mesh.faces[: mesh.num_faces])
    vn = np.asarray(mesh.vertex_normals)
    k1, k2 = vertex_principal_curvatures(v, f, vn, rings=rings)
    k1 = clip_curvatures(k1, min_radius)
    k2 = clip_curvatures(k2, min_radius)
    colors = curvature_colors(k1, k2, min_radius)
    return mesh._replace(vertex_colors=jnp.asarray(colors))
