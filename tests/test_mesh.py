"""Mesh engine tests: analytic scenes with closed-form depth/normals, and
rasterizer-vs-raycaster cross validation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omnidata_tpu.core import Camera, camera_rays, look_at_rotation
from omnidata_tpu.mesh import (
    Fragments,
    TriangleMesh,
    any_hit_within,
    bin_triangles,
    count_crossings,
    cube,
    face_labels,
    from_arrays,
    hit_points_world,
    load_obj,
    load_ply,
    normals_to_camera,
    quad_plane,
    raycast,
    render_view,
    render_views,
    room,
    smooth_normals_world,
    vertex_colors,
)

RES = 64


def _camera(loc, target, fov=1.0, res=RES):
    loc = jnp.asarray(loc, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    return Camera(loc, look_at_rotation(loc, target), jnp.asarray(fov), res)


def test_raycast_plane_distance():
    # camera at z=2 looking straight down at z=0 plane: t = 2 / cos(angle)
    mesh = quad_plane(size=100.0, z=0.0)
    cam = _camera([0, 0, 2.0], [0, 0, 0.0])
    origin, dirs = camera_rays(cam)
    hits = raycast(jnp.broadcast_to(origin, (RES * RES, 3)), dirs.reshape(-1, 3), mesh)
    assert bool(hits.valid.all())
    cos = -dirs.reshape(-1, 3)[:, 2]  # rays point downward
    np.testing.assert_allclose(hits.t * cos, 2.0, atol=1e-4)


def test_render_view_plane_zbuffer_constant():
    mesh = quad_plane(size=100.0, z=0.0)
    cam = _camera([0, 0, 2.0], [0, 0, 0.0])
    frag = render_view(cam, mesh, tile=32, cap=256, chunk=32)
    assert bool(frag.valid.all())
    # z-buffer depth is constant (plane ⟂ camera axis), euclidean is not
    np.testing.assert_allclose(frag.z, 2.0, atol=1e-4)
    assert float(frag.t.max()) > 2.0 + 1e-3
    np.testing.assert_allclose(frag.t.min(), 2.0, atol=1e-3)


def test_render_matches_raycast_on_cube():
    mesh = cube(size=1.0)
    cam = _camera([2.0, 1.5, 1.2], [0, 0, 0])
    frag = render_view(cam, mesh, tile=32, cap=256, chunk=32)
    origin, dirs = camera_rays(cam)
    hits = raycast(jnp.broadcast_to(origin, (RES * RES, 3)), dirs.reshape(-1, 3), mesh)
    np.testing.assert_array_equal(np.asarray(frag.valid).ravel(), np.asarray(hits.valid))
    tv = np.asarray(hits.t).reshape(RES, RES)
    got = np.asarray(frag.t)
    m = np.asarray(frag.valid)
    np.testing.assert_allclose(got[m], tv[m], atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(frag.face)[m], np.asarray(hits.face).reshape(RES, RES)[m]
    )


def test_cube_face_labels_and_normals():
    mesh = cube(size=1.0)
    cam = _camera([0, 0, 3.0], [0, 0, 0], fov=0.6)
    frag = render_view(cam, mesh, tile=32, cap=256, chunk=32)
    c = RES // 2
    # center pixel hits the +z face (labels: quads ordered -x,+x,-y,+y,-z,+z)
    assert bool(frag.valid[c, c])
    lab = face_labels(frag, mesh, background=-1)
    assert int(lab[c, c]) == 5
    # flat cube: smooth normals at face centers ~ face normal +z
    n_w = smooth_normals_world(frag, mesh)
    n_cam = normals_to_camera(n_w, cam)
    # facing the camera -> camera-frame z component ~ +1
    assert float(n_cam[c, c, 2]) > 0.7
    # depth at center = 3 - 0.5
    np.testing.assert_allclose(frag.z[c, c], 2.5, atol=1e-3)


def test_room_interior_fully_valid():
    mesh = room(size=8.0, height=3.0)
    cam = _camera([0, 0, 1.5], [2.0, 1.0, 1.5])
    frag = render_view(cam, mesh, tile=32, cap=256, chunk=32)
    assert bool(frag.valid.all())  # closed room: every ray hits
    assert float(frag.z.min()) > 0


def test_inside_outside_parity():
    mesh = room(size=8.0, height=3.0)
    pts = jnp.asarray([[0.0, 0, 1.5], [10.0, 0, 1.5], [3.9, 3.9, 2.9], [0, 0, 5.0]])
    dirs = jnp.broadcast_to(jnp.asarray([0.31, 0.52, 0.80]), (4, 3))
    crossings = count_crossings(pts, dirs, mesh)
    inside = np.asarray(crossings) % 2 == 1
    np.testing.assert_array_equal(inside, [True, False, True, False])


def test_line_of_sight():
    mesh = cube(size=1.0, center=(0.0, 0.0, 0.0))
    # segment passing through the cube is blocked; one to the side is not
    o = jnp.asarray([[0.0, -3.0, 0.0], [0.0, -3.0, 3.0]])
    targets = jnp.asarray([[0.0, 3.0, 0.0], [0.0, 3.0, 3.0]])
    d = targets - o
    dist = jnp.linalg.norm(d, axis=-1)
    blocked = any_hit_within(o, d / dist[:, None], dist - 1e-3, mesh)
    np.testing.assert_array_equal(np.asarray(blocked), [True, False])


def test_vertex_color_interpolation():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    mesh = from_arrays(v, f, vertex_colors=colors)
    cam = _camera([0.5, 0.5, 2.0], [0.5, 0.5, 0.0], fov=0.8)
    frag = render_view(cam, mesh, tile=32, cap=256, chunk=32)
    img = vertex_colors(frag, mesh)
    m = np.asarray(frag.valid)
    vals = np.asarray(img)[m]
    assert vals.min() >= -1e-5 and vals.max() <= 1 + 1e-5
    # colors vary across the quad
    assert vals.std(0).max() > 0.1


def test_hit_points_on_plane():
    mesh = quad_plane(size=100.0, z=0.25)
    cam = _camera([0, 0, 2.0], [0, 0, 0.0])
    frag = render_view(cam, mesh, tile=32, cap=256, chunk=32)
    pts = hit_points_world(frag, cam)
    np.testing.assert_allclose(np.asarray(pts)[..., 2], 0.25, atol=1e-4)


def test_bin_counts_reasonable():
    mesh = cube(size=1.0)
    cam = _camera([2.0, 1.5, 1.2], [0, 0, 0])
    tri_lists, counts = bin_triangles(cam, mesh, tile=32, cap=64)
    assert tri_lists.shape == ((RES // 32) ** 2, 64)
    assert int(counts.max()) <= 12


def test_render_views_batched():
    mesh = cube(size=1.0)
    locs = jnp.asarray([[2.0, 0, 0.5], [0, 2.0, 0.5], [-2.0, 0, 0.5]])
    Rs = jax.vmap(lambda l: look_at_rotation(l, jnp.zeros(3)))(locs)
    cams = Camera(locs, Rs, jnp.full((3,), 0.9), RES)
    frags = render_views(cams, mesh, tile=32, cap=256, chunk=32)
    assert frags.t.shape == (3, RES, RES)
    assert bool(frags.valid.any(axis=(1, 2)).all())


def test_obj_ply_loaders(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3\n")
    m = load_obj(str(obj))
    assert m.num_faces == 2 and m.vertices.shape[0] == 4

    ply = tmp_path / "tri.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
        "0 0 0 255 0 0\n1 0 0 0 255 0\n0 1 0 0 0 255\n3 0 1 2\n"
    )
    m2 = load_ply(str(ply))
    assert m2.num_faces == 1
    np.testing.assert_allclose(np.asarray(m2.vertex_colors)[0], [1, 0, 0])


def test_pano_render_room():
    from omnidata_tpu.core import euler_xyz_to_matrix
    from omnidata_tpu.mesh import render_pano

    mesh = room(size=8.0, height=3.0)
    loc = jnp.asarray([0.0, 0.0, 1.5])
    # leveled pano camera (Blender: pitch pi/2 puts camera +Y at world +Z)
    R = euler_xyz_to_matrix(jnp.asarray([np.pi / 2, 0.0, 0.0]))
    frag = render_pano(loc, R, mesh, width=64, height=32, block=512)
    assert bool(frag.valid.all())  # closed room: the whole sphere hits
    # top row looks up (ceiling at 3-1.5m), bottom looks down (floor 1.5m)
    np.testing.assert_allclose(frag.t[0, :], 1.5, atol=0.05)
    np.testing.assert_allclose(frag.t[-1, :], 1.5, atol=0.05)
    # horizon row hits walls at >= 4m at the closest
    assert float(frag.t[16].min()) >= 3.9


def test_ply_semantic_labels(tmp_path):
    from omnidata_tpu.mesh import load_ply

    ply = tmp_path / "sem.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\nproperty list uchar int vertex_indices\n"
        "property int object_id\nend_header\n"
        "0 0 0\n1 0 0\n0 1 0\n1 1 0\n"
        "3 0 1 2 7\n3 1 3 2 9\n"
    )
    m = load_ply(str(ply))
    assert m.face_labels is not None
    np.testing.assert_array_equal(np.asarray(m.face_labels[:2]), [7, 9])


def test_ply_binary_faces_and_labels(tmp_path):
    """binary_little_endian face parsing (the Replica mesh_semantic.ply
    layout): the uniform-triangle fast path, the per-face semantic label
    column, and the mixed-polygon walk fallback with fan triangulation.
    (Regression: the list-property type indices were read from the wrong
    tuple slots, so ALL binary face PLYs failed.)"""
    import struct

    from omnidata_tpu.mesh import load_ply

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    head = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\nproperty list uchar int vertex_indices\n"
        "property int object_id\nend_header\n"
    ).encode()
    body = b"".join(struct.pack("<3f", *p) for p in v)
    body += struct.pack("<B3ii", 3, 0, 1, 2, 7)
    body += struct.pack("<B3ii", 3, 1, 3, 2, 9)
    (tmp_path / "b.ply").write_bytes(head + body)
    m = load_ply(str(tmp_path / "b.ply"))
    assert m.num_faces == 2
    got = sorted(
        (tuple(f), int(l)) for f, l in
        zip(np.asarray(m.faces[:2]), np.asarray(m.face_labels[:2]))
    )
    assert got == [((0, 1, 2), 7), ((1, 3, 2), 9)]

    # mixed polygon sizes: quad fan-triangulates via the walk fallback
    head2 = head
    body2 = b"".join(struct.pack("<3f", *p) for p in v)
    body2 += struct.pack("<B4ii", 4, 0, 1, 3, 2, 5)
    body2 += struct.pack("<B3ii", 3, 0, 2, 3, 6)
    (tmp_path / "q.ply").write_bytes(head2 + body2)
    m2 = load_ply(str(tmp_path / "q.ply"))
    assert m2.num_faces == 3  # quad -> 2 tris + 1 tri
    labs = sorted(np.asarray(m2.face_labels[:3]).tolist())
    assert labs == [5, 5, 6]


def test_mesh_conversion_roundtrip(tmp_path):
    from omnidata_tpu.utils.convert_mesh import main as convert

    obj = tmp_path / "m.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    ply = tmp_path / "m.ply"
    convert([str(obj), str(ply)])
    m = load_ply(str(ply))
    assert m.num_faces == 1
    obj2 = tmp_path / "m2.obj"
    convert([str(ply), str(obj2)])
    m2 = load_obj(str(obj2))
    np.testing.assert_allclose(np.asarray(m2.vertices), np.asarray(m.vertices))


def test_pallas_raster_matches_xla_interpret():
    from omnidata_tpu.mesh import render_view_pallas

    mesh = cube(size=1.0)
    cam = _camera([2.0, 1.5, 1.2], [0, 0, 0])
    a = render_view(cam, mesh, tile=32, cap=256, chunk=64)
    b = render_view_pallas(cam, mesh, tile=32, cap=256, chunk=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    m = np.asarray(a.valid)
    np.testing.assert_array_equal(np.asarray(a.face)[m], np.asarray(b.face)[m])
    np.testing.assert_allclose(np.asarray(b.t)[m], np.asarray(a.t)[m], atol=1e-4)


def test_textured_rgb(tmp_path):
    from omnidata_tpu.mesh import load_obj, textured_colors
    from PIL import Image

    # a quad with a 2x2 checker texture
    tex = np.zeros((64, 64, 3), np.uint8)
    tex[:32, :32] = (255, 0, 0)
    tex[32:, 32:] = (0, 255, 0)
    Image.fromarray(tex).save(tmp_path / "m.png")
    (tmp_path / "m.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n"
    )
    mesh = load_obj(str(tmp_path / "m.obj"))
    assert mesh.texture is not None and mesh.vertex_uvs is not None
    cam = _camera([0.5, 0.5, 2.0], [0.5, 0.5, 0.0], fov=0.8)
    frag = render_view(cam, mesh, tile=32, cap=256, chunk=32)
    img = np.asarray(textured_colors(frag, mesh))
    m = np.asarray(frag.valid)
    assert m.any()
    # both checker colors visible
    reds = (img[..., 0] > 0.5) & m
    greens = (img[..., 1] > 0.5) & m
    assert reds.any() and greens.any()


def test_pallas_attr_interpolation_matches_shade(tmp_path):
    from omnidata_tpu.mesh import render_view_pallas, interpolate_vertex_attribute

    mesh = cube(size=1.0)
    import jax.numpy as jnp
    attrs = jnp.concatenate([mesh.vertex_normals,
                             jnp.asarray(np.random.RandomState(0).rand(8, 3),
                                         jnp.float32)], -1)
    cam = _camera([2.0, 1.5, 1.2], [0, 0, 0])
    frag, a_img = render_view_pallas(cam, mesh, tile=32, cap=256, chunk=64,
                                     interpret=True, vertex_attrs=attrs)
    ref = interpolate_vertex_attribute(frag, mesh, attrs)
    m = np.asarray(frag.valid)
    np.testing.assert_allclose(np.asarray(a_img)[m], np.asarray(ref)[m], atol=1e-4)
    # invalid pixels carry zeros from the kernel
    if (~m).any():
        assert np.abs(np.asarray(a_img)[~m]).max() < 1e-6


def test_annotate_views_batched_matches_single():
    """The throughput path (annotate_views: one fused Pallas dispatch over K
    views, in-kernel attribute interpolation) must agree with the per-view
    XLA path (annotate_view use_pallas=False) on every modality."""
    from omnidata_tpu.annotator import annotate_view, annotate_views
    from omnidata_tpu.cues.curvature import bake_curvature_colors

    base = room(size=4.0, height=2.5)
    rng = np.random.RandomState(0)
    colors = rng.rand(base.vertices.shape[0], 3).astype(np.float32) * 0.6 + 0.2
    mesh = from_arrays(
        np.asarray(base.vertices),
        np.asarray(base.faces[: base.num_faces]),
        vertex_colors=colors,
    )
    curv = bake_curvature_colors(mesh, rings=1)

    cams = [
        _camera([1.0, 0.5, 1.2], [0, 0, 0.5], fov=1.0),
        _camera([-0.8, 1.1, 1.6], [0.5, -0.5, 0.8], fov=1.2),
    ]
    batched = Camera(
        jnp.stack([c.location for c in cams]),
        jnp.stack([c.R for c in cams]),
        jnp.stack([c.fov for c in cams]),
        RES,
    )
    kw = dict(tile=32, cap=512, chunk=64)
    got = annotate_views(batched, mesh, curv, interpret=True, **kw)
    for i, cam in enumerate(cams):
        want = annotate_view(cam, mesh, curv, use_pallas=False, **kw)
        for k in want:
            g = np.asarray(got[k][i])
            w = np.asarray(want[k])
            assert g.shape == w.shape, (k, g.shape, w.shape)
            # integer-encoded images: tolerate conv-order rounding (1 lsb on
            # ~1% of pixels for edge cues; a few larger flips where the 16-bit
            # quantize lands on a boundary)
            diff = np.abs(g.astype(np.int64) - w.astype(np.int64))
            frac = float((diff > 0).mean())
            ok = (diff.max() <= 1 and frac < 0.02) or (
                diff.max() <= 32 and frac < 1e-3
            )
            assert ok, (k, diff.max(), frac)


def test_obj_mtl_per_face_materials(tmp_path):
    """obj+mtl loader: per-face material colors and material-name labels
    (create_rgb_images_obj_mtl.py / create_semantic_images_obj_mtl.py)."""
    from omnidata_tpu.mesh import load_obj_mtl, face_flat_colors

    (tmp_path / "scene.mtl").write_text(
        "newmtl wall_7\nKd 0.9 0.1 0.1\n"
        "newmtl floor_3\nKd 0.1 0.8 0.1\n"
    )
    # two quads side by side in the z=0 plane, different materials
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "v 1 0 0\nv 2 0 0\nv 2 1 0\nv 1 1 0\n"
        "usemtl wall_7\n"
        "f 1 2 3\nf 1 3 4\n"
        "usemtl floor_3\n"
        "f 5 6 7\nf 5 7 8\n"
    )
    mesh, names = load_obj_mtl(str(tmp_path / "scene.obj"))
    assert names == ["wall_7", "floor_3"]
    # faces are spatially reordered (Morton) at build; labels/colors stay
    # consistent per face
    fl = np.asarray(mesh.face_labels[: mesh.num_faces])
    assert sorted(fl) == [3, 3, 7, 7]  # trailing-int labels
    fc = np.asarray(mesh.face_colors[: mesh.num_faces])
    for lab, want in ((7, [0.9, 0.1, 0.1]), (3, [0.1, 0.8, 0.1])):
        np.testing.assert_allclose(fc[fl == lab],
                                   np.tile(want, (2, 1)), atol=1e-6)

    # rendered rgb shows both material colors; semantic shows both labels
    cam = _camera([1.0, 0.5, 2.0], [1.0, 0.5, 0.0], fov=1.1)
    frag = render_view(cam, mesh, tile=32, cap=256, chunk=32)
    img = np.asarray(face_flat_colors(frag, mesh))
    m = np.asarray(frag.valid)
    assert ((img[..., 0] > 0.8) & m).any() and ((img[..., 1] > 0.7) & m).any()
    lab = np.asarray(face_labels(frag, mesh))
    assert {3, 7} <= set(np.unique(lab[m]))


def test_obj_mtl_cli_rgb_semantic(tmp_path):
    """The annotator CLI renders rgb + semantic from an obj+mtl mesh."""
    import glob
    import os

    import omnidata_tpu.annotator.cli as cli

    (tmp_path / "scene.mtl").write_text(
        "newmtl a_1\nKd 1.0 0.0 0.0\nnewmtl b_2\nKd 0.0 0.0 1.0\n"
    )
    # the cube() helper's geometry (correct outward winding), materials
    # split half/half across its faces
    c = cube(size=1.0)
    v = np.asarray(c.vertices)
    f = np.asarray(c.faces[: c.num_faces])
    lines = ["mtllib scene.mtl"]
    for vv in v:
        lines.append(f"v {vv[0]} {vv[1]} {vv[2]}")
    lines.append("usemtl a_1")
    for ff in f[: len(f) // 2]:
        lines.append(f"f {ff[0]+1} {ff[1]+1} {ff[2]+1}")
    lines.append("usemtl b_2")
    for ff in f[len(f) // 2 :]:
        lines.append(f"f {ff[0]+1} {ff[1]+1} {ff[2]+1}")
    (tmp_path / "mesh.obj").write_text("\n".join(lines) + "\n")

    d = str(tmp_path)
    cli.main([
        "--model_path", d, "--task", "points",
        "with", "SCENE=False", "NUM_POINTS=2", "RESOLUTION=64",
        "MIN_VIEWS_PER_POINT=2", "MAX_VIEWS_PER_POINT=3",
        "MIN_NONFIXATED_AFTER_PRUNE=0",
    ])
    cli.main([
        "--model_path", d, "--task", "rgb",
        "with", "RESOLUTION=64", "RASTER_TILE=32", "RASTER_CAP=512",
        "RASTER_CHUNK=64",
    ])
    cli.main([
        "--model_path", d, "--task", "semantic",
        "with", "RESOLUTION=64", "RASTER_TILE=32", "RASTER_CAP=512",
        "RASTER_CHUNK=64",
    ])
    from PIL import Image

    rgbs = glob.glob(os.path.join(d, "rgb", "*.png"))
    sems = glob.glob(os.path.join(d, "semantic", "*.png"))
    assert rgbs and sems
    lab_vals = set()
    for p in sems:
        lab_vals |= set(np.unique(np.asarray(Image.open(p))))
    assert {1, 2} <= lab_vals  # both material labels rendered
    saw_red = saw_blue = False
    for p in rgbs:
        a = np.asarray(Image.open(p)).astype(int)
        saw_red |= bool(((a[..., 0] > 200) & (a[..., 2] < 50)).any())
        saw_blue |= bool(((a[..., 2] > 200) & (a[..., 0] < 50)).any())
    assert saw_red and saw_blue


def test_render_complete_on_dense_scene():
    """Regression: with more live faces than any fixed compaction cap, every
    candidate must still be considered (an earlier binned design silently
    dropped faces beyond a 4096 active-set on exactly this kind of interior
    scene — 30% wrong pixels). Cross-validates both render paths against the
    brute raycaster."""
    from omnidata_tpu.mesh import render_view_pallas, uv_sphere

    r = room(size=8.0, height=3.0)
    parts = [r,
             uv_sphere(radius=0.5, center=(1.5, 0.5, 0.8), n_lat=40, n_lon=80),
             uv_sphere(radius=0.4, center=(-1.0, -1.5, 0.6), n_lat=40, n_lon=80)]
    vs, fs, off = [], [], 0
    for p in parts:
        vs.append(np.asarray(p.vertices))
        fs.append(np.asarray(p.faces[: p.num_faces]) + off)
        off += p.vertices.shape[0]
    mesh = from_arrays(np.concatenate(vs), np.concatenate(fs))
    assert mesh.num_faces > 6000  # exceeds the old lossy active-set cap

    cam = _camera([2.5, 1.0, 1.4], [-1.0, -1.0, 0.8], fov=1.2, res=64)
    origin, dirs = camera_rays(cam)
    hits = raycast(jnp.broadcast_to(origin, (64 * 64, 3)),
                   dirs.reshape(-1, 3), mesh)
    hv = np.asarray(hits.valid)
    ht = np.asarray(hits.t)
    hf = np.asarray(hits.face)

    for name, frag in (
        # XLA path: per-tile capacity is a knob (a sphere can drop 6k+ faces
        # into one tile); the pallas chunk-list path has no face cap at all
        ("xla", render_view(cam, mesh, tile=32, cap=8192, chunk=128)),
        ("pallas", render_view_pallas(cam, mesh, tile=32, chunk=128,
                                      interpret=True)),
    ):
        fv = np.asarray(frag.valid).ravel()
        np.testing.assert_array_equal(fv, hv, err_msg=name)
        m = fv & hv
        np.testing.assert_allclose(np.asarray(frag.t).ravel()[m], ht[m],
                                   atol=1e-3, err_msg=name)
        mism = (np.asarray(frag.face).ravel()[m] != hf[m]).mean()
        assert mism < 2e-3, (name, mism)  # edge ties only


def test_streamed_kernel_matches_chunklist():
    """The HBM-streamed pack kernel (no mesh-size VMEM cap) must produce
    bit-identical fragments + attrs to the VMEM-resident chunk-list kernel —
    both the plain per-chunk sweep (compact=False) and the default
    face-compacting variant (compact auto-enables with streamed=True)."""
    from omnidata_tpu.mesh import render_views_fused

    mesh = room(size=4.0, height=2.5)
    locs = jnp.asarray([[1.0, 0.5, 1.2], [-0.8, 1.1, 1.6]])
    tg = jnp.asarray([[0, 0, 0.5], [0.5, -0.5, 0.8]])
    Rs = jax.vmap(look_at_rotation)(locs, tg)
    cams = Camera(locs, Rs, jnp.asarray([1.0, 1.2]), RES)
    attrs = mesh.vertex_normals
    fa, ia = render_views_fused(cams, mesh, tile=32, chunk=64, interpret=True,
                                vertex_attrs=attrs)
    m = np.asarray(fa.valid)
    # plain sweep / auto-compacting / compacting with a tiny stage cap
    # (forces the in-kernel re-stream fallback path)
    for kw in (dict(compact=False), dict(), dict(stage_cap=64)):
        fb, ib = render_views_fused(cams, mesh, tile=32, chunk=64,
                                    interpret=True, vertex_attrs=attrs,
                                    streamed=True, **kw)
        np.testing.assert_array_equal(m, np.asarray(fb.valid), err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(fa.face)[m],
                                      np.asarray(fb.face)[m], err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(fa.t)[m],
                                      np.asarray(fb.t)[m], err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(ia)[m], np.asarray(ib)[m],
                                      err_msg=str(kw))


def test_compact_kernel_matches_chunklist():
    """The face-compacting kernel (dense per-tile staging via MXU one-hot
    scatter) must be bit-identical to the plain chunk-list kernel — on the
    fast path AND when a tiny stage_cap forces the per-tile fallback sweep
    of the raw chunk list."""
    from omnidata_tpu.mesh import render_views_fused, uv_sphere

    r = room(size=6.0, height=3.0)
    s = uv_sphere(radius=0.6, center=(1.0, 0.4, 0.9), n_lat=32, n_lon=64)
    vs = np.concatenate([np.asarray(r.vertices), np.asarray(s.vertices)])
    fs = np.concatenate([np.asarray(r.faces[: r.num_faces]),
                         np.asarray(s.faces[: s.num_faces])
                         + r.vertices.shape[0]])
    mesh = from_arrays(vs, fs)
    locs = jnp.asarray([[1.5, 0.5, 1.2], [-0.8, 1.1, 1.6]])
    tg = jnp.asarray([[0.5, 0.2, 0.8], [0.5, -0.5, 0.8]])
    Rs = jax.vmap(look_at_rotation)(locs, tg)
    cams = Camera(locs, Rs, jnp.asarray([1.1, 1.3]), RES)
    attrs = mesh.vertex_normals
    ref_f, ref_i = render_views_fused(cams, mesh, tile=32, chunk=64,
                                      interpret=True, vertex_attrs=attrs,
                                      compact=False)
    for kw in (dict(), dict(stage_cap=64)):  # fast path / forced fallback
        f, i = render_views_fused(cams, mesh, tile=32, chunk=64,
                                  interpret=True, vertex_attrs=attrs,
                                  compact=True, **kw)
        np.testing.assert_array_equal(np.asarray(f.valid),
                                      np.asarray(ref_f.valid), err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(f.face),
                                      np.asarray(ref_f.face), err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(f.t), np.asarray(ref_f.t),
                                      err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i),
                                      err_msg=str(kw))


def test_sweep_y_skip_flags():
    """Per-pixel-block y-occupancy flags (pallas_raster._band_mask_and_flags):
    staged chunks confined to one pixel block's image rows are skipped by the
    sweep for the other block — winner-exact. White-box: the decode matches a
    numpy band test and actually zeroes for y-local geometry; e2e: a scene of
    horizontal strips renders bit-identical with compaction on and off."""
    from omnidata_tpu.mesh import pallas_raster, render_views_fused

    # white-box: tile=32 (4 bands), pblk=512 (2 blocks x 2 bands), tile row
    # ty=1 covers bands 4-7; block 0 bands 4-5, block 1 bands 6-7
    lo_by = np.array([0, 4, 6, 5, 0, 7], np.int32)
    hi_by = np.array([3, 5, 7, 6, 9, 7], np.int32)
    bb = jnp.asarray(2 | (5 << 8) | (lo_by << 16) | (hi_by << 24))[None, :]
    mf, flags = jax.jit(
        lambda b: pallas_raster._band_mask_and_flags(
            b, tx=jnp.int32(3), ty=jnp.int32(1), tile=32, pblk=512, nblocks=2)
    )(bb)
    np.testing.assert_array_equal(np.asarray(mf)[0], [0, 1, 1, 1, 1, 1])
    np.testing.assert_array_equal(np.asarray(flags),
                                  [[0, 1, 0, 1, 1, 0],   # block 0: bands 4-5
                                   [0, 0, 1, 1, 1, 1]])  # block 1: bands 6-7
    # x out of tile range kills both
    mf2, flags2 = jax.jit(
        lambda b: pallas_raster._band_mask_and_flags(
            b, tx=jnp.int32(7), ty=jnp.int32(1), tile=32, pblk=512, nblocks=2)
    )(bb)
    assert not np.asarray(mf2).any() and not np.asarray(flags2).any()

    # e2e: thin horizontal strips on a wall at y=0 (camera looks along -y,
    # so each strip's height range z maps to a narrow image-row band) ->
    # staged chunks are y-local and the sweep skips them for the other
    # pixel block; must stay bit-identical
    vs, fs = [], []
    for z in np.linspace(0.2, 2.0, 9):
        v0 = len(vs)
        vs.extend([[-2.0, 0.0, z], [2.0, 0.0, z],
                   [2.0, 0.0, z + 0.1], [-2.0, 0.0, z + 0.1]])
        fs.extend([[v0, v0 + 1, v0 + 2], [v0, v0 + 2, v0 + 3]])
    mesh = from_arrays(np.asarray(vs, np.float32),
                       np.asarray(fs, np.int32))
    locs = jnp.asarray([[0.0, 4.0, 1.1]])
    tg = jnp.asarray([[0.0, 0.0, 1.1]])
    Rs = jax.vmap(look_at_rotation)(locs, tg)
    cams = Camera(locs, Rs, jnp.asarray([1.0]), RES)
    ref = render_views_fused(cams, mesh, tile=32, chunk=64, interpret=True,
                             compact=False)
    out = render_views_fused(cams, mesh, tile=32, chunk=64, interpret=True,
                             compact=True)
    assert np.asarray(ref.valid).sum() > 200  # strips actually visible
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(out.face), np.asarray(ref.face))
    np.testing.assert_array_equal(np.asarray(out.t), np.asarray(ref.t))


def test_pallas_small_tile_pixel_block():
    """tile=16 has P=256 < the default 512 pixel block; the kernel must
    clamp the block size instead of running zero pixel blocks (regression:
    uninitialized outputs)."""
    from omnidata_tpu.mesh import render_view_pallas

    mesh = room(size=4.0, height=2.5)
    cam = _camera([1.0, 0.5, 1.2], [0, 0, 0.5], fov=1.0)
    a = render_view(cam, mesh, tile=16, cap=512, chunk=64)
    b = render_view_pallas(cam, mesh, tile=16, chunk=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    m = np.asarray(a.valid)
    np.testing.assert_array_equal(np.asarray(a.face)[m], np.asarray(b.face)[m])


def test_hierarchical_admission_matches_flat():
    """Two-stage (block -> chunk) admission must reproduce the flat
    per-chunk top_k admission bit for bit on non-overflow rows: the
    ids/counts arrays themselves are compared via raster.admission_lists
    on the same overlap matrix, and the end-to-end render is compared at a
    different tile size through render_views_fused(hier_min_chunks=...)
    (production only engages hier past 1024 chunks, where the flat
    (K*T, n_chunks) top_k is a near-full sort that dominated 584k-face
    renders)."""
    from omnidata_tpu.mesh import raster as raster_mod
    from omnidata_tpu.mesh import render_views_fused, uv_sphere

    r = room(size=6.0, height=3.0)
    s = uv_sphere(radius=0.7, center=(0.8, 0.2, 1.0), n_lat=40, n_lon=80)
    vs = np.concatenate([np.asarray(r.vertices), np.asarray(s.vertices)])
    fs = np.concatenate([np.asarray(r.faces[: r.num_faces]),
                         np.asarray(s.faces[: s.num_faces])
                         + r.vertices.shape[0]])
    mesh = from_arrays(vs, fs)
    locs = jnp.asarray([[1.2, 0.6, 1.3], [-0.9, 1.0, 1.5]])
    tg = jnp.asarray([[0.4, 0.1, 0.9], [0.6, -0.4, 0.7]])
    Rs = jax.vmap(look_at_rotation)(locs, tg)
    cams = Camera(locs, Rs, jnp.asarray([1.1, 1.3]), 96)
    attrs = mesh.vertex_normals

    # (a) direct ids/counts parity on a synthetic overlap matrix that
    # includes empty, sparse, dense and overflow rows
    rng = np.random.RandomState(7)
    n_chunks, ccap = 100, 24
    overlap = rng.rand(64, n_chunks) < rng.uniform(0.0, 0.5, (64, 1))
    overlap[0] = False
    overlap[1] = True  # overflow row
    tc = overlap.sum(-1).astype(np.int32)
    ids_f, cnt_f = raster_mod.admission_lists(
        jnp.asarray(overlap), jnp.asarray(tc), ccap, hier=False)
    ids_h, cnt_h = raster_mod.admission_lists(
        jnp.asarray(overlap), jnp.asarray(tc), ccap, hier=True)
    cnt_f, cnt_h = np.asarray(cnt_f), np.asarray(cnt_h)
    ids_f, ids_h = np.asarray(ids_f), np.asarray(ids_h)
    ok = cnt_h >= 0  # rows where hier returns an EXACT list
    np.testing.assert_array_equal(cnt_f[ok], cnt_h[ok])
    np.testing.assert_array_equal(ids_f[ok], ids_h[ok])

    def check_block_rows(cnt, ids, rows_):
        # block-mode rows (counts = -bcount-2): ascending Morton-block list
        # whose x8 expansion covers every truly-overlapping chunk
        for r in rows_:
            bcount = -int(cnt[r]) - 2
            assert bcount > 0
            blocks = ids[r, :bcount]
            assert (np.diff(blocks) > 0).all()  # ascending, no dupes
            expanded = (blocks[:, None] * 8 + np.arange(8)).ravel()
            true_chunks = np.nonzero(overlap[r])[0]
            assert np.isin(true_chunks, expanded).all()

    assert (~ok).sum() > 0  # the synthetic matrix includes an overflow row
    for r in np.nonzero(~ok)[0]:
        assert cnt_f[r] == -1  # ccap-overflow rows overflow the flat path too
    check_block_rows(cnt_h, ids_h, [r for r in np.nonzero(~ok)[0]
                                    if cnt_h[r] <= -2])

    # (a2) a binding expand_bcap: rows with more admitted blocks than the
    # stage-2 expansion width degrade to block mode (never to -1 scan-all
    # unless the block list itself overflows), and the expansion covers
    ids_e, cnt_e = raster_mod.admission_lists(
        jnp.asarray(overlap), jnp.asarray(tc), ccap, hier=True,
        expand_bcap=2)
    ids_e, cnt_e = np.asarray(ids_e), np.asarray(cnt_e)
    ovp = np.pad(overlap, ((0, 0), (0, (-n_chunks) % 8)))
    bc = (ovp.reshape(64, -1, 8).any(-1)).sum(-1)
    assert ((cnt_e >= 0) == ((bc <= 2) & (tc <= ccap))).all()
    assert (cnt_e != -1).all() or (bc[cnt_e == -1] > ccap).all()
    np.testing.assert_array_equal(cnt_e[cnt_e >= 0], cnt_f[cnt_e >= 0])
    np.testing.assert_array_equal(ids_e[cnt_e >= 0], ids_f[cnt_e >= 0])
    check_block_rows(cnt_e, ids_e, np.nonzero(cnt_e <= -2)[0])

    # (b) end-to-end: flat vs hierarchical render (different tile sizes ->
    # unique traces; decoded images are tile-layout independent)
    ref_f, ref_i = render_views_fused(cams, mesh, tile=32, chunk=64,
                                      interpret=True, vertex_attrs=attrs,
                                      compact=True, ccap=24,
                                      hier_min_chunks=10**9)
    f, i = render_views_fused(cams, mesh, tile=16, chunk=64,
                              interpret=True, vertex_attrs=attrs,
                              compact=True, ccap=24, hier_min_chunks=1)
    np.testing.assert_array_equal(np.asarray(f.valid), np.asarray(ref_f.valid))
    m = np.asarray(ref_f.valid)
    np.testing.assert_array_equal(np.asarray(f.face)[m],
                                  np.asarray(ref_f.face)[m])
    np.testing.assert_array_equal(np.asarray(f.t)[m], np.asarray(ref_f.t)[m])
    np.testing.assert_array_equal(np.asarray(i)[m], np.asarray(ref_i)[m])


def test_block_mode_overflow_matches_scan_all():
    """Tiles whose chunk list overflows ccap used to scan ALL chunks; with
    hier admission they now expand the Morton-BLOCK list instead
    (counts <= -2, pallas_raster._chunk_selector). Winners must be identical
    to the flat scan-all render: an admitted block's extra chunks stage/hit
    nothing (any face hitting a tile pixel has a bbox overlapping the tile,
    so its chunk is admitted). Exercised at ccap=4 so most tiles overflow,
    across the chunklist, compact and streamed(+compact) kernels."""
    from omnidata_tpu.mesh import render_views_fused, uv_sphere

    r = room(size=6.0, height=3.0)
    s = uv_sphere(radius=0.7, center=(0.6, 0.1, 1.2), n_lat=32, n_lon=64)
    vs = np.concatenate([np.asarray(r.vertices), np.asarray(s.vertices)])
    fs = np.concatenate([np.asarray(r.faces[: r.num_faces]),
                         np.asarray(s.faces[: s.num_faces])
                         + r.vertices.shape[0]])
    mesh = from_arrays(vs, fs)
    locs = jnp.asarray([[1.1, 0.5, 1.4], [-0.8, 0.9, 1.6]])
    tg = jnp.asarray([[0.3, 0.0, 1.0], [0.5, -0.3, 0.8]])
    Rs = jax.vmap(look_at_rotation)(locs, tg)
    cams = Camera(locs, Rs, jnp.asarray([1.2, 1.0]), 64)
    attrs = mesh.vertex_normals

    # sanity: ccap=4 actually produces block-mode rows on this scene —
    # replicate the pipeline's per-chunk tile-overlap test and assert the
    # admission actually emits counts <= -2 (otherwise the e2e comparison
    # below silently exercises only exact/scan-all paths)
    from omnidata_tpu.mesh import raster as raster_mod
    tris = mesh.vertices[mesh.faces]
    lo, hi, _ = raster_mod.face_screen_bboxes(
        Camera(locs[0], Rs[0], jnp.asarray(1.2), 64), mesh, tris_w=tris)
    chunk, tile, res = 64, 32, 64
    n1d = res // tile
    n_chunks = -(-mesh.faces.shape[0] // chunk)
    padF = n_chunks * chunk - mesh.faces.shape[0]
    lo_p = jnp.pad(lo, ((0, padF), (0, 0)), constant_values=1e9)
    hi_p = jnp.pad(hi, ((0, padF), (0, 0)), constant_values=-1e9)
    txs = jnp.arange(n1d) * tile
    ov_x = (hi_p[:, 0:1] >= txs[None]) & (lo_p[:, 0:1] <= txs[None] + tile)
    ov_y = (hi_p[:, 1:2] >= txs[None]) & (lo_p[:, 1:2] <= txs[None] + tile)
    ov = (ov_y.reshape(n_chunks, chunk, n1d, 1)
          & ov_x.reshape(n_chunks, chunk, 1, n1d)).any(1)  # (NC, Ty, Tx)
    overlap = ov.reshape(n_chunks, n1d * n1d).T  # (T, NC)
    _, counts = raster_mod.admission_lists(
        overlap, overlap.sum(-1), ccap=4, hier=True)
    assert (np.asarray(counts) <= -2).any(), np.asarray(counts)

    kwargs = dict(tile=32, chunk=64, interpret=True, vertex_attrs=attrs,
                  ccap=4)
    ref = None
    for kern in (dict(compact=False), dict(compact=True),
                 dict(streamed=True)):
        # flat (hier off) -> counts == -1 scan-all; hier -> block mode
        f_flat, i_flat = render_views_fused(
            cams, mesh, hier_min_chunks=10**9, **kwargs, **kern)
        f_blk, i_blk = render_views_fused(
            cams, mesh, hier_min_chunks=1, **kwargs, **kern)
        np.testing.assert_array_equal(np.asarray(f_blk.valid),
                                      np.asarray(f_flat.valid))
        m = np.asarray(f_flat.valid)
        np.testing.assert_array_equal(np.asarray(f_blk.face)[m],
                                      np.asarray(f_flat.face)[m])
        np.testing.assert_array_equal(np.asarray(f_blk.t)[m],
                                      np.asarray(f_flat.t)[m])
        np.testing.assert_array_equal(np.asarray(i_blk)[m],
                                      np.asarray(i_flat)[m])
        if ref is None:
            ref = (np.asarray(f_flat.valid), np.asarray(f_flat.face))
        else:  # all kernels agree with each other too
            np.testing.assert_array_equal(np.asarray(f_flat.valid), ref[0])
            np.testing.assert_array_equal(np.asarray(f_flat.face)[ref[0]],
                                          ref[1][ref[0]])

    # expand_bcap binding alone (ccap roomy): exact lists would fit, but the
    # narrow stage-2 expansion degrades those rows to block mode — still
    # bit-identical to the fully exact render
    f_ex, i_ex = render_views_fused(cams, mesh, tile=32, chunk=64,
                                    interpret=True, vertex_attrs=attrs,
                                    ccap=48, hier_min_chunks=1, compact=True,
                                    expand_bcap=1)
    f_ref, i_ref = render_views_fused(cams, mesh, tile=32, chunk=64,
                                      interpret=True, vertex_attrs=attrs,
                                      ccap=48, hier_min_chunks=10**9,
                                      compact=True)
    np.testing.assert_array_equal(np.asarray(f_ex.valid),
                                  np.asarray(f_ref.valid))
    m = np.asarray(f_ref.valid)
    np.testing.assert_array_equal(np.asarray(f_ex.face)[m],
                                  np.asarray(f_ref.face)[m])
    np.testing.assert_array_equal(np.asarray(i_ex)[m], np.asarray(i_ref)[m])


def test_kernel_view_subbatching_matches_single_dispatch():
    """render_views_fused splits the Pallas dispatch into view sub-batches
    when the per-tile SMEM chunk lists would overflow (max_views_per_kernel
    forces it here): results must be identical to one dispatch — the split
    slices per-view arrays only, the fold order within each tile is
    untouched."""
    from omnidata_tpu.mesh import render_views_fused, uv_sphere

    r = room(size=6.0, height=3.0)
    s = uv_sphere(radius=0.6, center=(0.5, 0.3, 1.1), n_lat=24, n_lon=48)
    vs = np.concatenate([np.asarray(r.vertices), np.asarray(s.vertices)])
    fs = np.concatenate([np.asarray(r.faces[: r.num_faces]),
                         np.asarray(s.faces[: s.num_faces])
                         + r.vertices.shape[0]])
    mesh = from_arrays(vs, fs)
    locs = jnp.asarray([[1.2, 0.6, 1.3], [-0.9, 1.0, 1.5], [0.3, -1.1, 1.0]])
    tg = jnp.asarray([[0.4, 0.1, 0.9], [0.6, -0.4, 0.7], [-0.2, 0.5, 1.2]])
    Rs = jax.vmap(look_at_rotation)(locs, tg)
    cams = Camera(locs, Rs, jnp.asarray([1.1, 1.3, 0.9]), 64)
    attrs = mesh.vertex_normals
    a_f, a_i = render_views_fused(cams, mesh, tile=32, chunk=64,
                                  interpret=True, vertex_attrs=attrs,
                                  ccap=24)
    b_f, b_i = render_views_fused(cams, mesh, tile=32, chunk=64,
                                  interpret=True, vertex_attrs=attrs,
                                  ccap=24, max_views_per_kernel=2)
    for name in ("valid", "face", "t", "bary"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a_f, name)), np.asarray(getattr(b_f, name)),
            err_msg=name)
    # attr interpolation: same winners/weights, but the decode's lerp is
    # free to fuse differently per dispatch shape (measured <= 1.2e-6)
    np.testing.assert_allclose(np.asarray(a_i), np.asarray(b_i), atol=1e-5)
