"""Cue tests: encodings, reshading physics, edges vs scipy, DoH keypoints,
curvature on analytic spheres, segmentation sanity, vanishing points vs the
reference's golden JSON."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from omnidata_tpu.core import Camera, camera_rays, look_at_rotation
from omnidata_tpu.cues import (
    bake_curvature_colors,
    clip_curvatures,
    curvature_colors,
    cut_normalized,
    decode_depth_16bit,
    decode_normals_color,
    edge_occlusion,
    edge_texture,
    encode_depth_16bit,
    encode_normals_color,
    felzenszwalb,
    gaussian_blur_constant,
    keypoints2d,
    mask_valid_image,
    rag_mean_color,
    reshade,
    segment_2d,
    sobel_magnitude,
    vanishing_points,
    vertex_principal_curvatures,
)
from omnidata_tpu.mesh import (
    quad_plane,
    render_view,
    smooth_normals_world,
    uv_sphere,
    vertex_colors,
)


def test_depth_encoding_roundtrip():
    d = jnp.asarray([[0.5, 1.0], [127.9, 60.0]])
    valid = jnp.asarray([[True, True], [True, False]])
    code = encode_depth_16bit(d, valid)
    assert code.dtype == jnp.uint16
    assert int(code[1, 1]) == 65535  # invalid sentinel
    # sensitivity 1/512 m
    assert int(code[0, 1]) == round(1.0 / 128 * 65535)
    dec, v2 = decode_depth_16bit(code)
    np.testing.assert_allclose(dec[0, 0], 0.5, atol=1 / 512)
    assert not bool(v2[1, 1])


def test_mask_valid():
    m = mask_valid_image(jnp.asarray([[True, False]]))
    np.testing.assert_array_equal(np.asarray(m), [[255, 0]])


def test_normals_color_roundtrip():
    n = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    col = encode_normals_color(n)
    # facing camera -> (0.5, 0.5, 1.0) = blue-ish
    np.testing.assert_allclose(col[0], [0.5, 0.5, 1.0], atol=1e-6)
    # +x normal: R inverted -> 0
    np.testing.assert_allclose(col[1], [0.0, 0.5, 0.5], atol=1e-6)
    back = decode_normals_color(col)
    np.testing.assert_allclose(back, n, atol=1e-5)


def test_reshading_physics():
    # plane facing the camera at distance == half-life -> value = E/2 * cos
    mesh = quad_plane(size=100.0, z=0.0)
    loc = jnp.asarray([0.0, 0, 8.0])
    cam = Camera(loc, look_at_rotation(loc, jnp.asarray([0.0, 0, 0])), jnp.asarray(0.2), 32)
    frag = render_view(cam, mesh, tile=32, cap=256, chunk=32)
    n = smooth_normals_world(frag, mesh)
    _, dirs = camera_rays(cam)
    img = reshade(frag.t, n, dirs, frag.valid, energy=2.5, half_life=8.0)
    c = 16
    # at center: r ~ 8, cos ~ 1 -> 2.5 * 64/(64+64) = 1.25 -> clipped to 1.0
    np.testing.assert_allclose(img[c, c], 1.0, atol=0.01)
    img2 = reshade(frag.t, n, dirs, frag.valid, energy=1.0, half_life=8.0)
    np.testing.assert_allclose(img2[c, c], 0.5, atol=0.01)


def test_gaussian_matches_scipy():
    import scipy.ndimage as ndi

    x = np.random.RandomState(0).rand(33, 41).astype(np.float32)
    ref = ndi.gaussian_filter(x, 2.0, mode="constant")
    got = gaussian_blur_constant(jnp.asarray(x), 2.0)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sobel_magnitude_shape_and_border():
    x = np.zeros((16, 16), np.float32)
    x[:, 8:] = 1.0
    mag = np.asarray(sobel_magnitude(jnp.asarray(x), jnp.ones((16, 16), bool)))
    # vertical edge detected between cols 7 and 8
    assert mag[8, 7] > 0.5 and mag[8, 8] > 0.5
    # border eroded to zero
    assert mag[0, :].max() == 0 and mag[:, 0].max() == 0


def test_edge_texture_responds_to_edges():
    g = np.zeros((32, 32), np.float32)
    g[:, 16:] = 1.0
    e = np.asarray(edge_texture(jnp.asarray(g), sigma=3.0))
    assert e[16, 16] > 0.05
    assert e[16, 2] < e[16, 16] / 5


def test_edge_occlusion_masks_invalid():
    code = np.full((16, 16), 1000, np.uint16)
    code[:, 8:] = 65535  # invalid
    e = np.asarray(edge_occlusion(jnp.asarray(code)))
    # all-invalid region and its eroded boundary produce 0
    assert e[:, 9:].max() == 0


def test_keypoints2d_blob_response():
    # a bright disk on dark background: DoH response peaks near the center
    H = 64
    yy, xx = np.mgrid[0:H, 0:H]
    img = ((yy - 32) ** 2 + (xx - 32) ** 2 < 8**2).astype(np.float32)
    resp = np.asarray(keypoints2d(jnp.asarray(img)))
    cy, cx = np.unravel_index(resp.argmax(), resp.shape)
    assert abs(cy - 32) <= 3 and abs(cx - 32) <= 3
    assert resp.max() > 0


def test_curvature_on_sphere():
    mesh = uv_sphere(radius=0.5, n_lat=32, n_lon=64)
    v = np.asarray(mesh.vertices)
    f = np.asarray(mesh.faces[: mesh.num_faces])
    vn = np.asarray(mesh.vertex_normals)
    k1, k2 = vertex_principal_curvatures(v, f, vn, rings=2)
    # analytic: k1 = k2 = +1/0.5 = +2 — convex w.r.t. outward normals is
    # POSITIVE (MeshLab APSS convention; published labels encode convex
    # bright, create_curvature_images.py:183-222)
    interior = np.abs(v[:, 2]) < 0.45  # away from pole triangulation artifacts
    med1 = np.median(k1[interior])
    med2 = np.median(k2[interior])
    assert 1.5 < med1 < 2.5, med1
    assert 1.5 < med2 < 2.5, med2


def _grid_faces(nu: int, nv: int, wrap_u=False, wrap_v=False):
    """Triangulate an (nu, nv) vertex grid (optionally periodic)."""
    faces = []
    mu = nu if wrap_u else nu - 1
    mv = nv if wrap_v else nv - 1
    for i in range(mu):
        for j in range(mv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [[a, b, c], [a, c, d]]
    return np.asarray(faces, np.int64)


def test_curvature_on_torus():
    """Torus R=1, r=0.3 with analytic outward normals: the tube direction has
    K1 = +1/r everywhere; K2 = cos(theta)/(R + r cos(theta)) flips sign
    between the outer (convex, +1/(R+r)) and inner (saddle, -1/(R-r))
    equators — pins sign AND K1>=K2 ordering on real curved geometry
    (VERDICT r2 #6; reference APSS: create_curvature_meshes.py:17-52)."""
    R, r = 1.0, 0.3
    nu, nv = 96, 48  # around the ring, around the tube
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    th = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    U, T = np.meshgrid(u, th, indexing="ij")
    cx = (R + r * np.cos(T)) * np.cos(U)
    cy = (R + r * np.cos(T)) * np.sin(U)
    cz = r * np.sin(T)
    v = np.stack([cx, cy, cz], -1).reshape(-1, 3)
    vn = np.stack(
        [np.cos(T) * np.cos(U), np.cos(T) * np.sin(U), np.sin(T)], -1
    ).reshape(-1, 3)
    f = _grid_faces(nu, nv, wrap_u=True, wrap_v=True)
    k1, k2 = vertex_principal_curvatures(v, f, vn, rings=2)
    theta = T.reshape(-1)
    k_tube = 1.0 / r                              # 3.333
    k_ring = np.cos(theta) / (R + r * np.cos(theta))
    ka = np.maximum(k_tube, k_ring)               # analytic K1 (max)
    kb = np.minimum(k_tube, k_ring)               # analytic K2 (min)
    assert np.all(k1 >= k2 - 1e-9)                # ordering invariant
    assert np.median(np.abs(k1 - ka)) < 0.35 * k_tube
    assert np.median(np.abs(k2 - kb)) < 0.35 * k_tube
    outer = np.abs(theta) < 0.2                   # convex equator: K2 > 0
    inner = np.abs(theta - np.pi) < 0.2           # inner equator: K2 < 0
    assert np.median(k2[outer]) > 0.3             # ~ +0.77
    assert np.median(k2[inner]) < -0.6            # ~ -1.43
    assert np.median(k1[outer]) > 2.0             # tube curvature ~ +3.33


def test_curvature_on_hyperbolic_paraboloid():
    """Saddle z = (x^2 - y^2)/2 with normals ~ +z at origin: K1 = +1 > 0 >
    K2 = -1 — a genuinely anisotropic K1>0>K2 case the sphere can't probe."""
    n = 41
    s = np.linspace(-1.0, 1.0, n)
    X, Y = np.meshgrid(s, s, indexing="ij")
    Z = 0.5 * (X ** 2 - Y ** 2)
    v = np.stack([X, Y, Z], -1).reshape(-1, 3)
    # analytic normal of z - f(x,y): (-fx, -fy, 1)/norm = (-x, y, 1)/norm
    nrm = np.stack([-X, Y, np.ones_like(X)], -1).reshape(-1, 3)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    f = _grid_faces(n, n)
    k1, k2 = vertex_principal_curvatures(v, f, nrm, rings=2)
    centre = (np.abs(v[:, 0]) < 0.15) & (np.abs(v[:, 1]) < 0.15)
    assert np.median(k1[centre]) == pytest.approx(1.0, abs=0.15)
    assert np.median(k2[centre]) == pytest.approx(-1.0, abs=0.15)
    assert np.all(k1[centre] > 0) and np.all(k2[centre] < 0)


def test_curvature_channel_semantics():
    """R = K1, G = K2, B = 0; convex (positive) encodes bright > 0.5
    (map_to_color 'principal', create_curvature_images.py:201-222)."""
    col = curvature_colors(np.asarray([10.0]), np.asarray([-10.0]), 0.03)
    assert col[0, 0] > 0.5 > col[0, 1]            # K1 bright, K2 dark
    assert col[0, 2] == 0
    # convex sphere bakes bright in both channels
    baked = bake_curvature_colors(uv_sphere(radius=0.2, n_lat=24, n_lon=48),
                                  rings=2)
    c = np.asarray(baked.vertex_colors)
    interior = np.abs(np.asarray(baked.vertices)[:, 2]) < 0.18
    assert np.median(c[interior, 0]) > 0.5
    assert np.median(c[interior, 1]) > 0.5


def test_curvature_color_map():
    k = np.asarray([0.0])
    col = curvature_colors(k, k, min_radius=0.03)
    # zero curvature maps to (127/255-ish) mid-grey in R,G
    np.testing.assert_allclose(col[0, :2], [np.round(0.5 * 254) / 255.0] * 2)
    assert col[0, 2] == 0
    np.testing.assert_array_equal(clip_curvatures(np.asarray([100.0]), 0.03), [1 / 0.03])


def test_bake_and_render_curvature():
    mesh = bake_curvature_colors(uv_sphere(radius=0.5, n_lat=16, n_lon=24), rings=2)
    loc = jnp.asarray([0.0, 0, 2.0])
    cam = Camera(loc, look_at_rotation(loc, jnp.zeros(3)), jnp.asarray(0.6), 32)
    frag = render_view(cam, mesh, tile=32, cap=2048, chunk=64)
    img = vertex_colors(frag, mesh)
    m = np.asarray(frag.valid)
    assert m.any()
    vals = np.asarray(img)[m]
    assert np.all(vals[:, 2] == 0)  # B channel empty
    assert vals[:, 0].std() >= 0  # well-defined


def test_felzenszwalb_segments_two_regions():
    # float inputs are [0,1]-scale (img_as_float convention); felzenszwalb
    # lifts costs to 0-255 internally
    img = np.zeros((24, 24), np.float64)
    img[:, 12:] = 0.5
    labels = felzenszwalb(img, scale=1.0, sigma=0.0, min_size=5)
    assert len(np.unique(labels)) == 2
    assert (labels[:, :12] == labels[0, 0]).all()


def test_segment_2d_pipeline():
    rng = np.random.RandomState(0)
    # uint8 rgb as the reference feeds it (create_segmentation_2d_images.py)
    img = (rng.rand(32, 33) * 2.0).astype(np.uint8)
    img[:, 11:22] += 128
    img[:, 22:] += 253
    labels = segment_2d(img, scale=50.0, blur=0.5, cut_thresh=0.005)
    assert labels.shape == (32, 33)
    assert len(np.unique(labels)) >= 3


def test_vanishing_points_golden(reference_root):
    view = json.load(
        open(reference_root / "omnidata_annotator/assets/taskonomy/point_202_view_5_domain_point_info.json")
    )
    img_vps, sphere_vps = vanishing_points(view, resolution=view.get("resolution", 512))
    ref = view["vanishing_points_gaussian_sphere"]
    got = {k: np.asarray(v) for k, v in zip("xyz", sphere_vps)}
    for axis in "xyz":
        np.testing.assert_allclose(got[axis], ref[axis], atol=1e-5)


def test_keypoints3d_native_and_numpy_agree():
    from omnidata_tpu.cues import narf_interest_image

    # synthetic scene: a step edge + a corner in depth
    H = W = 48
    depth = np.full((H, W), 3.0, np.float32)
    depth[20:, 24:] = 1.5  # box corner at (20, 24)
    native = narf_interest_image(depth, focal_px=40.0, support_size=0.5,
                                 backend="native")
    fallback = narf_interest_image(depth, focal_px=40.0, support_size=0.5,
                                   backend="numpy")
    assert native.shape == (H, W)
    assert native.max() > 0.05  # geometry produces interest
    # both implementations highlight the same structures (small residuals
    # at degenerate-covariance corners: power-iteration vs eigh eigvecs)
    np.testing.assert_allclose(native, fallback, atol=0.2)
    assert np.corrcoef(native.ravel(), fallback.ravel())[0, 1] > 0.8
    c_n = np.unravel_index(native.argmax(), native.shape)
    c_f = np.unravel_index(fallback.argmax(), fallback.shape)
    assert abs(c_n[0] - c_f[0]) <= 4 and abs(c_n[1] - c_f[1]) <= 4


def test_keypoints3d_driver_contract():
    from omnidata_tpu.cues import keypoints3d_from_depth_code

    code = np.full((32, 32), int(2.0 * 512), np.uint16)
    code[16:, 16:] = int(1.0 * 512)
    out = keypoints3d_from_depth_code(code, fov_rads=1.0, resolution=32,
                                      support_size=0.5)
    assert out.dtype == np.uint16 and out.shape == (32, 32)


def test_keypoints2d_matches_direct_convolution():
    """The gather-free integral-image box sums must equal a dense correlation
    with explicitly constructed SURF box kernels (independent compute path;
    validates every slice offset in hessian_det_appx)."""
    import scipy.ndimage as ndi
    from omnidata_tpu.cues.keypoints2d import (
        _pad_integral, hessian_det_appx, integral_image,
    )

    rng = np.random.RandomState(0)
    img = rng.rand(64, 64)
    H, W = img.shape
    padded = _pad_integral(integral_image(jnp.asarray(img, jnp.float32)))

    for sigma in (2.0, 5.0, 10.0):
        size = int(3 * sigma)
        s2 = (size - 1) // 2
        s3 = size // 3
        w_i = 1.0 / (size * size)
        off = size + 2
        K = 2 * off + 1

        def kern(regions):
            k = np.zeros((K, K))
            for (r0, c0, rl, cl), wgt in regions:
                k[off + r0 : off + r0 + rl, off + c0 : off + c0 + cl] += wgt
            return k

        k_xy = kern([((-s3, -s3, s3, s3), 1), ((1, 1, s3, s3), 1),
                     ((1, -s3, s3, s3), -1), ((-s3, 1, s3, s3), -1)]) * w_i
        k_xx = kern([((-s3 + 1, -s2, 2 * s3 - 1, size), -1),
                     ((-s3 + 1, -(s3 // 2), 2 * s3 - 1, s3), 3)]) * w_i
        k_yy = kern([((-s2, -s3 + 1, size, 2 * s3 - 1), -1),
                     ((-(s3 // 2), -s3 + 1, s3, 2 * s3 - 1), 3)]) * w_i

        conv = lambda k: ndi.correlate(img, k, mode="constant")
        want = conv(k_xx) * conv(k_yy) - 0.81 * conv(k_xy) ** 2
        got = np.asarray(hessian_det_appx(padded, H, W, sigma))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_keypoints2d_detects_blob_centers_and_scales():
    """Behavioral check (what the cue is for): DoH max-over-scales response
    peaks at gaussian blob centers, and a larger blob produces a response at
    least as spread out."""
    from omnidata_tpu.cues.keypoints2d import keypoints2d

    H = W = 96
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.zeros((H, W))
    blobs = [(24, 24, 3.0), (70, 60, 8.0)]
    for (cy, cx, s) in blobs:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    resp = np.asarray(keypoints2d(jnp.asarray(img, jnp.float32)))
    # response maxima land within 3 px of each blob center
    for (cy, cx, s) in blobs:
        r = resp[cy - 12 : cy + 12, cx - 12 : cx + 12]
        py, px = np.unravel_index(np.argmax(r), r.shape)
        assert abs(py - 12) <= 3 and abs(px - 12) <= 3, (cy, cx, py, px)
    # both blobs clearly above background
    bg = np.median(resp)
    for (cy, cx, s) in blobs:
        assert resp[cy, cx] > bg + 0.1 * resp.max()


def test_felzenszwalb_native_matches_python():
    """The C++ Kruskal core must be bit-identical to the Python reference
    loop (same stable tie order), including quantized inputs with many
    equal-cost edges."""
    from omnidata_tpu.cues.segmentation import felzenszwalb

    rng = np.random.RandomState(0)
    cases = [
        rng.rand(48, 53, 5),
        (rng.rand(40, 41) * 4).astype(np.uint8),
    ]
    for img in cases:
        a = felzenszwalb(img, scale=50.0, sigma=0.5, min_size=20,
                         backend="python")
        try:
            b = felzenszwalb(img, scale=50.0, sigma=0.5, min_size=20,
                             backend="native")
        except Exception:
            pytest.skip("no native toolchain")
        np.testing.assert_array_equal(a, b)


def test_narf_device_borders_match_numpy_twin():
    """Device border prefix (narf_device.py, the jitted TPU half of the
    split keypoints3d pipeline) vs the validated numpy twin, level by
    level. Eigensolvers differ (closed-form vs eigh) and the device
    quantizes for transfer, so: tight change tolerance, exact shadows,
    direction alignment up to the sign ambiguity."""
    from omnidata_tpu.cues import keypoints3d as kp
    from omnidata_tpu.cues import narf_device as nd

    H = W = 48
    depth = np.full((H, W), 3.0, np.float32)
    depth[20:, 24:] = 1.5
    depth[5:15, 5:15] = 2.2
    focal = 40.0

    levels = [kp._level0(depth, focal, W / 2.0, H / 2.0, 128.0)]
    while 0.5 * levels[-1].ar < np.deg2rad(2.0) and min(
        levels[-1].W, levels[-1].H
    ) >= 16:
        levels.append(kp._half(levels[-1]))
    maps = nd.border_maps_for_views(depth[None], np.array([focal]), 128.0)[0]
    assert len(maps) == len(levels) == nd.n_levels_for(focal, H, W)
    for li, L in enumerate(levels):
        ch_t, cd_t, sh_t, _ = kp._extract_borders(L)
        ch_d = maps[li][0].astype(np.float32) / 65535.0
        cd_d = maps[li][1].astype(np.float32) / 127.0
        np.testing.assert_allclose(ch_d, ch_t, atol=2e-3)
        np.testing.assert_array_equal(maps[li][2] > 0, sh_t)
        strong = (np.linalg.norm(cd_t, axis=-1) > 0.5) & (ch_t > 0.05)
        if strong.any():
            dots = np.abs(np.sum(cd_t * cd_d, -1))[strong]
            assert np.percentile(dots, 5) > 0.95, np.percentile(dots, 5)


def test_keypoints3d_hybrid_matches_native():
    """Split pipeline (device borders + host interest) vs the full native
    path — the same tolerance contract as native-vs-numpy."""
    from omnidata_tpu.cues import narf_device as nd
    from omnidata_tpu.cues.keypoints3d import (
        narf_interest_image,
        narf_interest_with_maps,
    )

    H = W = 48
    depth = np.full((H, W), 3.0, np.float32)
    depth[20:, 24:] = 1.5
    native = narf_interest_image(depth, focal_px=40.0, support_size=0.5,
                                 backend="native")
    maps = nd.border_maps_for_views(depth[None], np.array([40.0]), 128.0)[0]
    hybrid = narf_interest_with_maps(depth, 40.0, maps, support_size=0.5)
    assert hybrid.shape == (H, W) and hybrid.max() > 0.05
    np.testing.assert_allclose(hybrid, native, atol=0.2)
    assert np.corrcoef(hybrid.ravel(), native.ravel())[0, 1] > 0.8


def test_seg2d_device_blur_matches_host():
    """Device blur maps (seg_device.seg2d_blur_maps) vs the host gaussian
    felzenszwalb applies internally: numeric agreement within quantization,
    and identical-to-high-ARI segmentations through the full pipeline."""
    import scipy.ndimage as ndi

    from omnidata_tpu.cues.seg_device import (
        seg2d_blur_maps,
        seg2d_blurred_from_maps,
    )
    from omnidata_tpu.cues.segmentation import segment_2d

    rng = np.random.RandomState(3)
    img = (rng.rand(48, 40, 3) * 40).astype(np.uint8)
    img[12:30, 8:24] += 120
    img[34:, 28:] += 180
    sigma = 3.0

    q = np.asarray(seg2d_blur_maps(jnp.asarray(img[None]), sigma=sigma))[0]
    blurred = seg2d_blurred_from_maps(q)
    ref = np.stack([ndi.gaussian_filter(img[..., c].astype(np.float64), sigma)
                    for c in range(3)], -1)
    # u16 quantization step of the 0-255 scale is 255/65535 ~ 0.0039
    np.testing.assert_allclose(blurred, ref, atol=0.02)

    host = segment_2d(img, scale=50.0, blur=sigma, cut_thresh=0.005)
    dev = segment_2d(img, scale=50.0, blur=sigma, cut_thresh=0.005,
                     blurred255=blurred)
    from test_golden_labels import _adjusted_rand

    assert _adjusted_rand(host, dev) > 0.9


def test_seg25d_device_channels_match_host():
    """Device channel maps (seg_device.seg25d_channel_maps) vs the host
    masked-smoothing path of segment_25d: channel numerics within
    quantization and high-ARI end-to-end labels."""
    import scipy.ndimage as ndi

    from omnidata_tpu.cues.seg_device import (
        seg25d_channel_maps,
        seg25d_input_from_maps,
    )
    from omnidata_tpu.cues.segmentation import segment_25d

    rng = np.random.RandomState(7)
    H, W = 48, 40
    depth = np.full((H, W), int(3.0 * 512), np.uint16)
    depth[20:, 24:] = int(1.2 * 512)
    depth[:4, :6] = 65535  # invalid sky pixels exercise the mask
    normal = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    normal[20:, 24:] //= 3
    edge = (rng.rand(H, W) * 5000).astype(np.uint16)

    q = np.asarray(seg25d_channel_maps(
        jnp.asarray(depth[None]), jnp.asarray(normal[None]),
        jnp.asarray(edge[None])))[0]
    w_d, w_n, w_e = 2.0, 1.0, 10.0
    inp = seg25d_input_from_maps(q, w_d, w_n, w_e)

    # host reference channels (segment_25d's own masked smoothing)
    mask = (depth.astype(np.float64) < 2**16 - 2).astype(np.float64)
    eps = np.finfo(np.float32).eps

    def sm(x, s):
        return ndi.gaussian_filter(x * mask, s, mode="constant") / (
            ndi.gaussian_filter(mask, s, mode="constant") + eps)

    ch0 = sm(np.log(np.maximum(depth.astype(np.float64), 1.0)) / 16.0, 1.0)
    chn = np.stack([sm(normal[..., c].astype(np.float64) / 255.0, 2.0)
                    for c in range(3)], -1)
    ch4 = edge.astype(np.float64) / 255.0 / 255.0
    ref = np.concatenate([w_d * ch0[..., None], w_n * chn,
                          w_e * ch4[..., None]], -1)
    np.testing.assert_allclose(inp, ref, atol=0.02)

    host = segment_25d(depth, normal, edge)
    dev = segment_25d(depth, normal, edge, input_img=inp)
    from test_golden_labels import _adjusted_rand

    assert _adjusted_rand(host, dev) > 0.9
