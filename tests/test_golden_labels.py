"""Golden-label parity: run our cue generators on the reference's published
input PNGs and compare against its published output PNGs
(omnidata_annotator/assets/{google-objects,hm3d}/ — rendered by the actual
Blender/skimage/PCL pipeline)."""
import numpy as np
import pytest

import jax.numpy as jnp

from omnidata_tpu.cues import edge_occlusion, edge_texture, img_as_uint16


def _png(path):
    from PIL import Image

    return np.asarray(Image.open(path))


@pytest.fixture(scope="module")
def assets(reference_root):
    return reference_root / "omnidata_annotator" / "assets"


@pytest.mark.parametrize("comp,pv", [
    ("google-objects", "point_21_view_5"),
    ("blendedMVG", "point_1006_view_0"),   # non-square real-scan component
])
def test_mask_valid_exact(assets, comp, pv):
    """mask_valid = 255 * (1 - (depth == 65535)) — exact byte parity."""
    base = assets / comp
    d = _png(base / f"{pv}_domain_depth_zbuffer.png").astype(np.uint32)
    ref = _png(base / f"{pv}_domain_mask_valid.png")
    if ref.ndim == 3:
        ref = ref[..., 0]
    ours = np.where(d == 65535, 0, 255).astype(np.uint8)
    assert (ours == ref).all()


def test_edge_texture_golden(assets):
    """canny-no-nonmax at the google_scanned sigma (1.0): corr > 0.999."""
    from PIL import Image

    base = assets / "google-objects"
    g = np.asarray(
        Image.open(base / "point_21_view_5_domain_rgb.png").convert("L"),
        np.float32,
    ) / 255.0
    ref = _png(base / "point_21_view_5_domain_edge_texture.png")
    ours = np.asarray(img_as_uint16(edge_texture(jnp.asarray(g), sigma=1.0)))
    corr = np.corrcoef(ours.ravel().astype(float), ref.ravel().astype(float))[0, 1]
    assert corr > 0.999, corr
    assert np.abs(ours.astype(float) - ref.astype(float)).mean() / 65535 < 1e-3


@pytest.mark.parametrize("pv", ["0_view_3", "12_view_1", "27_view_0"])
def test_edge_occlusion_exact(assets, pv):
    """sobel on sqrt depth with the reference's (actual) no-smoothing
    behavior — near-exact parity on real HM3D labels."""
    base = assets / "hm3d"
    d = _png(base / f"point_{pv}_domain_depth_zbuffer.png").astype(np.uint16)
    ref = _png(base / f"point_{pv}_domain_edge_occlusion.png")
    ours = np.asarray(img_as_uint16(edge_occlusion(jnp.asarray(d))))
    corr = np.corrcoef(ours.ravel().astype(float), ref.ravel().astype(float))[0, 1]
    assert corr > 0.9999, corr
    assert np.abs(ours.astype(float) - ref.astype(float)).mean() / 65535 < 1e-4


# Per-view FOV recovered by maximizing agreement between depth-derived
# normals and the published normal images (alignment cos > 0.97 at the
# optimum; the demo samples FOV per view and does not publish it).
_KP3D_FOV = {"0_view_3": 2.02, "12_view_1": 1.25, "27_view_0": 1.37}


@pytest.mark.parametrize("pv", ["0_view_3", "12_view_1", "27_view_0"])
def test_keypoints3d_golden(assets, pv):
    """Multi-scale NARF interest vs the published hm3d labels.

    Reproduces the reference's EXACT configuration, including its settings
    quirk: run-demo.sh renders depth with DEPTH_ZBUFFER_MAX_DISTANCE_METERS=8
    but the keypoints3d job (run-demo.sh:32-33) only passes
    KEYPOINT_SUPPORT_SIZE=0.3, so the NARF binary decodes the PNGs with the
    DEFAULT sensitivity (128 m / 2^16, settings.py:86-89) — depths 16x larger
    than true, making the effective support 0.3/16 m. Measured corr
    0.60-0.68, top-10% interest-mass capture 0.63-0.87 per view (a random
    10% region would capture 0.1)."""
    from omnidata_tpu.cues import keypoints3d_from_depth_code

    base = assets / "hm3d"
    d = _png(base / f"point_{pv}_domain_depth_zbuffer.png").astype(np.uint16)
    ref = _png(base / f"point_{pv}_domain_keypoints3d.png").astype(np.float64)
    ours = keypoints3d_from_depth_code(
        d, fov_rads=_KP3D_FOV[pv], resolution=512,
        support_size=0.3, max_meters=128.0,  # the reference's default decode
    )
    corr = np.corrcoef(ours.ravel().astype(float), ref.ravel())[0, 1]
    assert corr > 0.55, corr
    top10 = ours >= np.percentile(ours, 90)
    mass = ref[top10].sum() / max(ref.sum(), 1)
    assert mass > 0.5, mass


def _adjusted_rand(a, b):
    a = a.ravel()
    b = b.ravel()
    n = float(a.size)
    _, ai = np.unique(a, return_inverse=True)
    _, bi = np.unique(b, return_inverse=True)
    C = np.zeros((ai.max() + 1, bi.max() + 1), np.float64)
    np.add.at(C, (ai, bi), 1)
    sc = (C * (C - 1) / 2).sum()
    sa = (C.sum(1) * (C.sum(1) - 1) / 2).sum()
    sb = (C.sum(0) * (C.sum(0) - 1) / 2).sum()
    tot = n * (n - 1) / 2
    exp = sa * sb / tot
    mx = (sa + sb) / 2
    return (sc - exp) / (mx - exp)


@pytest.mark.parametrize("pv", ["point_0_view_3", "point_12_view_1"])
def test_segment_unsup25d_golden(reference_root, pv):
    """Full 2.5D segmentation pipeline against the published hm3d assets,
    fed the published depth/normal/edge_occlusion inputs for the same views
    (create_segmentation_25d_images.py:47-120). Label ids are arbitrary, so
    agreement is scored by adjusted Rand index; eigensolver/tie-break
    differences keep it below 1.0 (measured 0.90/0.92 on these views)."""
    from PIL import Image

    from omnidata_tpu.cues.segmentation import segment_25d

    base = reference_root / "omnidata_annotator/assets/hm3d"
    load = lambda dom: np.asarray(Image.open(base / f"{pv}_domain_{dom}.png"))
    ours = segment_25d(
        load("depth_zbuffer"), load("normal"), load("edge_occlusion")
    )
    gold = load("segment_unsup25d")
    n_ours = len(np.unique(ours))
    n_gold = len(np.unique(gold))
    assert abs(n_ours - n_gold) <= max(10, n_gold // 2), (n_ours, n_gold)
    assert _adjusted_rand(ours, gold) > 0.6


def test_keypoints2d_golden_taskonomy(assets):
    """Our DoH interest image vs the published taskonomy keypoints2d label,
    computed from the published rgb of the same view — pins the SURF
    box-filter constants end-to-end (corr measured 0.91; the published
    encoder rescales slightly, ratio ~0.93)."""
    from PIL import Image

    from omnidata_tpu.cues import img_as_uint16
    from omnidata_tpu.cues.keypoints2d import keypoints2d

    base = assets / "taskonomy"
    g = np.asarray(
        Image.open(base / "point_202_view_5_domain_rgb.png").convert("L"),
        np.float32,
    ) / 255.0
    ref = _png(base / "point_202_view_5_domain_keypoints2d.png").astype(float)
    ours = np.asarray(
        img_as_uint16(jnp.clip(keypoints2d(jnp.asarray(g)), 0, 1))
    ).astype(float)
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.85, corr


def test_segment_unsup2d_golden_taskonomy(assets):
    """Full 2D segmentation pipeline vs the published taskonomy label from
    the same rgb (ARI measured 0.68; our ncut splits finer than the
    reference's — label ids are arbitrary)."""
    from PIL import Image

    from omnidata_tpu.cues.segmentation import segment_2d

    base = assets / "taskonomy"
    rgb = np.asarray(Image.open(base / "point_21_view_2_domain_rgb.png"))
    gold = _png(base / "point_21_view_2_domain_segment_unsup2d.png")
    lab = segment_2d(rgb.astype(np.float64), scale=200.0, blur=3.0,
                     cut_thresh=0.005)
    assert _adjusted_rand(lab, gold) > 0.5
