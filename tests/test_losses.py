"""Parity tests: JAX losses vs the reference torch implementations
(omnidata_tools/torch/losses/*.py), executed on identical random tensors."""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from omnidata_tpu.losses import (
    VNLParams,
    compute_scale_and_shift,
    gradient_matching_term,
    masked_cosine_angular_loss,
    masked_l1_loss,
    masked_mse_loss,
    masked_shift_and_scale,
    midas_loss,
    ssi_mae,
    vnl_from_indices,
)


@pytest.fixture(scope="module")
def ref_losses(reference_root):
    sys.path.insert(0, str(reference_root / "omnidata_tools" / "torch"))
    import losses.midas_loss as ml
    import losses.virtual_normal_loss as vnl

    yield ml, vnl
    sys.path.pop(0)


def _rand(shape, seed, positive=False, scale=1.0):
    rng = np.random.RandomState(seed)
    x = rng.rand(*shape).astype(np.float32) * scale
    return x + 0.1 if positive else x


def test_masked_l1_mse_parity(ref_losses):
    pred = _rand((2, 1, 16, 16), 0)
    gt = _rand((2, 1, 16, 16), 1)
    mask = _rand((2, 1, 16, 16), 2) > 0.3
    tp, tg, tm = map(torch.from_numpy, (pred, gt, mask))
    # reference masked_l1_loss mutates its input; use clones
    ref_l1 = float(
        __import__("losses.masked_losses", fromlist=["masked_l1_loss"]).masked_l1_loss(
            tp.clone(), tg, tm
        )
    )
    np.testing.assert_allclose(masked_l1_loss(pred, gt, mask), ref_l1, rtol=1e-5)
    ref_mse = float(
        __import__("losses.masked_losses", fromlist=["x"]).masked_mse_loss(
            tp.clone(), tg, tm
        )
    )
    np.testing.assert_allclose(masked_mse_loss(pred, gt, mask), ref_mse, rtol=1e-5)


def test_masked_cosine_angular_parity(ref_losses):
    pred = _rand((2, 3, 8, 8), 3)
    gt = _rand((2, 3, 8, 8), 4)
    mask = np.repeat(_rand((2, 1, 8, 8), 5) > 0.3, 3, axis=1)
    ref = float(
        __import__("losses.masked_losses", fromlist=["x"]).masked_cosine_angular_loss(
            torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask)
        )
    )
    got = masked_cosine_angular_loss(pred, gt, mask)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_shift_and_scale_parity(ref_losses):
    ml, _ = ref_losses
    pred = _rand((2, 1, 12, 12), 6, positive=True, scale=4.0)
    gt = _rand((2, 1, 12, 12), 7, positive=True, scale=4.0)
    mask = _rand((2, 1, 12, 12), 8) > 0.25
    rp, rg = ml.masked_shift_and_scale(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask)
    )
    jp, jg = masked_shift_and_scale(pred, gt, mask)
    np.testing.assert_allclose(jp, rp.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(jg, rg.numpy(), rtol=1e-4, atol=1e-5)


def test_compute_scale_and_shift_parity(ref_losses):
    ml, _ = ref_losses
    pred = _rand((3, 10, 10), 9, positive=True)
    gt = _rand((3, 10, 10), 10, positive=True)
    mask = _rand((3, 10, 10), 11) > 0.2
    r0, r1 = ml.compute_scale_and_shift(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask).float()
    )
    j0, j1 = compute_scale_and_shift(pred, gt, mask)
    np.testing.assert_allclose(j0, r0.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j1, r1.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduction", ["batch-based", "image-based"])
def test_gradient_matching_parity(ref_losses, reduction):
    ml, _ = ref_losses
    pred = _rand((2, 16, 16), 12, positive=True)
    gt = _rand((2, 16, 16), 13, positive=True)
    mask = _rand((2, 16, 16), 14) > 0.2
    ref_term = ml.GradientMatchingTerm(scales=4, reduction=reduction)
    ref = float(
        ref_term(
            torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask).float()
        )
    )
    got = gradient_matching_term(pred, gt, mask, scales=4, reduction=reduction)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_midas_loss_parity(ref_losses):
    ml, _ = ref_losses
    pred = _rand((2, 1, 16, 16), 15, positive=True, scale=8.0)
    gt = _rand((2, 1, 16, 16), 16, positive=True, scale=8.0)
    mask = _rand((2, 1, 16, 16), 17) > 0.2
    ref_mod = ml.MidasLoss(alpha=0.1)
    rt, rs, rr = ref_mod(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask)
    )
    jt, js, jr = midas_loss(pred, gt, mask, alpha=0.1)
    np.testing.assert_allclose(js, float(rs), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(jr, float(rr), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(jt, float(rt), rtol=1e-4, atol=1e-5)


def test_vnl_parity(ref_losses):
    _, vnl_mod = ref_losses
    H = W = 16
    gt = _rand((2, 1, H, W), 18, positive=True, scale=4.0)
    pred = _rand((2, 1, H, W), 19, positive=True, scale=4.0)

    params = VNLParams(focal_x=1.0, focal_y=1.0, input_size=(H, W))
    n = int(H * W * params.sample_ratio)
    rng = np.random.RandomState(20)
    p123 = rng.randint(0, H * W, size=(3, n))

    # Reference: build VNL_Loss but inject our fixed indices (np.int removed
    # from modern numpy, and the RNG differs — indices must match exactly).
    ref = vnl_mod.VNL_Loss(1.0, 1.0, (H, W))
    idx = {
        "p1_x": p123[0] % W, "p1_y": p123[0] // W,
        "p2_x": p123[1] % W, "p2_y": p123[1] // W,
        "p3_x": p123[2] % W, "p3_y": p123[2] // W,
    }
    ref.select_index = lambda: idx
    ref_val = float(ref(torch.from_numpy(gt), torch.from_numpy(pred)))

    got = vnl_from_indices(gt, pred, jnp.asarray(p123), params, select=True)
    np.testing.assert_allclose(got, ref_val, rtol=1e-3, atol=1e-5)


def test_losses_differentiable():
    import jax

    pred = jnp.asarray(_rand((1, 1, 8, 8), 21, positive=True))
    gt = jnp.asarray(_rand((1, 1, 8, 8), 22, positive=True))
    mask = jnp.asarray(_rand((1, 1, 8, 8), 23) > 0.3)

    g = jax.grad(lambda p: midas_loss(p, gt, mask)[0])(pred)
    assert np.isfinite(np.asarray(g)).all()

    params = VNLParams(1.0, 1.0, (8, 8))
    key = jax.random.PRNGKey(0)
    from omnidata_tpu.losses import virtual_normal_loss

    g2 = jax.grad(lambda p: virtual_normal_loss(gt, p, key, params))(pred)
    assert np.isfinite(np.asarray(g2)).all()


def test_zero_mask_safe():
    pred = jnp.ones((1, 1, 4, 4))
    gt = jnp.ones((1, 1, 4, 4))
    mask = jnp.zeros((1, 1, 4, 4), bool)
    assert float(masked_l1_loss(pred, gt, mask)) == 0.0
    t, s, r = midas_loss(pred, gt, mask)
    assert np.isfinite(float(t))
