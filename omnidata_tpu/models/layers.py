"""Shared NN building blocks for the Flax models.

TPU-first: NHWC layout everywhere (XLA's native conv layout), erf-GELU,
and align-corners bilinear resize implemented as two dense matmuls so it
rides the MXU instead of gathers (torch F.interpolate(align_corners=True)
has no jax.image equivalent).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _interp_matrix(n_out: int, n_in: int, align_corners: bool) -> np.ndarray:
    """Dense 1D linear-interpolation matrix A (n_out, n_in): y = A @ x."""
    A = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        A[:, 0] = 1.0
        return A
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = (i + 0.5) * n_in / n_out - 0.5
        src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        w = src - lo
        A[i, lo] += 1.0 - w
        A[i, hi] += w
    return A


def resize_bilinear(x: jax.Array, out_hw: tuple, align_corners: bool = False) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) arrays via dense interp matmuls.

    The dense (n_out, n_in) matrices multiply ~18 GFLOP/img of zeros across
    DPT-384 (two nonzero taps per output row), but on TPU that is the RIGHT
    trade: a two-tap gather-lerp variant measured 265 -> 170 img/s bf16
    end-to-end (r4) — XLA row-gathers along H/W of an NHWC activation are
    far slower than the MXU chewing a mostly-zero matmul, and they also
    erase the bf16/f32 gap (gather-bound). Keep the matmul form."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    # interp matrices in the activation dtype: f32 matrices would promote a
    # bf16 decoder to f32 matmuls (bf16 holds the 2-3 significant digits of
    # bilinear weights; the f32 path is untouched)
    Ah = jnp.asarray(_interp_matrix(h_out, h_in, align_corners), x.dtype)
    Aw = jnp.asarray(_interp_matrix(w_out, w_in, align_corners), x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", Ah, x)
    x = jnp.einsum("ow,...hwc->...hoc", Aw, x)
    return x


def resize_bicubic(x: jax.Array, out_hw: tuple) -> jax.Array:
    """Bicubic resize (half-pixel centers), matching torch's default."""
    return jax.image.resize(
        x, x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1]), method="cubic"
    )


class StdConv(nn.Module):
    """Weight-standardized conv with TF 'SAME' padding (timm StdConv2dSame).

    Standardization: per-output-channel zero-mean / unit-var over (kh,kw,in),
    eps 1e-6 — required for the ResNetV2 backbone of DPT-hybrid.
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features),
        )
        # standardize in f32 (bf16 mean/var over the kernel is too coarse),
        # then run the conv in the ACTIVATION dtype so bf16 inference hits
        # the MXU at bf16 throughput instead of promoting to f32
        w32 = w.astype(jnp.float32)
        mean = jnp.mean(w32, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w32, axis=(0, 1, 2), keepdims=True)
        w = ((w32 - mean) / jnp.sqrt(var + 1e-6)).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=self.strides,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class GroupNormAct(nn.Module):
    """GroupNorm(32) + optional ReLU (timm GroupNormAct)."""

    groups: int = 32
    act: bool = True

    @nn.compact
    def __call__(self, x):
        # f32 norm island (params stay f32 under the bf16 cast), output cast
        # back down so downstream matmuls keep the activation dtype
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="gn")(x).astype(x.dtype)
        return nn.relu(x) if self.act else x


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Standard ViT multi-head self-attention with fused qkv projection."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,N,h,d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(head_dim)
        # softmax in f32 (standard mixed-precision practice), back to the
        # activation dtype for the value matmul
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(self.dim, name="proj")(y)


class EncoderBlock(nn.Module):
    """Pre-norm transformer block: x + attn(ln(x)); x + mlp(ln(x))."""

    dim: int
    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        # LayerNorms are f32 islands (f32 params promote the stats); cast
        # back down so the qkv/mlp matmuls stay in the activation dtype
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x).astype(x.dtype)
        x = x + Attention(self.dim, self.num_heads, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x).astype(x.dtype)
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, name="mlp")(y)
        return x
