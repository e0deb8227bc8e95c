"""Reshading: Lambertian shading by a point light at the camera origin.

Physics match for the reference's Blender setup (create_albedo_images.py:51-141):
POINT lamp at the camera location, diffuse-only white material, no specular,
INVERSE_SQUARE falloff with half-life distance D (intensity(r) = E·D²/(D²+r²),
half of E at r = D), raw view transform, 8-bit BW output.
Defaults: E = 2.5, D = 8 m (settings.py:121-123, 'all' config).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

LAMP_ENERGY = 2.5
LAMP_HALF_LIFE_DISTANCE = 8.0


def reshade(
    t: jax.Array,
    n_world: jax.Array,
    ray_dirs: jax.Array,
    valid: jax.Array,
    energy: float = LAMP_ENERGY,
    half_life: float = LAMP_HALF_LIFE_DISTANCE,
) -> jax.Array:
    """Reshading image in [0,1] from fragments.

    t: (H,W) ray lengths · n_world: (H,W,3) surface normals ·
    ray_dirs: (H,W,3) unit rays from the camera · valid: hit mask.

    Light direction at a hit = -ray_dir; geometry term |cos| (Blender lights
    backfaces of single-sided scan meshes via normal flipping).
    """
    cos = jnp.abs(jnp.sum(n_world * (-ray_dirs), -1))
    d2 = half_life * half_life
    falloff = d2 / (d2 + t * t)
    img = energy * falloff * cos
    return jnp.where(valid, jnp.clip(img, 0.0, 1.0), 0.0)
