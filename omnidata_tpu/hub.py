"""torch.hub-style entry points (reference: torch.hub names in
omnidata_tools/torch/README.md:23-29). Each returns a ModelBundle
(module, variables, jitted apply)."""
from .models.registry import (
    depth_dpt_hybrid_384,
    dpt_hybrid_384,
    surface_normal_dpt_hybrid_384,
    surface_normal_unet,
)

__all__ = [
    "dpt_hybrid_384",
    "depth_dpt_hybrid_384",
    "surface_normal_dpt_hybrid_384",
    "surface_normal_unet",
]
