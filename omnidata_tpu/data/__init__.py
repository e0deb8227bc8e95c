from .masks import build_mask, dilate_invalid
