from .encode import (
    DEPTH_MAX_METERS,
    encode_depth_16bit,
    decode_depth_16bit,
    mask_valid_image,
    encode_normals_color,
    decode_normals_color,
    img_as_uint16,
    img_as_uint8,
    save_png,
    load_png,
)
from .reshading import reshade
from .edges import (
    gaussian_blur_constant,
    smooth_with_mask,
    sobel_magnitude,
    edge_texture,
    edge_occlusion,
)
from .keypoints2d import keypoints2d, integral_image, hessian_det_appx
from .vanishing import vanishing_points
from .keypoints3d import narf_interest_image, keypoints3d_from_depth_code
from .curvature import (
    vertex_principal_curvatures,
    clip_curvatures,
    curvature_colors,
    bake_curvature_colors,
)
from .segmentation import (
    felzenszwalb,
    rag_mean_color,
    cut_normalized,
    segment_2d,
    segment_25d,
)
