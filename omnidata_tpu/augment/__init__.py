from .refocus import (
    refocus_augmentation,
    refocus_image,
    separable_gaussian,
    compute_quantiles,
    compute_quantile_membership,
    compute_circle_of_confusion_no_magnification,
    get_blur_stack,
    composite_blur_stack,
)
from .image_augs import augment_rgb, sharpness, motion_blur, gaussian_blur, resize_crop
