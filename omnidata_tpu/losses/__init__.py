from .masked import masked_l1_loss, masked_mse_loss, masked_cosine_angular_loss
from .midas import (
    masked_shift_and_scale,
    ssi_mae,
    compute_scale_and_shift,
    gradient_matching_term,
    midas_loss,
)
from .virtual_normal import (
    VNLParams,
    virtual_normal_loss,
    vnl_from_indices,
    transfer_xyz,
    sample_triplets,
)
