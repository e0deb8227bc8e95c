from .dpt import DPTHybrid
from .unet import UNet
from .layers import resize_bilinear, resize_bicubic
from .convert import convert_dpt, convert_unet, strip_prefix
from .registry import (
    ModelBundle,
    create_model,
    dpt_hybrid_384,
    depth_dpt_hybrid_384,
    surface_normal_dpt_hybrid_384,
    surface_normal_unet,
    MODELS,
)
from .multitask import (
    MultiTaskModel,
    MTAN,
    PADNet,
    CrossStitch,
    HRNetLite,
    grad_norm_weights,
)
from .hrnet import HRNet, convert_hrnet
from .attention_blocks import ECA, ChannelAttention, CBAM
from .midas_net import MidasNetSmall
from .midas_full import MidasNet, MidasNetSmallTF, ResNeXt101Backbone, EfficientNetLite3Backbone
from .midas_transforms import midas_transform_v21, midas_transform_v21_small
from .tta import SurfaceNormalsTTA
