from sherf_tpu.features.encoding import positional_encoding
from sherf_tpu.features.transformer import PlaneTransformer
from sherf_tpu.features.resnet import ResNet18
from sherf_tpu.features.stylegan2 import (
    EqualDense,
    MappingNetwork,
    SynthesisNetwork,
    StyleGAN2Backbone,
    modulated_conv2d,
    normalize_2nd_moment,
)
from sherf_tpu.features.sparseconv import SparseConvNet, prepare_voxel_volume
from sherf_tpu.features.stylegan3 import (
    SG3Generator,
    SynthesisInput,
)

__all__ = [
    "SG3Generator",
    "SynthesisInput",
    "positional_encoding",
    "PlaneTransformer",
    "ResNet18",
    "EqualDense",
    "MappingNetwork",
    "SynthesisNetwork",
    "StyleGAN2Backbone",
    "modulated_conv2d",
    "normalize_2nd_moment",
    "SparseConvNet",
    "prepare_voxel_volume",
]
