from sherf_tpu.kernels.filters import (
    setup_filter,
    upfirdn2d,
    upsample2d,
    downsample2d,
    filter2d,
    bias_act,
    conv2d_resample,
    ACTIVATIONS,
)
from sherf_tpu.kernels.grid_sample import grid_sample_2d, grid_sample_3d
from sherf_tpu.kernels.knn import nn_1, nn_1_ref
from sherf_tpu.kernels.knn_pallas import nn_1_pallas
from sherf_tpu.kernels.occupancy import occupancy_mask

__all__ = [
    "setup_filter",
    "upfirdn2d",
    "upsample2d",
    "downsample2d",
    "filter2d",
    "bias_act",
    "conv2d_resample",
    "ACTIVATIONS",
    "grid_sample_2d",
    "grid_sample_3d",
    "nn_1",
    "nn_1_ref",
    "nn_1_pallas",
    "occupancy_mask",
]
