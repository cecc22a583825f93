from sherf_tpu.data.synthetic import (SyntheticDataset, SyntheticHumanDataset,
    make_synthetic_batch, synthetic_camera)
from sherf_tpu.data.base import (
    HumanDataset, collate, sample_rays_for_image, get_bound_2d_mask,
)
from sherf_tpu.data.thuman import THumanDataset
from sherf_tpu.data.renderpeople import RenderPeopleDataset
from sherf_tpu.data.humman import HuMManDataset
from sherf_tpu.data.zju import ZJUMoCapDataset
from sherf_tpu.data.sampler import InfiniteSampler

DATASETS = {
    "thuman": THumanDataset,
    "renderpeople": RenderPeopleDataset,
    "humman": HuMManDataset,
    "zju": ZJUMoCapDataset,
    "synthetic_grid": SyntheticHumanDataset,
}

__all__ = [
    "make_synthetic_batch",
    "SyntheticDataset",
    "SyntheticHumanDataset",
    "synthetic_camera",
    "HumanDataset",
    "collate",
    "sample_rays_for_image",
    "get_bound_2d_mask",
    "THumanDataset",
    "RenderPeopleDataset",
    "HuMManDataset",
    "ZJUMoCapDataset",
    "InfiniteSampler",
    "DATASETS",
]
