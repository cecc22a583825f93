from sherf_tpu.compat.legacy_import import (
    import_resnet18,
    import_stylegan2_backbone,
    import_mapping,
    load_reference_pickle,
)

__all__ = [
    "import_resnet18",
    "import_stylegan2_backbone",
    "import_mapping",
    "load_reference_pickle",
]
