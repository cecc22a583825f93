from sherf_tpu.models.generator import SHERFGenerator

__all__ = ["SHERFGenerator"]
