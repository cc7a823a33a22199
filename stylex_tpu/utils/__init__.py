from stylex_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from stylex_tpu.utils.image import save_image_grid, to_uint8
from stylex_tpu.utils.logging import MetricLogger

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "save_image_grid",
    "to_uint8",
    "MetricLogger",
]
