from bm2f_tpu.ops.interpolate import (
    resize_bilinear,
    resize_bilinear_dynamic,
    resize_nearest,
)
from bm2f_tpu.ops.sampling import grid_sample, point_sample
from bm2f_tpu.ops.deform_attn import ms_deform_attn

__all__ = [
    "resize_bilinear",
    "resize_bilinear_dynamic",
    "resize_nearest",
    "grid_sample",
    "point_sample",
    "ms_deform_attn",
]
