from latentpose_tpu.ops.norms import (adain, instance_norm,
                                      instance_norm_affine)
from latentpose_tpu.ops.image import (avg_pool_2x, crop_and_resize,
                                      grid_sample_bilinear, resize_bilinear,
                                      upsample_nearest_2x)
from latentpose_tpu.ops.spectral_norm import SNConv, SNDense, SNEmbed
from latentpose_tpu.ops.resample import (affine_resample,
                                         resample_axis_aligned)

__all__ = [
    "adain", "instance_norm", "instance_norm_affine",
    "avg_pool_2x", "crop_and_resize", "grid_sample_bilinear",
    "resize_bilinear", "upsample_nearest_2x",
    "SNConv", "SNDense", "SNEmbed",
    "affine_resample", "resample_axis_aligned",
]
