"""VGG19 perceptual loss plugin (reference ``criterions/perceptual.py``)."""

from __future__ import annotations

from latentpose_tpu.losses.common.perceptual_loss import PerceptualLoss
from latentpose_tpu.losses.common.util import strip_time


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--perc_weight", type=float, default=1e-2)

    @staticmethod
    def get_net(args):
        return Criterion(args.perc_weight, args.vgg_weights_dir,
                         compute_dtype=getattr(args, "compute_dtype",
                                               "float32"),
                         allow_random=getattr(args, "allow_random_vgg",
                                              False))


class Criterion:
    def __init__(self, perc_weight, vgg_weights_dir,
                 compute_dtype="float32", allow_random=False):
        self.perceptual_crit = PerceptualLoss(perc_weight, vgg_weights_dir,
                                              net="caffe",
                                              compute_dtype=compute_dtype,
                                              allow_random=allow_random)

    def __call__(self, data_dict):
        fake_rgb = strip_time(data_dict["fake_rgbs"])
        real_rgb = strip_time(data_dict["target_rgbs"])
        return {"VGG": self.perceptual_crit(fake_rgb, real_rgb)}
