"""No-pose embedder (reference ``embedders/no_pose_encoder.py``): the FSTH
tower on RGB alone — for the pose-from-landmarks ablation with the FSTH_plus
generator."""

from __future__ import annotations

from latentpose_tpu.models.embedders.FSTH import Embedder as _FSTHEmbedder


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--embed_padding", type=str, default="zero")
        parser.add("--embed_num_blocks", type=int, default=6)
        parser.add("--average_function", type=str, default="sum")

    @staticmethod
    def get_net(args):
        return Embedder(
            num_channels=args.num_channels,
            max_num_channels=args.max_num_channels,
            embed_channels=args.embed_channels,
            num_blocks=args.embed_num_blocks,
            padding=args.embed_padding,
            average_function=args.average_function,
        )


class Embedder(_FSTHEmbedder):
    use_stickmen: bool = False
