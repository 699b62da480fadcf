"""X2Face-pretrained-pose embedder (reference
``embedders/X2Face_pretrained_embResNeXt.py``): ResNeXt-50 identity encoder
+ a *frozen* X2Face driving-network bottleneck as the pose descriptor
(reference monkeypatches ``.train``/``.parameters`` to freeze it,
``:30-52``; pose = ``get_sampler(x, latent_pose_vector_only=True)[:,:,0,0]``
``:80-83``).

Freezing here is functional: the pose vector is stop-gradiented, so the
frozen sub-network's parameters receive exactly zero gradient (Adam leaves
them unchanged).  Paper-parity pose vectors require converting the X2Face
release weights; without them the sub-network is randomly initialized and a
warning is raised.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import flax.linen as nn

from latentpose_tpu.nn.backbones import ResNeXt50
from latentpose_tpu.nn.unet import UNet

logger = logging.getLogger("latentpose_tpu.models.x2face_emb")


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--average_function", type=str, default="sum")

    @staticmethod
    def get_net(args):
        from latentpose_tpu.utils.weights import find_weights_file
        if find_weights_file("x2face.npz") is None:
            logger.warning(
                "X2Face_pretrained_embResNeXt: converted X2Face weights "
                "(x2face.npz) not found — the frozen pose encoder is "
                "randomly initialized (ablation plumbing only; WEIGHTS.md)")
        return Embedder(
            identity_embedding_size=args.embed_channels,
            pose_embedding_size=args.pose_embedding_size,
            average_function=args.average_function,
        )


class Embedder(nn.Module):
    INPUT_KEYS = ("enc_rgbs", "pose_input_rgbs")
    # the pose path is the X2Face *driving* UNet (reference ``:80-83``)
    PRETRAINED = (("pose_unet", "x2face.npz", "driving_net"),)

    identity_embedding_size: int = 512
    pose_embedding_size: int = 256
    average_function: str = "sum"
    dtype: Any = None

    def setup(self):
        self.identity_encoder = ResNeXt50(
            num_classes=self.identity_embedding_size)
        self.pose_unet = UNet(out_features=2)
        self.pose_proj = nn.Dense(self.pose_embedding_size,
                                  name="pose_proj")

    def get_identity_embedding(self, enc_rgbs, train: bool = False):
        b, k, h, w, c = enc_rgbs.shape
        emb = self.identity_encoder(enc_rgbs.reshape(b * k, h, w, c),
                                    train=train)
        emb = emb.reshape(b, k, self.identity_embedding_size)
        agg = emb.mean(axis=1) if self.average_function == "sum" \
            else emb.max(axis=1)
        return agg, emb

    def get_pose_embedding(self, pose_input_rgbs, train: bool = False):
        x = pose_input_rgbs[:, 0] if pose_input_rgbs.ndim > 4 \
            else pose_input_rgbs
        _, bottleneck = self.pose_unet(x, return_bottleneck=True)
        pose = self.pose_proj(bottleneck.mean(axis=(1, 2)))
        # frozen sub-network: zero gradient into its params
        return jax.lax.stop_gradient(pose)

    def __call__(self, enc_rgbs, pose_input_rgbs, train: bool = False,
                 compute_identity: bool = True):
        if compute_identity:
            embeds, elemwise = self.get_identity_embedding(enc_rgbs, train)
        else:
            embeds, elemwise = None, None
        pose = self.get_pose_embedding(pose_input_rgbs, train)
        return embeds, elemwise, pose
