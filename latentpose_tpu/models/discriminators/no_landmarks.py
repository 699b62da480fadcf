"""Flagship projection discriminator (RGB-only, no landmarks).

Behavioral parity with the reference ``discriminators/no_landmarks.py``:
- stem: SNConv3x3 -> ReLU -> SNConv3x3 -> AvgPool2, plus an
  SNConv1x1 -> AvgPool2 skip (reference ``:52-68``);
- min(log2(image_size)-2, dis_num_blocks) strided ResBlocks (norm='none'),
  remaining blocks unstrided; the last block widens to ``embed_channels``
  (reference ``:70-81``);
- score = linear(feat_sum) + <feat_sum, W[label]> with a spectral-normalized
  per-identity embedding matrix W (projection-GAN conditioning,
  reference ``:83-108``);
- per-block feature maps returned for the feature-matching loss
  (reference ``:97-99``).

The reference's three-passes-per-step protocol (fake through the G graph,
fake detached, real — ``:154-161``) is reproduced by the train step in
``runners/holycow.py`` via stop_gradient surgery, with the spectral-norm
power-iteration state threaded through the three applications in the same
order.  ``enable_finetuning`` (W := ê, num_labels -> 1, reference
``:110-136``) is a pure params transform in ``runners/finetune.py``.
"""

from __future__ import annotations

import math
from typing import Any, List

import jax.numpy as jnp
import flax.linen as nn
import optax

from latentpose_tpu.nn.blocks import ResBlock
from latentpose_tpu.ops.image import avg_pool_2x
from latentpose_tpu.ops.spectral_norm import SNConv, SNDense, SNEmbed


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--dis_padding", type=str, default="zero",
                   help="zero|reflection")
        parser.add("--dis_num_blocks", type=int, default=7)
        parser.add("--lr_dis", type=float, default=2e-4)

    @staticmethod
    def get_net(args):
        return Discriminator(
            padding=args.dis_padding,
            in_channels=args.in_channels,
            num_channels=args.num_channels,
            max_num_channels=args.max_num_channels,
            embed_channels=args.embed_channels,
            num_blocks=args.dis_num_blocks,
            image_size=args.image_size,
            num_labels=args.num_labels,
            # the fine-tuned 1-row W is re-registered by the reference with
            # torch's DEFAULT spectral_norm eps (1e-12), unlike the meta
            # matrix's explicit 1e-4 (no_landmarks.py:87 vs :130-136)
            embed_sn_eps=1e-12 if getattr(args, "finetune", False) else 1e-4,
        )

    @staticmethod
    def get_optimizer(args):
        """Discriminator optimizer spec (reference ``:26-28``):
        Adam/RAdam(lr_dis, betas=(beta1, 0.999), eps=1e-5)."""
        opt = {"Adam": optax.adam, "RAdam": optax.radam}[args.optimizer]
        return opt(args.lr_dis, b1=args.beta1, b2=0.999, eps=1e-5)


class Discriminator(nn.Module):
    padding: str = "zero"
    in_channels: int = 3
    num_channels: int = 64
    max_num_channels: int = 512
    embed_channels: int = 512
    num_blocks: int = 7
    image_size: int = 256
    num_labels: int = 1
    # spectral-norm eps of the projection embed W: 1e-4 meta (reference
    # no_landmarks.py:87), 1e-12 after enable_finetuning re-registers it
    # with the torch default (:130-136)
    embed_sn_eps: float = 1e-4
    dtype: Any = None

    @staticmethod
    def make_input(batch, rgbs):
        """Discriminator-plugin protocol: assemble the pass input from the
        batch + (fake or real) rgbs.  This family scores RGB alone
        (reference no_landmarks.py:138-153)."""
        return rgbs if rgbs.ndim == 4 else rgbs[:, 0]

    def _plan(self):
        """Static block plan: list of (in_ch, out_ch, downsample)."""
        num_down = min(int(math.log2(self.image_size)) - 2, self.num_blocks)
        plan = []
        in_ch = self.num_channels
        for i in range(1, num_down):
            out_ch = min(in_ch * 2, self.max_num_channels)
            if i == self.num_blocks - 1:
                out_ch = self.embed_channels
            plan.append((in_ch, out_ch, True))
            in_ch = out_ch
        for i in range(num_down, self.num_blocks):
            out_ch = in_ch
            if i == self.num_blocks - 1:
                out_ch = self.embed_channels
            plan.append((in_ch, out_ch, False))
            in_ch = out_ch
        return plan

    def setup(self):
        self.stem_conv0 = SNConv(self.num_channels, (3, 3), padding=1,
                                 use_bias=True)
        self.stem_conv1 = SNConv(self.num_channels, (3, 3), padding=1,
                                 use_bias=True)
        self.stem_skip = SNConv(self.num_channels, (1, 1), padding=0,
                                use_bias=True)
        self.blocks = [
            ResBlock(in_ch, out_ch, norm_layer="none", downsample=down,
                     padding=self.padding, name=f"block{i}")
            for i, (in_ch, out_ch, down) in enumerate(self._plan())]
        self.linear = SNDense(1)
        self.embed = SNEmbed(self.num_labels, self.embed_channels,
                             sn_eps=self.embed_sn_eps)

    def pass_inputs(self, x, embed=None, update_stats: bool = False):
        """One discriminator pass. x: (B, H, W, 3) in the RGB range of the
        dataset; embed: (B, embed_channels) or None (fine-tuned /
        unconditional). Returns (score (B,), feats list)."""
        h = self.stem_conv0(x, update_stats)
        h = nn.relu(h)
        h = self.stem_conv1(h, update_stats)
        h = avg_pool_2x(h)
        s = self.stem_skip(x, update_stats)
        s = avg_pool_2x(s)
        out = h + s

        feats: List[jnp.ndarray] = [out]
        for block in self.blocks:
            out = block(out, update_stats=update_stats)
            feats.append(out)

        # Reference aliasing (no_landmarks.py:96-99 + blocks.py:73): each
        # block's first ReLU(inplace=True) mutates the tensor already stored
        # in feats, so every feature map except the last is actually relu'd
        # by the time the feature-matching loss reads it.  The final
        # ``torch.relu`` (:100) is out-of-place, so feats[-1] stays raw.
        # Verified against the real reference modules in
        # tests/test_reference_import_parity.py.
        feats = [nn.relu(f) for f in feats[:-1]] + feats[-1:]

        out = nn.relu(out)
        feat_sum = out.reshape(out.shape[0], -1,
                               self.embed_channels).sum(axis=1)
        score = self.linear(feat_sum, update_stats)[:, 0]
        if embed is not None:
            score = score + (feat_sum * embed).sum(axis=1)
        return score, feats

    def embed_labels(self, labels, update_stats: bool = False):
        """Look up the per-identity projection rows W[label] (B, C)."""
        return self.embed(labels, update_stats)

    def __call__(self, x, labels=None, update_stats: bool = False):
        embed = None
        if labels is not None:
            embed = self.embed_labels(labels, update_stats)
        return self.pass_inputs(x, embed, update_stats)
