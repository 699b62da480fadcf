"""FSTH generator (Zakharov et al. reproduction).

Parity with reference ``generators/FSTH.py``: encoder-decoder — the driver
*stickman* is encoded by a strided tower, decoded through AdaIN residual +
upsampling blocks; AdaIN (bias, weight) come from the identity embedding
alone via one spectral-normalized linear (``:95-97``).  Output: tanh RGB in
(-1, 1), no segmentation head.

Fine-tuning (``:132-150``): the packed AdaIN parameter vector itself becomes
the trainable leaf (``finetune_affine`` in the train state), initialized from
project(ê).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.nn.blocks import ResBlock
from latentpose_tpu.ops import norms as norm_ops
from latentpose_tpu.ops.image import avg_pool_2x
from latentpose_tpu.ops.spectral_norm import SNConv, SNDense


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--gen_padding", type=str, default="zero")
        parser.add("--gen_num_downsample_blocks", type=int, default=4)
        parser.add("--gen_num_residual_blocks", type=int, default=4)
        parser.add("--norm_layer", type=str, default="in")

    @staticmethod
    def get_net(args):
        return Generator(
            padding=args.gen_padding,
            in_channels=args.in_channels,
            out_channels=args.out_channels,
            num_channels=args.num_channels,
            max_num_channels=args.max_num_channels,
            embed_channels=args.embed_channels,
            num_downsample_blocks=args.gen_num_downsample_blocks,
            num_residual_blocks=args.gen_num_residual_blocks,
        )

    @staticmethod
    def make_finetune_state(generator, gen_variables, e_hat, rng):
        """FSTH fine-tunes the packed AdaIN params (reference :132-150):
        the trainable leaf is project(ê) itself."""
        import jax
        if e_hat is None:
            e_hat = jax.random.uniform(rng,
                                       (1, generator.embed_channels))
        affine = generator.apply(gen_variables, e_hat,
                                 method="project_embeds")
        return {"finetune_affine": affine}


class Generator(nn.Module):
    padding: str = "zero"
    in_channels: int = 3
    out_channels: int = 3
    num_channels: int = 64
    max_num_channels: int = 512
    embed_channels: int = 512
    num_downsample_blocks: int = 4
    num_residual_blocks: int = 4
    dtype: Any = None

    INPUT_KEYS = ("embeds", "dec_stickmen")
    FINETUNE_PARAM = "affine"

    def _schedule(self):
        """(down plan, decoder plan, adain feature list)."""
        down: List[Tuple[int, int]] = []
        ch = self.num_channels
        for _ in range(1, self.num_downsample_blocks):
            out_ch = min(ch * 2, self.max_num_channels)
            down.append((ch, out_ch))
            ch = out_ch
        bottleneck = ch

        dec: List[Tuple[int, int, bool]] = []
        for _ in range(self.num_residual_blocks):
            dec.append((ch, ch, False))
        for i in range(self.num_downsample_blocks - 1, -1, -1):
            in_ch = ch
            ch = min(int(self.num_channels * 2 ** i), self.max_num_channels)
            dec.append((in_ch, ch, True))

        adain = []
        for in_ch, out_ch, _ in dec:
            adain += [in_ch, out_ch]
        adain.append(ch)  # head AdaIN
        return down, dec, adain

    def num_affine_params(self):
        _, _, adain = self._schedule()
        return sum(2 * f for f in adain)

    def setup(self):
        self.projector = SNDense(self.num_affine_params(), name="project")

    def project_embeds(self, embeds, update_stats: bool = False):
        return self.projector(embeds, update_stats)

    @nn.compact
    def __call__(self, inputs, update_stats: bool = False):
        """inputs: 'embeds' (B, 512) or 'finetune_affine' (B, num_affine);
        'dec_stickmen' (B, [T,] H, W, 3).  Returns (fake_rgbs, None)."""
        down, dec, adain_features = self._schedule()

        stickman = inputs["dec_stickmen"]
        if stickman.ndim > 4:
            stickman = stickman[:, 0]

        if inputs.get("finetune_affine") is not None:
            affine = inputs["finetune_affine"]
        else:
            affine = self.project_embeds(inputs["embeds"], update_stats)

        ada_params = []
        offset = 0
        for f in adain_features:
            bias = affine[:, offset:offset + f]
            weight = affine[:, offset + f:offset + 2 * f]
            ada_params.append((weight, bias))
            offset += 2 * f

        # Encoder (stem + strided 'in'-norm ResBlocks, reference :50-73)
        h = SNConv(self.num_channels, (3, 3), padding=1, use_bias=True,
                   name="stem_conv0")(stickman, update_stats)
        h = nn.relu(h)
        h = SNConv(self.num_channels, (3, 3), padding=1, use_bias=True,
                   name="stem_conv1")(h, update_stats)
        h = avg_pool_2x(h)
        s = SNConv(self.num_channels, (1, 1), padding=0, use_bias=True,
                   name="stem_skip")(stickman, update_stats)
        s = avg_pool_2x(s)
        h = h + s
        for i, (in_ch, out_ch) in enumerate(down):
            h = ResBlock(in_ch, out_ch, norm_layer="in", downsample=True,
                         padding=self.padding,
                         name=f"down{i}")(h, update_stats=update_stats)

        # Decoder (AdaIN res + up blocks, reference :75-92)
        for i, (in_ch, out_ch, up) in enumerate(dec):
            h = ResBlock(in_ch, out_ch, norm_layer="adain", upsample=up,
                         padding=self.padding, name=f"dec{i}")(
                h, ada0=ada_params[2 * i], ada1=ada_params[2 * i + 1],
                update_stats=update_stats)

        w, b = ada_params[-1]
        h = norm_ops.adain(h, w, b)
        h = nn.relu(h)
        h = SNConv(self.out_channels, (3, 3), padding=1, use_bias=True,
                   name="head_conv")(h, update_stats)
        return jnp.tanh(h), None
