"""FSTH discriminator (reference ``discriminators/FSTH.py``): identical to
the flagship projection discriminator, but the scored input is
concat(driver stickman, rgb) (``:158-164``)."""

from __future__ import annotations

import jax.numpy as jnp

from latentpose_tpu.models.discriminators import no_landmarks


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--dis_padding", type=str, default="zero")
        parser.add("--dis_num_blocks", type=int, default=7)
        parser.add("--lr_dis", type=float, default=2e-4)

    @staticmethod
    def get_net(args):
        return Discriminator(
            padding=args.dis_padding,
            in_channels=args.in_channels + args.out_channels,
            num_channels=args.num_channels,
            max_num_channels=args.max_num_channels,
            embed_channels=args.embed_channels,
            num_blocks=args.dis_num_blocks,
            image_size=args.image_size,
            num_labels=args.num_labels,
            # reference FSTH.py:87 vs :135 — same meta-1e-4 / finetune-
            # default-eps split as the flagship discriminator
            embed_sn_eps=1e-12 if getattr(args, "finetune", False) else 1e-4,
        )

    get_optimizer = no_landmarks.Wrapper.get_optimizer


class Discriminator(no_landmarks.Discriminator):
    @staticmethod
    def make_input(batch, rgbs):
        rgbs = rgbs if rgbs.ndim == 4 else rgbs[:, 0]
        stickman = batch["dec_stickmen"]
        if stickman.ndim > 4:
            stickman = stickman[:, 0]
        # Reference quirk (discriminators/FSTH.py:160-164): ``torch.cat([
        # stickmen, rgbs], dim=2).view(b, -1, h, w)`` concatenates along
        # HEIGHT and views back, so the effective channel order is the
        # INTERLEAVE [s0, r0, s1, r1, s2, r2], not a plain channel concat.
        # Verified against the real module in
        # tests/test_reference_import_parity_fsth.py.
        return jnp.stack([stickman, rgbs], axis=-1).reshape(
            rgbs.shape[:3] + (stickman.shape[-1] + rgbs.shape[-1],))
