"""Hinge adversarial loss (gan | rgan | ragan).

Parity with reference ``criterions/adversarial.py:20-49``:
  D: relu(1 - real_pred).mean() + relu(1 + fake_pred_D).mean()
  G ('gan'): -fake_pred_G.mean()
  G ('rgan'/'ragan'): relu(1 + real_pred).mean() + relu(1 - fake_pred_G).mean()
with the relativistic score transforms for rgan/ragan.
"""

from __future__ import annotations

import jax.numpy as jnp


class Wrapper:
    @staticmethod
    def get_args(parser):
        parser.add("--gan_type", type=str, default="gan",
                   help="gan|rgan|ragan")

    @staticmethod
    def get_net(args):
        return Criterion(args.gan_type)


class Criterion:
    def __init__(self, gan_type="gan"):
        if gan_type not in ("gan", "rgan", "ragan"):
            raise ValueError(f"Incorrect gan_type {gan_type!r}")
        self.gan_type = gan_type

    def _dis_preds(self, real_score, fake_score):
        if self.gan_type == "gan":
            return real_score, fake_score
        if self.gan_type == "rgan":
            return real_score - fake_score, fake_score - real_score
        # ragan
        return (real_score - fake_score.mean(),
                fake_score - real_score.mean())

    def __call__(self, data_dict):
        fake_score_G = data_dict["fake_score_G"]
        fake_score_D = data_dict["fake_score_D"]
        real_score = data_dict["real_score"]
        # G-branch aliases: stop-gradiented D-side scores (torch computes
        # those D-grads during loss_G.backward() and then discards them —
        # reference holycow.py:239-252; we must not let them reach opt_D)
        real_for_G = data_dict.get("real_score_for_G", real_score)
        fake_D_for_G = data_dict.get("fake_score_D_for_G", fake_score_D)

        real_pred, fake_pred_D = self._dis_preds(real_score, fake_score_D)
        loss_D = (jnp.maximum(1.0 - real_pred, 0.0).mean()
                  + jnp.maximum(1.0 + fake_pred_D, 0.0).mean())

        # NB: reference loss_G reuses `real_pred` (computed against
        # fake_score_D), not a fake_G-relative one (adversarial.py:39-47).
        real_pred_g, _ = self._dis_preds(real_for_G, fake_D_for_G)
        _, fake_pred_G = self._dis_preds(real_for_G, fake_score_G)
        if self.gan_type == "gan":
            loss_G = -fake_pred_G.mean()
        else:
            loss_G = (jnp.maximum(1.0 + real_pred_g, 0.0).mean()
                      + jnp.maximum(1.0 - fake_pred_G, 0.0).mean())

        return {"adversarial_G": loss_G}, {"adversarial_D": loss_D}
