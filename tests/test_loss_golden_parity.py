"""Golden-value loss parity: every criterion evaluated against a direct
torch implementation of the reference formulas on the same random inputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from latentpose_tpu.losses import (adversarial, dice, dis_embed, featmat,
                                   l1_rgb)  # noqa: E402


RNG = np.random.RandomState(0)
B, H, W = 4, 8, 8


def t(x):
    return torch.tensor(x)


def test_adversarial_gan_parity():
    fake_G = RNG.randn(B).astype(np.float32)
    fake_D = RNG.randn(B).astype(np.float32)
    real = RNG.randn(B).astype(np.float32)
    crit = adversarial.Criterion("gan")
    lg, ld = crit({"fake_score_G": jnp.asarray(fake_G),
                   "fake_score_D": jnp.asarray(fake_D),
                   "real_score": jnp.asarray(real),
                   "real_score_for_G": jnp.asarray(real)})
    # reference criterions/adversarial.py:42-47
    exp_D = (torch.relu(1 - t(real)).mean()
             + torch.relu(1 + t(fake_D)).mean())
    exp_G = -t(fake_G).mean()
    np.testing.assert_allclose(float(ld["adversarial_D"]), float(exp_D),
                               rtol=1e-6)
    np.testing.assert_allclose(float(lg["adversarial_G"]), float(exp_G),
                               rtol=1e-6)


@pytest.mark.parametrize("gan_type", ["rgan", "ragan"])
def test_adversarial_relativistic_parity(gan_type):
    fake_G = RNG.randn(B).astype(np.float32)
    fake_D = RNG.randn(B).astype(np.float32)
    real = RNG.randn(B).astype(np.float32)
    crit = adversarial.Criterion(gan_type)
    lg, ld = crit({"fake_score_G": jnp.asarray(fake_G),
                   "fake_score_D": jnp.asarray(fake_D),
                   "real_score": jnp.asarray(real),
                   "real_score_for_G": jnp.asarray(real)})
    if gan_type == "rgan":
        real_pred = t(real) - t(fake_D)
        fake_pred_D = t(fake_D) - t(real)
        fake_pred_G = t(fake_G) - t(real)
    else:
        real_pred = t(real) - t(fake_D).mean()
        fake_pred_D = t(fake_D) - t(real).mean()
        fake_pred_G = t(fake_G) - t(real).mean()
    exp_D = (torch.relu(1 - real_pred).mean()
             + torch.relu(1 + fake_pred_D).mean())
    # reference loss_G reuses real_pred (vs fake_D) — adversarial.py:39-47
    exp_G = (torch.relu(1 + real_pred).mean()
             + torch.relu(1 - fake_pred_G).mean())
    np.testing.assert_allclose(float(ld["adversarial_D"]), float(exp_D),
                               rtol=1e-5)
    np.testing.assert_allclose(float(lg["adversarial_G"]), float(exp_G),
                               rtol=1e-5)


def test_featmat_parity():
    fake = [RNG.randn(B, H, W, c).astype(np.float32) for c in (4, 8)]
    real = [RNG.randn(B, H, W, c).astype(np.float32) for c in (4, 8)]
    crit = featmat.Criterion(10.0)
    got = crit({"fake_features": [jnp.asarray(f) for f in fake],
                "real_features": [jnp.asarray(r) for r in real]})
    # reference criterions/featmat.py:18-20
    exp = sum(torch.nn.functional.l1_loss(t(f), t(r))
              for f, r in zip(fake, real)) / 2 * 10.0
    np.testing.assert_allclose(float(got["feature_matching"]), float(exp),
                               rtol=1e-6)


def test_dice_parity():
    fake = RNG.rand(B, H, W, 1).astype(np.float32)
    real = (RNG.rand(B, H, W, 1) > 0.5).astype(np.float32)
    crit = dice.Criterion(1.0)
    got = crit({"fake_segm": jnp.asarray(fake), "real_segm": jnp.asarray(real)})
    numer = (2 * t(fake) * t(real)).sum()
    denom = (t(fake) ** 2).sum() + (t(real) ** 2).sum()
    exp = -torch.log(numer / denom)
    np.testing.assert_allclose(float(got["segmentation_dice"]), float(exp),
                               rtol=1e-6)


def test_dis_embed_parity():
    fake = RNG.randn(B, 3, 16).astype(np.float32)
    real = RNG.randn(B, 16).astype(np.float32)
    crit = dis_embed.Criterion(1e-2)
    got = crit({"embeds_elemwise": jnp.asarray(fake),
                "real_embedding": jnp.asarray(real)})
    exp = torch.nn.functional.l1_loss(t(fake[:, 0]), t(real)) * 1e-2
    np.testing.assert_allclose(float(got["embedding_matching"]), float(exp),
                               rtol=1e-6)


def test_l1_rgb_parity():
    fake = RNG.rand(B, H, W, 3).astype(np.float32)
    real = RNG.rand(B, 1, H, W, 3).astype(np.float32)
    crit = l1_rgb.Criterion(30.0)
    got = crit({"fake_rgbs": jnp.asarray(fake),
                "target_rgbs": jnp.asarray(real)})
    exp = 30.0 * torch.nn.functional.l1_loss(t(fake), t(real[:, 0]))
    np.testing.assert_allclose(float(got["l1_rgb"]), float(exp), rtol=1e-6)
