"""Numerical parity for the FSTH model family against the ACTUAL reference
implementation (imported from /root/reference, not hand-written twins —
extends tests/test_reference_import_parity.py's methodology to the
few-shot-talking-heads reproduction plugins):

- embedders/FSTH.py (stickman+rgb tower) and embedders/no_pose_encoder.py,
- generators/FSTH.py (stickman encoder -> AdaIN decoder; meta + fine-tuned),
- generators/FSTH_plus.py (keypoint-pose constant decoder; meta + fine-tuned),
- discriminators/FSTH.py (padded-stem projection discriminator).
"""

import importlib
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference")
if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)
if str(REFERENCE) not in sys.path:
    sys.path.append(str(REFERENCE))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax.numpy as jnp  # noqa: E402

import convert_torch_weights as cw  # noqa: E402

RTOL, ATOL = 2e-4, 5e-4


def sd_np(module):
    # .copy(): .numpy() aliases torch storage mutated by later forwards
    return {k: v.detach().numpy().copy()
            for k, v in module.state_dict().items()}


def nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def bnchw_to_bnhwc(x):
    return np.transpose(x, (0, 1, 3, 4, 2))


# ---------------------------------------------------------------------------
# Embedders: FSTH (stickman+rgb) and no_pose (rgb only)
# ---------------------------------------------------------------------------

EMB_ARGS = Namespace(in_channels=3, out_channels=3, num_channels=8,
                     max_num_channels=32, embed_channels=32,
                     embed_num_blocks=4, average_function="sum",
                     embed_padding="zero", device="cpu")


@pytest.mark.parametrize("ref_name,ours_name,with_stickmen,avg", [
    ("FSTH", "FSTH", True, "sum"),
    ("FSTH", "FSTH", True, "max"),
    ("no_pose_encoder", "no_pose_encoder", False, "sum"),
])
def test_reference_fsth_embedder_parity(ref_name, ours_name, with_stickmen,
                                        avg):
    ref_mod = importlib.import_module(f"embedders.{ref_name}")
    ours_mod = importlib.import_module(
        f"latentpose_tpu.models.embedders.{ours_name}")
    args = Namespace(**{**vars(EMB_ARGS), "average_function": avg})
    torch.manual_seed(0)
    ref = ref_mod.Wrapper.get_net(args).eval()

    rng = np.random.default_rng(1)
    enc = rng.random((2, 3, 3, 32, 32), dtype=np.float32)
    stick = rng.random((2, 3, 3, 32, 32), dtype=np.float32)
    data_dict = {"enc_rgbs": torch.from_numpy(enc)}
    if with_stickmen:
        data_dict["enc_stickmen"] = torch.from_numpy(stick)
    with torch.no_grad():
        ref(data_dict)

    params, spectral = cw.convert_fsth_embedder(sd_np(ref))
    m = ours_mod.Wrapper.get_net(args)
    kwargs = {"enc_stickmen": jnp.asarray(bnchw_to_bnhwc(stick))} \
        if with_stickmen else {}
    embeds, elemwise, pose = m.apply(
        {"params": params, "spectral": spectral},
        jnp.asarray(bnchw_to_bnhwc(enc)), train=False, **kwargs)

    assert pose is None  # no pose path in this family
    np.testing.assert_allclose(np.asarray(embeds),
                               data_dict["embeds"].numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(elemwise),
                               data_dict["embeds_elemwise"].numpy(),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# FSTH generator (stickman encoder -> AdaIN decoder)
# ---------------------------------------------------------------------------

FSTH_GEN_ARGS = Namespace(
    gen_padding="zero", in_channels=3, out_channels=3, num_channels=8,
    max_num_channels=32, embed_channels=16, norm_layer="in",
    gen_num_downsample_blocks=2, gen_num_residual_blocks=1, device="cpu")


def burn_in(ref, forward, n=8):
    """Settle torch spectral norm's power iteration before exporting: fresh
    random (u, v) underestimate sigma, so W/sigma amplifies per layer and
    f32 op-order noise (NCHW torch vs NHWC XLA) swamps tolerances.  Trained
    checkpoints never look like this (see
    test_reference_import_parity.build_reference_discriminator)."""
    ref.train()
    for _ in range(n):
        with torch.no_grad():
            forward()
    ref.eval()


def build_fsth_pair(seed=0):
    ref_mod = importlib.import_module("generators.FSTH")
    from latentpose_tpu.models.generators import FSTH as ours_mod
    torch.manual_seed(seed)
    ref = ref_mod.Wrapper.get_net(FSTH_GEN_ARGS)
    rng = np.random.default_rng(seed + 500)
    embeds = rng.standard_normal((1, 16)).astype(np.float32)
    stick = rng.random((1, 3, 32, 32), dtype=np.float32)
    burn_in(ref, lambda: ref({"embeds": torch.from_numpy(embeds),
                              "dec_stickmen": torch.from_numpy(stick)}))
    ours = ours_mod.Wrapper.get_net(FSTH_GEN_ARGS)
    return ref, ours


def test_reference_fsth_generator_parity():
    ref, ours = build_fsth_pair()
    rng = np.random.default_rng(2)
    embeds = rng.standard_normal((2, 16)).astype(np.float32)
    stick = rng.random((2, 3, 32, 32), dtype=np.float32)
    data_dict = {"embeds": torch.from_numpy(embeds),
                 "dec_stickmen": torch.from_numpy(stick)}
    with torch.no_grad():
        ref(data_dict)

    params, spectral = cw.convert_fsth_generator(sd_np(ref))
    rgbs, segm = ours.apply(
        {"params": params, "spectral": spectral},
        {"embeds": jnp.asarray(embeds),
         "dec_stickmen": jnp.asarray(nhwc(data_dict["dec_stickmen"]))},
        update_stats=False)
    assert segm is None
    np.testing.assert_allclose(np.asarray(rgbs),
                               nhwc(data_dict["fake_rgbs"]),
                               rtol=RTOL, atol=ATOL)


def test_reference_fsth_generator_finetune_parity():
    """FSTH fine-tuning trains the packed AdaIN parameter vector itself
    (make_affine_params_trainable, reference FSTH.py:132-150); our
    finetune_affine leaf must reproduce a fine-tuned reference forward."""
    ref, ours = build_fsth_pair(seed=3)
    rng = np.random.default_rng(4)
    e_hat = rng.standard_normal((1, 16)).astype(np.float32)
    stick = rng.random((2, 3, 32, 32), dtype=np.float32)

    ref.enable_finetuning({"embeds": torch.from_numpy(e_hat)})
    data_dict = {"dec_stickmen": torch.from_numpy(stick)}
    with torch.no_grad():
        ref(data_dict)

    params, spectral = cw.convert_fsth_generator(sd_np(ref))
    variables = {"params": params, "spectral": spectral}
    affine = ours.apply(variables, jnp.asarray(e_hat),
                        method="project_embeds")
    # packed-vector sanity: torch stored the same values in the AdaIN leaves
    ref_packed = []
    for m in ref.modules():
        if m.__class__.__name__ == "AdaptiveNorm2d":
            ref_packed.append(m.bias.detach().numpy())
            ref_packed.append(m.weight.detach().numpy())
    np.testing.assert_allclose(np.asarray(affine),
                               np.concatenate(ref_packed, axis=1),
                               rtol=RTOL, atol=ATOL)

    affine_b = jnp.broadcast_to(affine, (2, affine.shape[1]))
    rgbs, _ = ours.apply(
        variables,
        {"finetune_affine": affine_b,
         "dec_stickmen": jnp.asarray(np.transpose(stick, (0, 2, 3, 1)))},
        update_stats=False)
    np.testing.assert_allclose(np.asarray(rgbs),
                               nhwc(data_dict["fake_rgbs"]),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# FSTH_plus generator (keypoint pose, constant decoder)
# ---------------------------------------------------------------------------

FSTH_PLUS_ARGS = Namespace(
    gen_padding="zero", in_channels=3, out_channels=3, num_channels=8,
    max_num_channels=32, embed_channels=16, pose_embedding_size=136,
    norm_layer="in", gen_constant_input_size=4, gen_num_residual_blocks=1,
    image_size=16, device="cpu")


def test_reference_fsth_plus_generator_parity():
    ref_mod = importlib.import_module("generators.FSTH_plus")
    from latentpose_tpu.models.generators import FSTH_plus as ours_mod
    torch.manual_seed(5)
    ref = ref_mod.Wrapper.get_net(FSTH_PLUS_ARGS)
    ref.constant.constant.data.normal_()  # break the all-ones symmetry
    rngb = np.random.default_rng(55)
    e0 = rngb.standard_normal((1, 16)).astype(np.float32)
    k0 = rngb.random((1, 1, 136), dtype=np.float32)
    burn_in(ref, lambda: ref({"embeds": torch.from_numpy(e0),
                              "dec_keypoints": torch.from_numpy(k0)}))
    ours = ours_mod.Wrapper.get_net(FSTH_PLUS_ARGS)

    rng = np.random.default_rng(6)
    embeds = rng.standard_normal((2, 16)).astype(np.float32)
    kp = rng.random((2, 1, 136), dtype=np.float32)
    data_dict = {"embeds": torch.from_numpy(embeds),
                 "dec_keypoints": torch.from_numpy(kp)}
    with torch.no_grad():
        ref(data_dict)

    params, spectral, extra = cw.convert_fsth_plus_generator(sd_np(ref))
    assert extra == {}
    rgbs, segm = ours.apply(
        {"params": params, "spectral": spectral},
        {"embeds": jnp.asarray(embeds), "dec_keypoints": jnp.asarray(kp)},
        update_stats=False)
    np.testing.assert_allclose(np.asarray(rgbs),
                               nhwc(data_dict["fake_rgbs"]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(segm),
                               nhwc(data_dict["fake_segm"]),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# FSTH discriminator (padded stem, stickman+rgb input)
# ---------------------------------------------------------------------------

def test_reference_fsth_discriminator_parity():
    ref_mod = importlib.import_module("discriminators.FSTH")
    from latentpose_tpu.models.discriminators import FSTH as ours_mod
    args = Namespace(dis_padding="zero", in_channels=3, out_channels=3,
                     num_channels=8, max_num_channels=32, embed_channels=32,
                     dis_num_blocks=4, image_size=32, num_labels=5,
                     device="cpu")
    torch.manual_seed(7)
    ref = ref_mod.Wrapper.get_net(args).train()
    rng = np.random.default_rng(8)
    stick = rng.random((2, 3, 32, 32), dtype=np.float32)
    fake = rng.random((2, 3, 32, 32), dtype=np.float32)
    real = rng.random((2, 3, 32, 32), dtype=np.float32)
    label = np.array([1, 4])

    # settle the power iteration (see test_reference_import_parity's
    # build_reference_discriminator docstring), then export + eval
    for _ in range(5):
        with torch.no_grad():
            ref({"fake_rgbs": torch.from_numpy(fake),
                 "target_rgbs": torch.from_numpy(real),
                 "dec_stickmen": torch.from_numpy(stick),
                 "label": torch.from_numpy(label)})
    ref.eval()
    data_dict = {"fake_rgbs": torch.from_numpy(fake),
                 "target_rgbs": torch.from_numpy(real),
                 "dec_stickmen": torch.from_numpy(stick),
                 "label": torch.from_numpy(label)}
    with torch.no_grad():
        ref(data_dict)

    params, spectral = cw.convert_fsth_discriminator(sd_np(ref))
    m = ours_mod.Wrapper.get_net(args)
    variables = {"params": params, "spectral": spectral}
    embed_rows = m.apply(variables, jnp.asarray(label),
                         method="embed_labels", update_stats=False)
    batch = {"dec_stickmen": jnp.asarray(np.transpose(stick, (0, 2, 3, 1)))}
    fake_in = m.make_input(batch,
                           jnp.asarray(np.transpose(fake, (0, 2, 3, 1))))
    real_in = m.make_input(batch,
                           jnp.asarray(np.transpose(real, (0, 2, 3, 1))))
    fake_score, fake_feats = m.apply(variables, fake_in, embed_rows,
                                     method="pass_inputs",
                                     update_stats=False)
    real_score, _ = m.apply(variables, real_in, embed_rows,
                            method="pass_inputs", update_stats=False)
    np.testing.assert_allclose(np.asarray(fake_score),
                               data_dict["fake_score_G"].numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(real_score),
                               data_dict["real_score"].numpy(),
                               rtol=RTOL, atol=ATOL)
    for got, exp in zip(fake_feats, data_dict["fake_features"]):
        np.testing.assert_allclose(np.asarray(got), nhwc(exp),
                                   rtol=RTOL, atol=ATOL)
