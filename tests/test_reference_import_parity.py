"""Numerical parity against the ACTUAL reference implementation.

Unlike the twin-based golden tests (test_*_golden_parity.py), every torch
model here is built by importing the real modules from /root/reference —
``generators/vector_pose_unsupervised_segmentation_noBottleneck.py``,
``discriminators/no_landmarks.py``, ``generators/common/blocks.py``, and the
``criterions/*`` losses — seeding them, exporting their state dicts through
tools/convert_torch_weights.py, and asserting forward parity with our flax
modules.  A twin can encode the same misreading on both sides; the reference
cannot.

Covered:
- flagship generator forward (meta + fine-tuned re-parameterization),
- flagship discriminator: eval 3-score/feature parity AND train-mode
  spectral-norm u trajectories over 3 full steps (3 trunk passes + 1
  embedding lookup per step — reference no_landmarks.py:138-166),
- the block library incl. the shuffle/V2 variants (blocks.py:47-368),
- loss values for adversarial (gan/rgan/ragan), featmat, dice, dis_embed,
  l1_rgb on a fixed batch.

Excluded (environment, not design): the flagship embedder imports
torchvision (absent here) — its test importorskips and arms automatically
where torchvision exists; backbones remain covered by param-count +
converter tests.  VGG perceptual/idt_embed criteria need the pretrained
.pth files (WEIGHTS.md).
"""

import importlib
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

REFERENCE = Path("/root/reference")
if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

# The reference is a flat repo of top-level (namespace) packages
# (generators/, discriminators/, criterions/, utils/).  Appended — not
# prepended — so our own repo root stays authoritative for any shared name.
if str(REFERENCE) not in sys.path:
    sys.path.append(str(REFERENCE))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

ref_blocks = importlib.import_module("generators.common.blocks")
ref_gen_mod = importlib.import_module(
    "generators.vector_pose_unsupervised_segmentation_noBottleneck")
ref_dis_mod = importlib.import_module("discriminators.no_landmarks")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import convert_torch_weights as cw  # noqa: E402

RTOL, ATOL = 2e-4, 5e-4


def sd_np(module):
    # .copy(): .numpy() aliases torch storage, and torch's power iteration
    # updates weight_u/weight_v IN PLACE on later forwards — without the
    # copy the converted state would silently track the torch module.
    return {k: v.detach().numpy().copy()
            for k, v in module.state_dict().items()}


def nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def assign_adains(module, rng, batch):
    """Give every AdaptiveNorm2d per-sample (weight, bias) like the
    generator's assign_affine_params does; returns them for our side."""
    params = []
    for m in module.modules():
        if m.__class__.__name__ == "AdaptiveNorm2d":
            w = rng.standard_normal((batch, m.num_features)).astype(
                np.float32)
            b = rng.standard_normal((batch, m.num_features)).astype(
                np.float32)
            m.weight = torch.from_numpy(w)
            m.bias = torch.from_numpy(b)
            params.append((jnp.asarray(w), jnp.asarray(b)))
    return params


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

GEN_ARGS = Namespace(
    gen_padding="zero", in_channels=3, out_channels=3, num_channels=8,
    max_num_channels=32, embed_channels=16, pose_embedding_size=8,
    norm_layer="in", gen_constant_input_size=4, gen_num_residual_blocks=2,
    image_size=32, device="cpu")


def build_reference_generator(seed=0):
    torch.manual_seed(seed)
    gen = ref_gen_mod.Wrapper.get_net(GEN_ARGS).eval()
    # the learned constant initializes to ones (noBottleneck.py:31-37) —
    # perturb it so a layout mistake cannot hide behind the symmetry
    gen.constant.constant.data.normal_()
    return gen


def build_our_generator():
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)
    return gen_mod.Generator(
        num_channels=8, max_num_channels=32, identity_embedding_size=16,
        pose_embedding_size=8, output_image_size=32, num_residual_blocks=2)


def test_reference_generator_forward_parity():
    gen = build_reference_generator()
    rng = np.random.default_rng(1)
    idt = rng.standard_normal((2, 16)).astype(np.float32)
    pose = rng.standard_normal((2, 8)).astype(np.float32)
    data_dict = {"embeds": torch.from_numpy(idt),
                 "pose_embedding": torch.from_numpy(pose)}
    with torch.no_grad():
        gen(data_dict)

    params, spectral, extra = cw.convert_flagship_generator(sd_np(gen))
    assert extra == {}
    rgbs, segm = build_our_generator().apply(
        {"params": params, "spectral": spectral},
        {"embeds": jnp.asarray(idt), "pose_embedding": jnp.asarray(pose)},
        update_stats=False)

    np.testing.assert_allclose(np.asarray(rgbs),
                               nhwc(data_dict["fake_rgbs"]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(segm),
                               nhwc(data_dict["fake_segm"]),
                               rtol=RTOL, atol=ATOL)


def test_reference_generator_finetune_parity():
    """enable_finetuning makes ê a Parameter used in place of embeds
    (noBottleneck.py:139-163); our pure re-parameterization must agree."""
    gen = build_reference_generator(seed=2)
    rng = np.random.default_rng(3)
    e_hat = rng.standard_normal((1, 16)).astype(np.float32)
    pose = rng.standard_normal((3, 8)).astype(np.float32)

    gen.enable_finetuning({"embeds": torch.from_numpy(e_hat)})
    data_dict = {"pose_embedding": torch.from_numpy(pose)}
    with torch.no_grad():
        gen(data_dict)

    params, spectral, extra = cw.convert_flagship_generator(sd_np(gen))
    assert extra.keys() == {"finetune_embedding"}
    np.testing.assert_array_equal(extra["finetune_embedding"], e_hat)

    # our fine-tune path: the embedding is a train-state leaf broadcast to
    # the batch and fed through the ordinary 'embeds' input (holycow.py)
    embeds = jnp.broadcast_to(jnp.asarray(e_hat), (3, 16))
    rgbs, segm = build_our_generator().apply(
        {"params": params, "spectral": spectral},
        {"embeds": embeds, "pose_embedding": jnp.asarray(pose)},
        update_stats=False)

    np.testing.assert_allclose(np.asarray(rgbs),
                               nhwc(data_dict["fake_rgbs"]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(segm),
                               nhwc(data_dict["fake_segm"]),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------

DIS_ARGS = Namespace(
    dis_padding="zero", in_channels=3, out_channels=3, num_channels=8,
    max_num_channels=32, embed_channels=32, dis_num_blocks=4, image_size=32,
    num_labels=5, device="cpu")


def build_reference_discriminator(seed=0, burn_in=5):
    """Build the real reference discriminator and settle its power
    iteration.

    At registration torch seeds (u, v) with *independent* random vectors, so
    sigma = u·Wv is a near-zero estimate of the spectral norm and W/sigma
    amplifies ~12x per conv: a no-norm 7-layer trunk then explodes to ~1e10
    and f32 op-order differences (NCHW torch vs NHWC XLA) swamp any
    tolerance.  Trained checkpoints never look like this — their (u, v) are
    converged — so a few train-mode forwards (each advancing PI once per SN
    layer, exactly the semantics under test elsewhere) restore realistic
    conditioning before weights are exported."""
    torch.manual_seed(seed)
    dis = ref_dis_mod.Wrapper.get_net(DIS_ARGS).train()
    rng = np.random.default_rng(seed + 1000)
    fake, real, label = make_dis_batch(rng)
    for _ in range(burn_in):
        with torch.no_grad():
            dis({"fake_rgbs": torch.from_numpy(fake),
                 "target_rgbs": torch.from_numpy(real),
                 "label": torch.from_numpy(label)})
    return dis


def build_our_discriminator(num_labels=5):
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod
    return dis_mod.Discriminator(
        num_channels=8, max_num_channels=32, embed_channels=32, num_blocks=4,
        image_size=32, num_labels=num_labels)


def make_dis_batch(rng, batch=2):
    fake = rng.random((batch, 3, 32, 32), dtype=np.float32)
    real = rng.random((batch, 3, 32, 32), dtype=np.float32)
    label = np.array([1, 4][:batch])
    return fake, real, label


def test_reference_discriminator_eval_parity():
    dis = build_reference_discriminator().eval()
    rng = np.random.default_rng(4)
    fake, real, label = make_dis_batch(rng)
    data_dict = {"fake_rgbs": torch.from_numpy(fake),
                 "target_rgbs": torch.from_numpy(real),
                 "label": torch.from_numpy(label)}
    with torch.no_grad():
        dis(data_dict)

    params, spectral = cw.convert_flagship_discriminator(sd_np(dis))
    m = build_our_discriminator()
    variables = {"params": params, "spectral": spectral}
    jlabel = jnp.asarray(label)
    embed_rows = m.apply(variables, jlabel, method="embed_labels",
                         update_stats=False)
    fake_score, fake_feats = m.apply(
        variables, jnp.asarray(np.transpose(fake, (0, 2, 3, 1))),
        embed_rows, method="pass_inputs", update_stats=False)
    real_score, real_feats = m.apply(
        variables, jnp.asarray(np.transpose(real, (0, 2, 3, 1))),
        embed_rows, method="pass_inputs", update_stats=False)

    # eval mode: no power iteration, so fake_score_G == fake_score_D
    np.testing.assert_allclose(data_dict["fake_score_G"].numpy(),
                               data_dict["fake_score_D"].numpy())
    np.testing.assert_allclose(np.asarray(fake_score),
                               data_dict["fake_score_G"].numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(real_score),
                               data_dict["real_score"].numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(embed_rows),
                               data_dict["real_embedding"].numpy(),
                               rtol=RTOL, atol=ATOL)
    assert len(fake_feats) == len(data_dict["fake_features"])
    for got, exp in zip(fake_feats, data_dict["fake_features"]):
        np.testing.assert_allclose(np.asarray(got), nhwc(exp),
                                   rtol=RTOL, atol=ATOL)
    for got, exp in zip(real_feats, data_dict["real_features"]):
        np.testing.assert_allclose(np.asarray(got), nhwc(exp),
                                   rtol=RTOL, atol=ATOL)


def test_reference_discriminator_finetune_parity():
    """enable_finetuning replaces W with one ê row (no_landmarks.py:110-136);
    the converted fine-tuned state must drive our num_labels=1 module."""
    dis = build_reference_discriminator(seed=5)
    rng = np.random.default_rng(6)
    e_hat = rng.standard_normal((1, 32)).astype(np.float32)
    dis.enable_finetuning({"embeds": torch.from_numpy(e_hat)})
    dis.eval()

    fake, real, _ = make_dis_batch(rng)
    label = np.zeros(2, dtype=np.int64)
    data_dict = {"fake_rgbs": torch.from_numpy(fake),
                 "target_rgbs": torch.from_numpy(real),
                 "label": torch.from_numpy(label)}
    with torch.no_grad():
        dis(data_dict)

    params, spectral = cw.convert_flagship_discriminator(sd_np(dis))
    assert params["embed"]["embedding"].shape == (1, 32)
    m = build_our_discriminator(num_labels=1)
    variables = {"params": params, "spectral": spectral}
    embed_rows = m.apply(variables, jnp.asarray(label),
                         method="embed_labels", update_stats=False)
    fake_score, _ = m.apply(
        variables, jnp.asarray(np.transpose(fake, (0, 2, 3, 1))),
        embed_rows, method="pass_inputs", update_stats=False)
    real_score, _ = m.apply(
        variables, jnp.asarray(np.transpose(real, (0, 2, 3, 1))),
        embed_rows, method="pass_inputs", update_stats=False)
    np.testing.assert_allclose(np.asarray(fake_score),
                               data_dict["fake_score_G"].numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(real_score),
                               data_dict["real_score"].numpy(),
                               rtol=RTOL, atol=ATOL)


def test_reference_discriminator_finetune_sn_eps_parity():
    """enable_finetuning re-registers the 1-row W with torch's DEFAULT
    spectral_norm eps=1e-12, not the meta matrix's 1e-4
    (no_landmarks.py:87 vs :130-136).  Pinned with a tiny-norm ê whose
    power-iteration vectors fall below 1e-4, where the two eps values give
    visibly different sigma: our finetune-mode module (embed_sn_eps=1e-12)
    must track torch's train-mode W_sn trajectory."""
    from latentpose_tpu.models.discriminators import no_landmarks as dis_mod

    dis = build_reference_discriminator(seed=11)
    rng = np.random.default_rng(12)
    # norm(ê) ~ 3e-6: W^T u and W v land well under 1e-4, so an eps=1e-4
    # embed would clamp the normalizers while torch's 1e-12 does not
    e_hat = (rng.standard_normal((1, 32)) * 1e-6).astype(np.float32)
    dis.enable_finetuning({"embeds": torch.from_numpy(e_hat)})
    dis.train()

    params, spectral = cw.convert_flagship_discriminator(sd_np(dis))
    ours = dis_mod.Discriminator(
        num_channels=8, max_num_channels=32, embed_channels=32, num_blocks=4,
        image_size=32, num_labels=1, embed_sn_eps=1e-12)
    # also build the (wrong) meta-eps module to prove the probe has teeth
    ours_meta_eps = dis_mod.Discriminator(
        num_channels=8, max_num_channels=32, embed_channels=32, num_blocks=4,
        image_size=32, num_labels=1, embed_sn_eps=1e-4)

    label = jnp.zeros((2,), jnp.int32)

    def run(module, spec):
        rows, mut = module.apply({"params": params, "spectral": spec},
                                 label, method="embed_labels",
                                 update_stats=True, mutable=["spectral"])
        return np.asarray(rows), mut["spectral"]

    spec_ft, spec_meta = spectral, spectral
    for step in range(3):
        with torch.no_grad():
            torch_rows = dis.embed(
                torch.zeros(2, dtype=torch.int64)).numpy().copy()
        got, spec_ft = run(ours, spec_ft)
        wrong, spec_meta = run(ours_meta_eps, spec_meta)
        np.testing.assert_allclose(got, torch_rows, rtol=1e-4, atol=1e-10)
        # the meta-eps module must diverge on this probe, or the test
        # would pass vacuously
        assert not np.allclose(wrong, torch_rows, rtol=1e-2), \
            f"step {step}: eps probe has no teeth"

    # the production Wrapper wires the split from args.finetune
    args = Namespace(dis_padding="zero", in_channels=3, num_channels=8,
                     max_num_channels=32, embed_channels=32,
                     dis_num_blocks=4, image_size=32, num_labels=1,
                     finetune=True)
    assert dis_mod.Wrapper.get_net(args).embed_sn_eps == 1e-12
    args.finetune = False
    assert dis_mod.Wrapper.get_net(args).embed_sn_eps == 1e-4


def test_reference_discriminator_spectral_trajectory():
    """Train-mode protocol: per step the reference runs the SN embedding
    lookup once and the trunk three times (G-fake, detached fake, real),
    each trunk pass advancing every trunk layer's power iteration
    (no_landmarks.py:138-166).  Our threaded spectral state must track the
    torch u vectors AND all three scores across 3 consecutive steps."""
    dis = build_reference_discriminator(seed=7).train()
    rng = np.random.default_rng(8)
    fake, real, label = make_dis_batch(rng)

    params, spectral = cw.convert_flagship_discriminator(sd_np(dis))
    m = build_our_discriminator()
    jfake = jnp.asarray(np.transpose(fake, (0, 2, 3, 1)))
    jreal = jnp.asarray(np.transpose(real, (0, 2, 3, 1)))
    jlabel = jnp.asarray(label)

    def our_step(spec):
        variables = {"params": params, "spectral": spec}
        embed_rows, mut = m.apply(variables, jlabel, method="embed_labels",
                                  update_stats=True, mutable=["spectral"])
        spec = mut["spectral"]
        scores = []
        for x in (jfake, jfake, jreal):
            (score, _), mut = m.apply({"params": params, "spectral": spec},
                                      x, embed_rows, method="pass_inputs",
                                      update_stats=True, mutable=["spectral"])
            spec = mut["spectral"]
            scores.append(score)
        return scores, spec

    # (torch key, our spectral tree path)
    tracked = [("down_block.0.weight_u", ("stem_conv0",)),
               ("blocks.0.block.2.weight_u", ("block0", "conv0")),
               ("blocks.2.block.5.weight_u", ("block2", "conv1")),
               ("linear.weight_u", ("linear",)),
               ("embed.weight_u", ("embed",))]

    spec = spectral
    for step in range(3):
        data_dict = {"fake_rgbs": torch.from_numpy(fake),
                     "target_rgbs": torch.from_numpy(real),
                     "label": torch.from_numpy(label)}
        with torch.no_grad():
            dis(data_dict)
        (s_g, s_d, s_r), spec = our_step(spec)

        np.testing.assert_allclose(
            np.asarray(s_g), data_dict["fake_score_G"].numpy(),
            rtol=RTOL, atol=ATOL, err_msg=f"fake_score_G step {step}")
        np.testing.assert_allclose(
            np.asarray(s_d), data_dict["fake_score_D"].numpy(),
            rtol=RTOL, atol=ATOL, err_msg=f"fake_score_D step {step}")
        np.testing.assert_allclose(
            np.asarray(s_r), data_dict["real_score"].numpy(),
            rtol=RTOL, atol=ATOL, err_msg=f"real_score step {step}")

        ref_sd = sd_np(dis)
        for torch_key, path in tracked:
            ours = spec
            for p in path:
                ours = ours[p]
            np.testing.assert_allclose(
                np.asarray(ours["u"]), ref_sd[torch_key],
                rtol=RTOL, atol=ATOL,
                err_msg=f"u mismatch {torch_key} after step {step}")


# ---------------------------------------------------------------------------
# Block library (generators/common/blocks.py) — incl. shuffle/V2 variants
# ---------------------------------------------------------------------------

def run_block_pair(ref_block, our_module, converter, cin, img=8, batch=2,
                   adain=False, seed=0, method_kwargs=None):
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed + 100)
    ref_block.eval()
    x = rng.standard_normal((batch, cin, img, img)).astype(np.float32)

    ada = assign_adains(ref_block, rng, batch) if adain else []
    with torch.no_grad():
        exp = ref_block(torch.from_numpy(x))

    params, spectral = converter(sd_np(ref_block))
    kwargs = dict(method_kwargs or {})
    if adain:
        kwargs["ada0"], kwargs["ada1"] = ada[0], ada[1]
    got = our_module.apply({"params": params, "spectral": spectral},
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           update_stats=False, **kwargs)
    np.testing.assert_allclose(np.asarray(got), nhwc(exp),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("norm,upsample,downsample,cin,cout", [
    ("in", False, False, 8, 8),
    ("in", True, False, 8, 16),
    ("none", False, True, 8, 16),
    ("adain", True, False, 16, 8),
])
def test_reference_resblock_parity(norm, upsample, downsample, cin, cout):
    from latentpose_tpu.nn.blocks import ResBlock
    ref = ref_blocks.ResBlock(cin, cout, tnn.ZeroPad2d, upsample, downsample,
                              norm)
    ours = ResBlock(in_features=cin, out_features=cout,
                    norm_layer="adain" if norm == "adain" else norm,
                    upsample=upsample, downsample=downsample)
    run_block_pair(
        ref, ours,
        lambda sd: cw.convert_resblock(sd, "", normalize=norm != "none",
                                       upsample=upsample,
                                       downsample=downsample)[:2],
        cin, adain=norm == "adain")


def test_reference_resblock_reflection_parity():
    from latentpose_tpu.nn.blocks import ResBlock
    ref = ref_blocks.ResBlock(8, 8, tnn.ReflectionPad2d, False, False, "in")
    ours = ResBlock(in_features=8, out_features=8, norm_layer="in",
                    padding="reflection")
    run_block_pair(
        ref, ours,
        lambda sd: cw.convert_resblock(sd, "", normalize=True,
                                       upsample=False, downsample=False),
        8)


@pytest.mark.parametrize("cin,cout,grouped", [(8, 16, True), (6, 10, False)])
def test_reference_shuffle_conv_parity(cin, cout, grouped):
    from latentpose_tpu.nn.blocks import ShuffleConv
    torch.manual_seed(11)
    ref = ref_blocks.shuffleConv(cin, cout, 3, 1, 1).eval()
    has_grouped = any("block.3" in k for k in ref.state_dict())
    assert has_grouped == grouped
    ours = ShuffleConv(in_features=cin, out_features=cout)
    run_block_pair(ref, ours, lambda sd: cw.convert_shuffle_conv(sd, ""),
                   cin)


@pytest.mark.parametrize("norm,upsample,cin,cout", [
    ("in", False, 8, 8),
    ("in", True, 8, 16),
    ("adain", False, 16, 8),
])
def test_reference_resblock_shuffle_parity(norm, upsample, cin, cout):
    from latentpose_tpu.nn.blocks import ResBlockShuffle
    ref = ref_blocks.ResBlockShuffle(
        cin, cout, tnn.ZeroPad2d, upsample, False,
        norm)
    ours = ResBlockShuffle(in_features=cin, out_features=cout,
                           norm_layer=norm, upsample=upsample)
    run_block_pair(
        ref, ours,
        lambda sd: cw.convert_resblock_shuffle(sd, "",
                                               normalize=True,
                                               upsample=upsample),
        cin, adain=norm == "adain")


@pytest.mark.parametrize("resize,norm,act_ref,act_ours", [
    ("nearest", "in", tnn.ReLU, None),
    ("avgpool", "none", tnn.ReLU, None),
    ("none", "adain", tnn.LeakyReLU, "leaky"),
])
def test_reference_resblock_v2_parity(resize, norm, act_ref, act_ours):
    import flax.linen as fnn
    from latentpose_tpu.nn.blocks import ResBlockV2
    cin, cout = 8, 16
    ref = ref_blocks.ResBlockV2(cin, cout, 2, 1, resize, norm, act_ref)
    activation = (lambda x: fnn.leaky_relu(x, 0.01)) \
        if act_ours == "leaky" else fnn.relu
    ours = ResBlockV2(in_features=cin, out_features=cout,
                      resize_layer=resize, norm_layer=norm,
                      activation=activation)
    run_block_pair(
        ref, ours,
        lambda sd: cw.convert_resblock_v2(sd, "", normalize=norm != "none",
                                          upsample=resize == "nearest"),
        cin, adain=norm == "adain")


@pytest.mark.parametrize("resize,norm", [("nearest", "in"), ("none", "in")])
def test_reference_resblock_v2_shuffle_parity(resize, norm):
    from latentpose_tpu.nn.blocks import ResBlockV2Shuffle
    cin, cout = 8, 16
    ref = ref_blocks.ResBlockV2Shuffle(cin, cout, 2, 1, resize, norm,
                                       tnn.ReLU)
    ours = ResBlockV2Shuffle(in_features=cin, out_features=cout,
                             resize_layer=resize, norm_layer=norm)
    run_block_pair(
        ref, ours,
        lambda sd: cw.convert_resblock_v2_shuffle(
            sd, "", normalize=True, upsample=resize == "nearest"),
        cin)


# ---------------------------------------------------------------------------
# Losses (criterions/*) — value parity on one fixed batch
# ---------------------------------------------------------------------------

def torch_dict(np_dict):
    return {k: (torch.from_numpy(v) if isinstance(v, np.ndarray)
                else [torch.from_numpy(f) for f in v])
            for k, v in np_dict.items()}


def jax_dict(np_dict):
    return {k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                else [jnp.asarray(f) for f in v])
            for k, v in np_dict.items()}


def make_loss_batch():
    rng = np.random.default_rng(9)
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    return {
        "fake_score_G": f32(4), "fake_score_D": f32(4), "real_score": f32(4),
        "fake_features": [f32(4, 8, 6, 6), f32(4, 16, 3, 3)],
        "real_features": [f32(4, 8, 6, 6), f32(4, 16, 3, 3)],
        "fake_segm": rng.random((4, 1, 6, 6), dtype=np.float32) + 0.1,
        "real_segm": rng.random((4, 1, 1, 6, 6), dtype=np.float32) + 0.1,
        "embeds_elemwise": f32(4, 8, 32),
        "real_embedding": f32(4, 32),
        "fake_rgbs": rng.random((4, 3, 6, 6), dtype=np.float32),
        "target_rgbs": rng.random((4, 1, 3, 6, 6), dtype=np.float32),
    }


@pytest.mark.parametrize("gan_type", ["gan", "rgan", "ragan"])
def test_reference_adversarial_loss_parity(gan_type):
    ref_mod = importlib.import_module("criterions.adversarial")
    from latentpose_tpu.losses import adversarial as ours_mod
    args = Namespace(gan_type=gan_type, device="cpu")
    batch = make_loss_batch()
    g_ref, d_ref = ref_mod.Wrapper.get_net(args)(torch_dict(batch))
    g_ours, d_ours = ours_mod.Wrapper.get_net(args)(jax_dict(batch))
    np.testing.assert_allclose(float(g_ours["adversarial_G"]),
                               float(g_ref["adversarial_G"]), rtol=1e-5)
    np.testing.assert_allclose(float(d_ours["adversarial_D"]),
                               float(d_ref["adversarial_D"]), rtol=1e-5)


@pytest.mark.parametrize("ref_name,our_name,args,key", [
    ("featmat", "featmat", {"fm_weight": 10.0}, "feature_matching"),
    ("dice", "dice", {"dice_weight": 1.0}, "segmentation_dice"),
    ("dis_embed", "dis_embed", {"dis_embed_weight": 1e-2},
     "embedding_matching"),
    ("l1_rgb", "l1_rgb", {"l1_weight": 30.0}, "l1_rgb"),
])
def test_reference_loss_value_parity(ref_name, our_name, args, key):
    ref_mod = importlib.import_module(f"criterions.{ref_name}")
    ours_mod = importlib.import_module(f"latentpose_tpu.losses.{our_name}")
    ns = Namespace(device="cpu", **args)
    batch = make_loss_batch()
    ref_out = ref_mod.Wrapper.get_net(ns)(torch_dict(batch))
    our_out = ours_mod.Wrapper.get_net(ns)(jax_dict(batch))
    if isinstance(ref_out, tuple):
        ref_out = ref_out[0]
    if isinstance(our_out, tuple):
        our_out = our_out[0]
    np.testing.assert_allclose(float(our_out[key]), float(ref_out[key]),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# Embedder (arms automatically when torchvision is installed)
# ---------------------------------------------------------------------------

def test_reference_embedder_forward_parity():
    # The reference embedder builds its towers through torchvision
    # (absent in this env); tools/torchvision_shim.py provides the
    # canonical resnext50_32x4d/mobilenet_v2 architectures with
    # torchvision-exact state_dict names (param counts pinned in
    # test_torchvision_shim.py), so the REAL reference module runs here.
    import torchvision_shim
    torchvision_shim.install()
    ref_emb_mod = importlib.import_module(
        "embedders.unsupervised_pose_separate_embResNeXt_segmentation")
    from latentpose_tpu.models.embedders import (
        unsupervised_pose_separate_embResNeXt_segmentation as our_mod)

    args = Namespace(embed_channels=512, pose_embedding_size=256,
                     average_function="sum", image_size=64, device="cpu",
                     finetune=False)
    torch.manual_seed(10)
    ref = ref_emb_mod.Wrapper.get_net(args).eval()
    rng = np.random.default_rng(11)
    enc = rng.random((1, 8, 3, 64, 64), dtype=np.float32)
    pose_in = rng.random((1, 1, 3, 64, 64), dtype=np.float32)
    data_dict = {"enc_rgbs": torch.from_numpy(enc),
                 "pose_input_rgbs": torch.from_numpy(pose_in)}
    with torch.no_grad():
        ref(data_dict)

    params, batch_stats = cw.convert_flagship_embedder(sd_np(ref))
    m = our_mod.Embedder(identity_embedding_size=512,
                         pose_embedding_size=256)
    embeds, embeds_elemwise, pose = m.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(np.transpose(enc, (0, 1, 3, 4, 2))),
        jnp.asarray(np.transpose(pose_in, (0, 1, 3, 4, 2))),
        train=False)
    np.testing.assert_allclose(np.asarray(embeds),
                               data_dict["embeds"].numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pose),
                               data_dict["pose_embedding"].numpy(),
                               rtol=1e-3, atol=1e-3)
