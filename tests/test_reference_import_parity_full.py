"""FULL composed training-forward parity against the real reference.

The component import-parity tests (test_reference_import_parity*.py) pin
each module in isolation.  This test runs the reference's actual
``runners.holycow.TrainingModule.forward`` (``/root/reference/runners/
holycow.py:153-201``) — real embedder -> generator -> discriminator ->
all six default criteria (``configs/default.yaml:4``: idt_embed,
perceptual, adversarial, featmat, dis_embed, dice) — on one fixed batch,
then runs OUR ``runners.holycow.forward`` + ``apply_criteria`` with the
converted weights and asserts every loss value in losses_G / losses_D
matches.  This is the strongest statement short of real weight files: the
whole composition (data_dict flow, who consumes which keys, the 3-pass
discriminator protocol feeding adversarial/featmat/dis_embed, loss
weighting) is machine-checked against the reference code itself.

Environment shims (values never matter, only code paths):
- tools/torchvision_shim.py supplies the torchvision architectures,
- fabricated random VGG .pth files satisfy the criteria's unconditional
  torch.load (perceptual_loss.py:32-60),
- a 2-line yamlenv stub (pyyaml passthrough) satisfies utils/utils.py:13.
"""

import importlib
import sys
import types
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

import torchvision_shim  # noqa: E402

torchvision_shim.install()

# reference utils/utils.py imports yamlenv (absent): stub with pyyaml
if "yamlenv" not in sys.modules:
    try:
        import yamlenv  # noqa: F401
    except ImportError:
        import yaml

        _stub = types.ModuleType("yamlenv")
        _stub.load = yaml.safe_load
        sys.modules["yamlenv"] = _stub

import jax.numpy as jnp  # noqa: E402

import convert_torch_weights as cw  # noqa: E402

ref_runner = importlib.import_module("runners.holycow")

from latentpose_tpu.runners import holycow as our_runner  # noqa: E402

# One shared arg namespace: in the reference all three nets and the
# criteria resolve from the same config, so embed_channels etc. must be
# consistent for the composed flow (dis_embed compares the embedder's
# embeds_elemwise against the discriminator's W row).
ARGS = Namespace(
    # models
    embed_channels=16, pose_embedding_size=8, average_function="sum",
    in_channels=3, out_channels=3, num_channels=8, max_num_channels=32,
    norm_layer="in", gen_padding="zero", gen_constant_input_size=4,
    gen_num_residual_blocks=2, dis_padding="zero", dis_num_blocks=4,
    num_labels=5, image_size=32, device="cpu",
    # criteria (reference defaults)
    gan_type="gan", fm_weight=10.0, dice_weight=1.0, dis_embed_weight=1e-2,
    perc_weight=1e-2, idt_embed_weight=2e-3,
)

CRITERIA = ("idt_embed", "perceptual", "adversarial", "featmat",
            "dis_embed", "dice")

B, K, H = 2, 2, 32


def make_batch(seed=7):
    rng = np.random.default_rng(seed)
    enc = rng.uniform(-1, 1, (B, K, 3, H, H)).astype(np.float32)
    pose = rng.uniform(-1, 1, (B, 1, 3, H, H)).astype(np.float32)
    target = rng.uniform(-1, 1, (B, 1, 3, H, H)).astype(np.float32)
    segm = rng.uniform(0, 1, (B, 1, 1, H, H)).astype(np.float32)
    label = np.array([1, 4], np.int64)[:B]
    data_dict = {"enc_rgbs": torch.from_numpy(enc),
                 "pose_input_rgbs": torch.from_numpy(pose),
                 "label": torch.from_numpy(label)}
    target_dict = {"target_rgbs": torch.from_numpy(target),
                   "real_segm": torch.from_numpy(segm)}

    def nhwc5(t):
        return jnp.asarray(np.transpose(t, (0, 1, 3, 4, 2)))

    batch = {"enc_rgbs": nhwc5(enc), "pose_input_rgbs": nhwc5(pose),
             "target_rgbs": nhwc5(target), "real_segm": nhwc5(segm),
             "label": jnp.asarray(label)}
    return data_dict, target_dict, batch


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vgg_weights")
    sd19 = torchvision_shim.fabricate_vgg19_caffe_pth(
        d / "vgg19-d01eb7cb.pth")
    sd16 = torchvision_shim.fabricate_vgg_face_pth(
        d / "vgg_face_weights.pth")
    np19 = {k: v.numpy() for k, v in sd19.items()}
    np16 = {k: v.numpy() for k, v in sd16.items()}
    cw.save_flat_npz(cw.convert_vgg(np19, cw.VGG19_CONV_INDICES),
                     d / "vgg19_caffe.npz")
    cw.save_flat_npz(cw.convert_vgg(np16, cw.VGG16_CONV_INDICES),
                     d / "vgg_face.npz")
    return d


def build_reference_training_module(weights_dir, burn_in=5):
    args = Namespace(**vars(ARGS), vgg_weights_dir=str(weights_dir))
    torch.manual_seed(0)
    emb_mod = importlib.import_module(
        "embedders.unsupervised_pose_separate_embResNeXt_segmentation")
    gen_mod = importlib.import_module(
        "generators.vector_pose_unsupervised_segmentation_noBottleneck")
    dis_mod = importlib.import_module("discriminators.no_landmarks")
    embedder = emb_mod.Wrapper.get_net(args)
    generator = gen_mod.Wrapper.get_net(args)
    # the learned constant initializes to ones — perturb it so a layout
    # mistake cannot hide behind the symmetry
    generator.constant.constant.data.normal_()
    discriminator = dis_mod.Wrapper.get_net(args)
    criteria = [importlib.import_module(f"criterions.{name}")
                .Wrapper.get_net(args) for name in CRITERIA]
    tm = ref_runner.TrainingModule(embedder, generator, discriminator,
                                   criteria, [])

    # Settle every spectral-norm layer's power iteration with a few
    # train-mode forwards (fresh random (u, v) make sigma a near-zero
    # estimate and the unnormalized trunks explode — trained checkpoints
    # never look like that; see test_reference_import_parity.py).
    tm.train()
    data_dict, target_dict, _ = make_batch(seed=99)
    for _ in range(burn_in):
        with torch.no_grad():
            tm(data_dict, target_dict)
    return tm.eval()


def build_our_side(tm, weights_dir):
    from latentpose_tpu.losses import (adversarial, dice, dis_embed,
                                       featmat, idt_embed, perceptual)
    from latentpose_tpu.models.discriminators import no_landmarks
    from latentpose_tpu.models.embedders import (
        unsupervised_pose_separate_embResNeXt_segmentation as emb_mod)
    from latentpose_tpu.models.generators import (
        vector_pose_unsupervised_segmentation_noBottleneck as gen_mod)

    def sd_np(module):
        return {k: v.detach().numpy().copy()
                for k, v in module.state_dict().items()}

    emb_p, emb_s = cw.convert_flagship_embedder(sd_np(tm.embedder))
    gen_p, gen_spec, extra = cw.convert_flagship_generator(
        sd_np(tm.generator))
    assert extra == {}
    dis_p, dis_spec = cw.convert_flagship_discriminator(
        sd_np(tm.discriminator))

    models = {
        "embedder": emb_mod.Embedder(identity_embedding_size=16,
                                     pose_embedding_size=8),
        "generator": gen_mod.Generator(
            num_channels=8, max_num_channels=32, identity_embedding_size=16,
            pose_embedding_size=8, output_image_size=32,
            num_residual_blocks=2),
        "discriminator": no_landmarks.Discriminator(
            num_channels=8, max_num_channels=32, embed_channels=16,
            num_blocks=4, image_size=32, num_labels=5),
    }
    params = {"embedder": emb_p, "generator": gen_p,
              "discriminator": dis_p}
    batch_stats = {"embedder": emb_s, "generator": {}, "discriminator": {}}
    spectral = {"embedder": {}, "generator": gen_spec,
                "discriminator": dis_spec}
    criteria = [
        idt_embed.Criterion(ARGS.idt_embed_weight, str(weights_dir)),
        perceptual.Criterion(ARGS.perc_weight, str(weights_dir)),
        adversarial.Criterion(ARGS.gan_type),
        featmat.Criterion(ARGS.fm_weight),
        dis_embed.Criterion(ARGS.dis_embed_weight),
        dice.Criterion(ARGS.dice_weight),
    ]
    return models, params, batch_stats, spectral, criteria


def test_reference_full_training_forward_parity(weights_dir):
    tm = build_reference_training_module(weights_dir)
    data_dict, target_dict, batch = make_batch()
    with torch.no_grad():
        out_dict, ref_losses_G, ref_losses_D = tm(data_dict, target_dict)

    models, params, batch_stats, spectral, criteria = build_our_side(
        tm, weights_dir)
    our_dict, _, _ = our_runner.forward(
        models, params, batch_stats, spectral, batch,
        train=False, update_stats=False, compute_losses=True)
    our_losses_G, our_losses_D = our_runner.apply_criteria(
        criteria, our_dict)

    # generated image parity through the composed embedder->generator path
    np.testing.assert_allclose(
        np.asarray(our_dict["fake_rgbs"]),
        np.transpose(out_dict["fake_rgbs"].numpy(), (0, 2, 3, 1)),
        rtol=2e-3, atol=1e-3)

    assert set(our_losses_G) == set(ref_losses_G), (
        sorted(our_losses_G), sorted(ref_losses_G))
    assert set(our_losses_D) == set(ref_losses_D)
    for name, ref_val in ref_losses_G.items():
        np.testing.assert_allclose(
            float(our_losses_G[name]), float(ref_val), rtol=2e-3,
            err_msg=f"losses_G[{name}]")
    for name, ref_val in ref_losses_D.items():
        np.testing.assert_allclose(
            float(our_losses_D[name]), float(ref_val), rtol=2e-3,
            err_msg=f"losses_D[{name}]")
    # sanity: none of the six terms degenerated to zero
    assert all(abs(float(v)) > 1e-7 for v in ref_losses_G.values())
