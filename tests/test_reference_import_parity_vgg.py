"""VGG criterion parity against the ACTUAL reference implementation.

The reference's perceptual (``criterions/perceptual.py``) and VGGFace
identity (``criterions/idt_embed.py``) criteria were previously untestable
against the real code: they ``torch.load`` pretrained .pth files
unconditionally (``criterions/common/perceptual_loss.py:32-60``) and build
their towers through torchvision — both absent in this zero-egress env.

Weight VALUES are irrelevant for code parity, so here we:
  1. install tools/torchvision_shim.py (state-dict-exact vgg19/vgg16),
  2. FABRICATE ``vgg19-d01eb7cb.pth`` / ``vgg_face_weights.pth`` with
     seeded random weights in the exact key conventions the reference's
     loading code expects (torchvision names with the caffe classifier
     re-index for vgg19; bare feature indices for vgg_face),
  3. run the REAL reference Criterion modules on a fixed batch,
  4. convert the same weights through tools/convert_torch_weights.py and
     run our criteria,
  5. assert loss-value parity.

This machine-checks everything except the unobtainable weight values: the
30-layer truncation with MaxPool->AvgPool swap
(``perceptual_loss.py:70-86``), the caffe normalization (BGR means applied
to RGB without a flip, ``:45-46,88-89``), the (x+1)/2 remap and per-ReLU
L1 accumulation (``:90-109``), idt_embed's keypoint-bbox formula and fixed
1/1.8 center crop (``idt_embed.py:29-49,85-104``), and the differentiable
affine-grid reflection crop_and_resize (``idt_embed.py:58-83``).
"""

import importlib
import sys
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

import jax.numpy as jnp  # noqa: E402

import convert_torch_weights as cw  # noqa: E402

ref_perc_mod = importlib.import_module("criterions.perceptual")
ref_idt_mod = importlib.import_module("criterions.idt_embed")

from latentpose_tpu.losses import idt_embed as our_idt_mod  # noqa: E402
from latentpose_tpu.losses import perceptual as our_perc_mod  # noqa: E402


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    """One dir holding BOTH the fabricated .pth files (for the reference)
    and their converted .npz (for us)."""
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


def make_batch(seed=2, batch=2, size=64, keypoints=False):
    rng = np.random.default_rng(seed)
    fake = rng.uniform(-1, 1, (batch, 1, 3, size, size)).astype(np.float32)
    real = rng.uniform(-1, 1, (batch, 1, 3, size, size)).astype(np.float32)
    torch_dict = {"fake_rgbs": torch.from_numpy(fake),
                  "target_rgbs": torch.from_numpy(real)}
    jax_dict = {"fake_rgbs": jnp.asarray(np.transpose(fake, (0, 1, 3, 4, 2))),
                "target_rgbs": jnp.asarray(np.transpose(real,
                                                        (0, 1, 3, 4, 2)))}
    if keypoints:
        # normalized [0,1] iBUG-68 layout: y[27] (nose bridge) above y[8]
        # (chin) so face_height is positive, like real data
        kp = rng.uniform(0.3, 0.7, (batch, 68, 2)).astype(np.float32)
        kp[:, 27, 1] = 0.30
        kp[:, 8, 1] = 0.75
        kp = kp.reshape(batch, 136)
        torch_dict["dec_keypoints"] = torch.from_numpy(kp)
        jax_dict["dec_keypoints"] = jnp.asarray(kp)
    return torch_dict, jax_dict


# ---------------------------------------------------------------------------
# Perceptual (caffe VGG19)
# ---------------------------------------------------------------------------

def test_reference_perceptual_loss_parity(weights_dir):
    ref = ref_perc_mod.Criterion(1e-2, str(weights_dir)).eval()
    torch_dict, jax_dict = make_batch()
    with torch.no_grad():
        ref_loss = ref(torch_dict)["VGG"].item()

    ours = our_perc_mod.Criterion(1e-2, str(weights_dir))
    our_loss = float(ours(jax_dict)["VGG"])
    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-4)
    assert ref_loss > 0


# ---------------------------------------------------------------------------
# idt_embed (VGGFace VGG16 + differentiable crop)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("keypoints", [False, True],
                         ids=["fixed_center_crop", "keypoint_bboxes"])
def test_reference_idt_embed_loss_parity(weights_dir, keypoints):
    ref = ref_idt_mod.Criterion(2e-3, str(weights_dir)).eval()
    torch_dict, jax_dict = make_batch(seed=3, keypoints=keypoints)
    with torch.no_grad():
        ref_loss = ref(torch_dict)["VGGFace"].item()

    ours = our_idt_mod.Criterion(2e-3, str(weights_dir))
    our_loss = float(ours(jax_dict)["VGGFace"])
    np.testing.assert_allclose(our_loss, ref_loss, rtol=5e-4)
    assert ref_loss > 0


def test_reference_crop_and_resize_parity():
    """The differentiable crop in isolation (idt_embed.py:58-83:
    affine_grid(align_corners=False) + grid_sample bilinear reflection)."""
    from latentpose_tpu.ops.resample import crop_and_resize

    rng = np.random.default_rng(4)
    imgs = rng.random((3, 3, 32, 32), dtype=np.float32)
    bboxes = np.array([[5.0, 25.0, 4.0, 24.0],
                       [-3.0, 30.0, 2.0, 35.0],      # out-of-bounds crop
                       [8.0, 20.0, 8.0, 20.0]], np.float32)
    ref_out = ref_idt_mod.crop_and_resize(torch.from_numpy(imgs),
                                          torch.from_numpy(bboxes)).numpy()
    our_out = np.asarray(crop_and_resize(
        jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))),
        jnp.asarray(bboxes)))
    np.testing.assert_allclose(np.transpose(our_out, (0, 3, 1, 2)), ref_out,
                               atol=2e-5)
