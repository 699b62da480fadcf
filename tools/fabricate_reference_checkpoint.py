#!/usr/bin/env python3
"""Fabricate a reference-shaped ``model_<iter>.pth`` checkpoint.

Dress rehearsal for real-checkpoint day (the released latent-pose weights
are unobtainable in this zero-egress sandbox — WEIGHTS.md): build a torch
checkpoint with the reference's EXACT key layout and shapes —

- ``embedder``: torchvision-convention ``identity_encoder.*``
  (resnext50_32x4d) + ``pose_encoder.*`` (mobilenet_v2) state dict
  (reference ``embedders/unsupervised_pose_separate_embResNeXt_
  segmentation.py:27-28``);
- ``generator``: ``constant.constant`` + ``decoder_blocks.{0..7}`` AdaIN
  res/up blocks + head conv at ``decoder_blocks.10`` +
  ``affine_params_projector.{0,2}`` with torch ``spectral_norm`` tensors
  (``weight_orig``/``weight_u``) (reference ``generators/vector_pose_
  unsupervised_segmentation_noBottleneck.py:62-101``);
- ``discriminator``: ``down_block``/``skip`` stem + ``blocks.{0..5}`` +
  ``linear`` + ``embed`` (reference ``discriminators/no_landmarks.py:52-108``);
- ``running_averages``: EMA copies of embedder + generator
  (reference ``runners/holycow.py:99-109``);
- ``optimizer_G``/``optimizer_D`` state dicts (skipped by conversion, like
  the reference's own finetune transition — ``utils/utils.py:378-392``);
- the full ``args`` Namespace (reference ``utils/utils.py:260-275``).

so that ``tools/convert_torch_weights.py checkpoint`` and everything
downstream (fine-tune, drive) can be exercised at FULL flagship size before
a real file ever arrives.

    python tools/fabricate_reference_checkpoint.py out_dir [--image_size 256]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _t(rng, *shape, scale=0.05):
    import torch
    return torch.from_numpy(
        (rng.randn(*shape) * scale).astype(np.float32))


def _sn(sd, prefix, rng, *wshape, bias=True):
    """torch.nn.utils.spectral_norm tensor triple for a conv/linear."""
    import torch
    sd[prefix + ".weight_orig"] = _t(rng, *wshape)
    u = rng.randn(wshape[0]).astype(np.float32)
    sd[prefix + ".weight_u"] = torch.from_numpy(u / np.linalg.norm(u))
    if bias:
        sd[prefix + ".bias"] = _t(rng, wshape[0], scale=0.01)


def _bn(sd, prefix, rng, ch):
    import torch
    sd[prefix + ".weight"] = torch.from_numpy(
        1.0 + 0.05 * rng.randn(ch).astype(np.float32))
    sd[prefix + ".bias"] = _t(rng, ch, scale=0.01)
    sd[prefix + ".running_mean"] = _t(rng, ch, scale=0.01)
    sd[prefix + ".running_var"] = torch.from_numpy(
        1.0 + 0.05 * np.abs(rng.randn(ch)).astype(np.float32))
    sd[prefix + ".num_batches_tracked"] = torch.tensor(1000)


def resnext50_sd(rng, prefix="", num_classes=512):
    """torchvision resnext50_32x4d(num_classes=512) state-dict layout."""
    import torch
    sd = {}
    sd[prefix + "conv1.weight"] = _t(rng, 64, 3, 7, 7)
    _bn(sd, prefix + "bn1", rng, 64)
    in_ch = 64
    for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3)), start=1):
        width = planes * 2  # int(planes * 4/64) * 32 groups
        for i in range(blocks):
            p = f"{prefix}layer{stage}.{i}."
            sd[p + "conv1.weight"] = _t(rng, width, in_ch, 1, 1)
            _bn(sd, p + "bn1", rng, width)
            # grouped conv: in-channels per group = width / 32
            sd[p + "conv2.weight"] = _t(rng, width, width // 32, 3, 3)
            _bn(sd, p + "bn2", rng, width)
            sd[p + "conv3.weight"] = _t(rng, planes * 4, width, 1, 1)
            _bn(sd, p + "bn3", rng, planes * 4)
            if i == 0:  # every stage downsamples (layer1: 64 -> 256)
                sd[p + "downsample.0.weight"] = _t(rng, planes * 4, in_ch,
                                                   1, 1)
                _bn(sd, p + "downsample.1", rng, planes * 4)
            in_ch = planes * 4
    sd[prefix + "fc.weight"] = _t(rng, num_classes, 2048)
    sd[prefix + "fc.bias"] = _t(rng, num_classes, scale=0.01)
    assert isinstance(sd[prefix + "conv1.weight"], torch.Tensor)
    return sd


MOBILENET_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                      (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                      (6, 320, 1, 1))


def mobilenet_v2_sd(rng, prefix="", num_classes=256):
    """torchvision mobilenet_v2(num_classes=256) state-dict layout."""
    sd = {}
    sd[prefix + "features.0.0.weight"] = _t(rng, 32, 3, 3, 3)
    _bn(sd, prefix + "features.0.1", rng, 32)
    in_ch, fi = 32, 1
    for t, c, n, _s in MOBILENET_SETTINGS:
        for _ in range(n):
            hidden = in_ch * t
            p = f"{prefix}features.{fi}.conv."
            if t == 1:
                sd[p + "0.0.weight"] = _t(rng, hidden, 1, 3, 3)  # depthwise
                _bn(sd, p + "0.1", rng, hidden)
                sd[p + "1.weight"] = _t(rng, c, hidden, 1, 1)
                _bn(sd, p + "2", rng, c)
            else:
                sd[p + "0.0.weight"] = _t(rng, hidden, in_ch, 1, 1)
                _bn(sd, p + "0.1", rng, hidden)
                sd[p + "1.0.weight"] = _t(rng, hidden, 1, 3, 3)  # depthwise
                _bn(sd, p + "1.1", rng, hidden)
                sd[p + "2.weight"] = _t(rng, c, hidden, 1, 1)
                _bn(sd, p + "3", rng, c)
            in_ch, fi = c, fi + 1
    sd[prefix + "features.18.0.weight"] = _t(rng, 1280, 320, 1, 1)
    _bn(sd, prefix + "features.18.1", rng, 1280)
    sd[prefix + "classifier.1.weight"] = _t(rng, num_classes, 1280)
    sd[prefix + "classifier.1.bias"] = _t(rng, num_classes, scale=0.01)
    return sd


def embedder_sd(rng, identity_embedding_size=512, pose_embedding_size=256):
    sd = {}
    sd.update(resnext50_sd(rng, "identity_encoder.",
                           identity_embedding_size))
    sd.update(mobilenet_v2_sd(rng, "pose_encoder.", pose_embedding_size))
    return sd


def _norm_resblock_sd(sd, prefix, rng, in_ch, out_ch, upsample):
    """AdaIN ResBlock (reference blocks.py:47-111, normalize=True):
    torch Sequential indices [norm0, ReLU, (Up), pad, conv0, norm1, ReLU,
    pad, conv1]; convs have no bias when normalized."""
    c0 = 4 if upsample else 3
    _sn(sd, f"{prefix}.block.{c0}", rng, out_ch, in_ch, 3, 3, bias=False)
    _sn(sd, f"{prefix}.block.{c0 + 4}", rng, out_ch, out_ch, 3, 3,
        bias=False)
    if in_ch != out_ch or upsample:
        _sn(sd, f"{prefix}.skip.{1 if upsample else 0}", rng,
            out_ch, in_ch, 1, 1, bias=True)


def _plain_resblock_sd(sd, prefix, rng, in_ch, out_ch, downsample):
    """No-norm ResBlock (discriminator): [ReLU, pad, conv0, ReLU, pad,
    conv1, (pool)]; convs keep their bias."""
    _sn(sd, f"{prefix}.block.2", rng, out_ch, in_ch, 3, 3, bias=True)
    _sn(sd, f"{prefix}.block.5", rng, out_ch, out_ch, 3, 3, bias=True)
    if in_ch != out_ch or downsample:
        _sn(sd, f"{prefix}.skip.0", rng, out_ch, in_ch, 1, 1, bias=True)


def generator_schedule(image_size=256, num_channels=64,
                       max_num_channels=512, constant_input_size=4,
                       num_residual_blocks=2):
    """(in, out, upsample) per decoder block + per-AdaIN feature list —
    mirrors the reference channel plan (generators/...noBottleneck.py:60-80)
    and our Generator._schedule."""
    import math
    num_up = int(math.log2(image_size / constant_input_size))
    nonclamped = num_channels * (2 ** num_up)
    ch = min(nonclamped, max_num_channels)
    blocks = [(ch, ch, False)] * num_residual_blocks
    for _ in range(num_up):
        in_ch = ch
        nonclamped //= 2
        ch = min(nonclamped, max_num_channels)
        blocks.append((in_ch, ch, True))
    feats = []
    for i, o, _ in blocks:
        feats += [i, o]
    feats.append(ch)  # head AdaIN
    return blocks, feats, ch


def generator_sd(rng, image_size=256, num_channels=64, max_num_channels=512,
                 identity_embedding_size=512, pose_embedding_size=256,
                 out_channels=3, num_residual_blocks=2, finetune=False,
                 constant_input_size=4):
    import torch
    blocks, feats, head_ch = generator_schedule(
        image_size, num_channels, max_num_channels, constant_input_size,
        num_residual_blocks)
    sd = {}
    c0 = blocks[0][0]
    sd["constant.constant"] = torch.ones(1, c0, constant_input_size,
                                         constant_input_size)
    for i, (ic, oc, up) in enumerate(blocks):
        _norm_resblock_sd(sd, f"decoder_blocks.{i}", rng, ic, oc, up)
    # [len]=AdaIN (paramless), [len+1]=ReLU, [len+2]=head conv
    _sn(sd, f"decoder_blocks.{len(blocks) + 2}", rng,
        out_channels + 1, head_ch, 3, 3, bias=True)
    joint = identity_embedding_size + pose_embedding_size
    hidden = max(joint, 512)
    _sn(sd, "affine_params_projector.0", rng, hidden, joint)
    _sn(sd, "affine_params_projector.2", rng, sum(2 * f for f in feats),
        hidden)
    if finetune:  # fine-tuned checkpoints carry the avatar embedding
        sd["identity_embedding"] = _t(rng, 1, identity_embedding_size,
                                      scale=0.5)
    return sd


def discriminator_sd(rng, image_size=256, num_channels=64,
                     max_num_channels=512, embed_channels=512,
                     dis_num_blocks=7, num_labels=100, in_channels=3):
    import math
    sd = {}
    _sn(sd, "down_block.0", rng, num_channels, in_channels, 3, 3)
    _sn(sd, "down_block.2", rng, num_channels, num_channels, 3, 3)
    _sn(sd, "skip.0", rng, num_channels, in_channels, 1, 1)
    num_down = min(int(math.log2(image_size)) - 2, dis_num_blocks)
    in_ch, bi = num_channels, 0
    for i in range(1, num_down):
        out_ch = min(in_ch * 2, max_num_channels)
        if i == dis_num_blocks - 1:
            out_ch = embed_channels
        _plain_resblock_sd(sd, f"blocks.{bi}", rng, in_ch, out_ch, True)
        in_ch, bi = out_ch, bi + 1
    for i in range(num_down, dis_num_blocks):
        out_ch = embed_channels if i == dis_num_blocks - 1 else in_ch
        _plain_resblock_sd(sd, f"blocks.{bi}", rng, in_ch, out_ch, False)
        in_ch, bi = out_ch, bi + 1
    _sn(sd, "linear", rng, 1, embed_channels)
    _sn(sd, "embed", rng, num_labels, embed_channels, bias=False)
    return sd


def reference_args(image_size=256, num_labels=100, iteration=1000):
    """The args Namespace a reference checkpoint carries (train.py:22-91 +
    plugin get_args defaults, configs/default.yaml)."""
    return SimpleNamespace(
        embedder="unsupervised_pose_separate_embResNeXt_segmentation",
        generator="vector_pose_unsupervised_segmentation_noBottleneck",
        discriminator="no_landmarks",
        criterions="adversarial, perceptual, idt_embed, featmat, "
                   "dis_embed, dice",
        metrics="", dataloader="voxceleb2_segmentation_nolandmarks",
        runner="holycow",
        image_size=image_size, in_channels=3, out_channels=3,
        num_channels=64, max_num_channels=512, embed_channels=512,
        pose_embedding_size=256, dis_num_blocks=7,
        gen_constant_input_size=4, gen_num_residual_blocks=2,
        gen_padding="zero", dis_padding="zero", norm_layer="in",
        average_function="sum", num_labels=num_labels,
        optimizer="Adam", lr_gen=5e-5, lr_dis=2e-4, beta1=0.0,
        batch_size=8, num_epochs=1000, iteration=iteration,
        finetune=False, inference=False, random_seed=123,
        use_pixelwise_augs=True, use_affine_scale=True,
        use_affine_shift=True,
        gan_type="gan", fm_weight=10.0, dice_weight=1.0,
        perc_weight=3e-2, idt_embed_weight=0.6e-2, dis_embed_weight=1e-2,
        experiment_name="fabricated", config_name="default")


def fabricate(out_path, image_size=256, num_labels=100, iteration=1000,
              seed=0, finetune=False):
    import torch
    rng = np.random.RandomState(seed)
    emb = embedder_sd(rng)
    gen = generator_sd(rng, image_size=image_size, finetune=finetune)
    dis = discriminator_sd(rng, image_size=image_size,
                           num_labels=1 if finetune else num_labels)
    # EMA copies (deterministically different from the live weights)
    ema_rng = np.random.RandomState(seed + 1)
    ckpt = {
        "embedder": emb,
        "generator": gen,
        "discriminator": dis,
        "running_averages": {
            "embedder": embedder_sd(ema_rng),
            "generator": generator_sd(ema_rng, image_size=image_size,
                                      finetune=finetune),
        },
        # conversion skips optimizer state, like the reference's own
        # finetune transition (utils/utils.py:378-392) — present so the
        # file is structurally complete
        "optimizer_G": {"state": {}, "param_groups": [{"lr": 5e-5}]},
        "optimizer_D": {"state": {}, "param_groups": [{"lr": 2e-4}]},
        "args": reference_args(image_size, num_labels, iteration),
    }
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(ckpt, out_path)
    n_tensors = sum(len(v) for k, v in ckpt.items()
                    if isinstance(v, dict) and k != "running_averages")
    print(f"wrote {out_path} ({n_tensors}+EMA tensors, "
          f"image_size={image_size}, labels={num_labels})")
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output .pth path or directory")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--num_labels", type=int, default=100)
    ap.add_argument("--iteration", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--finetune", action="store_true")
    ns = ap.parse_args(argv)
    out = Path(ns.out)
    if out.suffix != ".pth":
        out = out / f"model_{ns.iteration:08d}.pth"
    fabricate(out, ns.image_size, ns.num_labels, ns.iteration, ns.seed,
              ns.finetune)


if __name__ == "__main__":
    main()
