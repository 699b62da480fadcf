#!/usr/bin/env python3
"""Convert reference PyTorch weights into this framework's formats.

Everything here maps *state-dict keys* only (torch.load with
weights_only-style access; torchvision itself is never imported).

Supported conversions:
  vgg19    vgg19-d01eb7cb.pth          -> vgg19_caffe.npz   (perceptual)
  vggface  vgg_face_weights.pth        -> vgg_face.npz      (idt_embed)
  fan      2DFAN4 .pth (face-alignment) -> fan_2d.npz        (eval/crop)
  s3fd     s3fd .pth (face-alignment)   -> s3fd.npz          (crop)
  checkpoint  reference model_XXXXXXXX.pth -> our .ckpt directory
              (flagship embedder/generator/discriminator + EMA copies)

Usage:
  python tools/convert_torch_weights.py vgg19 IN.pth OUT_DIR
  python tools/convert_torch_weights.py checkpoint IN.pth OUT_DIR [--args k=v]

Conventions converted throughout: torch conv OIHW -> flax HWIO; torch Linear
(out, in) -> flax (in, out); BN weight/bias -> scale/bias + running stats
into "batch_stats"; torch spectral_norm's (weight_orig, weight_u[, weight_v])
-> raw kernel + the "spectral" (u, v) collection.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_torch_state_dict(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().numpy() if hasattr(v, "detach") else v
            for k, v in obj.items()}


def conv_kernel(w):
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w):
    """(out, in) -> (in, out)."""
    return np.transpose(w, (1, 0))


def save_flat_npz(flat, out_path):
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(out_path, **flat)
    print(f"wrote {out_path} ({len(flat)} arrays)")


# --------------------------------------------------------------------------
# VGG feature towers (criterions/common/perceptual_loss.py parity)
# --------------------------------------------------------------------------

VGG19_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30,
                      32, 34)
VGG16_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_vgg(sd, conv_indices):
    """torchvision-style 'features.N.weight' (or bare 'N.weight') keys ->
    our VGGFeatures 'conv<i>/kernel|bias' flat npz."""
    def get(idx, leaf):
        for pattern in (f"features.{idx}.{leaf}", f"{idx}.{leaf}"):
            if pattern in sd:
                return sd[pattern]
        raise KeyError(f"no key for features[{idx}].{leaf}")

    flat = {}
    for i, idx in enumerate(conv_indices):
        flat[f"conv{i}/kernel"] = conv_kernel(get(idx, "weight"))
        flat[f"conv{i}/bias"] = get(idx, "bias")
    return flat


# --------------------------------------------------------------------------
# Spectral-norm layers (torch spectral_norm parity)
# --------------------------------------------------------------------------

def sn_conv(sd, prefix):
    """torch SN conv -> (params, spectral) dicts for our SNConv."""
    w = sd[prefix + ".weight_orig"]
    u = sd[prefix + ".weight_u"]
    w2d = w.reshape(w.shape[0], -1)
    v = sd.get(prefix + ".weight_v")
    if v is None:
        v = w2d.T @ u
        v = v / max(np.linalg.norm(v), 1e-12)
    params = {"kernel": conv_kernel(w)}
    if prefix + ".bias" in sd:
        params["bias"] = sd[prefix + ".bias"]
    return params, {"u": u, "v": v}


def sn_dense(sd, prefix):
    w = sd[prefix + ".weight_orig"]
    u = sd[prefix + ".weight_u"]
    v = sd.get(prefix + ".weight_v")
    if v is None:
        v = w.T @ u
        v = v / max(np.linalg.norm(v), 1e-12)
    params = {"kernel": dense_kernel(w)}
    if prefix + ".bias" in sd:
        params["bias"] = sd[prefix + ".bias"]
    return params, {"u": u, "v": v}


def sn_embed(sd, prefix):
    w = sd[prefix + ".weight_orig"]
    u = sd[prefix + ".weight_u"]
    v = sd.get(prefix + ".weight_v")
    if v is None:
        v = w.T @ u
        v = v / max(np.linalg.norm(v), 1e-12)
    return {"embedding": w}, {"u": u, "v": v}


def bn(sd, prefix):
    return ({"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
            {"mean": sd[prefix + ".running_mean"],
             "var": sd[prefix + ".running_var"]})


# --------------------------------------------------------------------------
# Reference ResBlock (generators/common/blocks.py:47-111) -> our ResBlock
# --------------------------------------------------------------------------

def _j(prefix, rest):
    """Join a (possibly empty) state-dict prefix with a sub-key."""
    return f"{prefix}.{rest}" if prefix else rest


def convert_resblock(sd, prefix, normalize, upsample, downsample,
                     capture_norms=True):
    """Returns (params, spectral) for nn/blocks.ResBlock.

    torch Sequential indices (zero padding): with norm: [norm0, ReLU,
    (Up), pad, conv0, norm1, ReLU, pad, conv1, (Pool)]; without norm the
    norms are absent.  AdaptiveNorm2d normally has no stored params —
    but after FSTH's make_affine_params_trainable the assigned per-sample
    (weight, bias) become Parameters and appear in the state dict; pass
    ``capture_norms=False`` for 'ada*' blocks so those fine-tune leaves are
    not mistaken for InstanceNorm affine params (they are carried by the
    finetune_affine state leaf instead).
    """
    params, spectral = {}, {}

    def take_norm(name, idx):
        # 'in' norms (InstanceNorm2d affine=True) carry weight/bias
        if not capture_norms:
            return
        key = _j(prefix, f"block.{idx}.weight")
        if key in sd:
            params[name] = {"weight": sd[key],
                            "bias": sd[_j(prefix, f"block.{idx}.bias")]}

    idx = 0
    if normalize:
        take_norm("norm0", idx)
        idx += 1  # norm0
    idx += 1      # ReLU
    if upsample:
        idx += 1  # Upsample
    idx += 1      # empty pad Sequential
    conv0 = _j(prefix, f"block.{idx}")
    idx += 1
    if normalize:
        take_norm("norm1", idx)
        idx += 1  # norm1
    idx += 1      # ReLU
    idx += 1      # pad
    conv1 = _j(prefix, f"block.{idx}")

    p, s = sn_conv(sd, conv0)
    params["conv0"], spectral["conv0"] = p, s
    p, s = sn_conv(sd, conv1)
    params["conv1"], spectral["conv1"] = p, s

    skip_conv = _j(prefix, f"skip.{1 if upsample else 0}")
    if skip_conv + ".weight_orig" in sd:
        p, s = sn_conv(sd, skip_conv)
        params["skip"], spectral["skip"] = p, s
    return params, spectral


def convert_shuffle_conv(sd, prefix):
    """Reference shuffleConv (blocks.py:142-164) -> our ShuffleConv.

    Grouped branch: SN convs at Sequential indices 0/3/5; fallback branch:
    one SN conv at index 0.  Branch detected from the state dict."""
    params, spectral = {}, {}
    if _j(prefix, "block.3.weight_orig") in sd:
        for ours, idx in (("conv0", 0), ("conv1", 3), ("conv2", 5)):
            p, s = sn_conv(sd, _j(prefix, f"block.{idx}"))
            params[ours], spectral[ours] = p, s
    else:
        p, s = sn_conv(sd, _j(prefix, "block.0"))
        params["conv"], spectral["conv"] = p, s
    return params, spectral


def _convert_preact_block(sd, prefix, normalize, upsample, has_pads,
                          shuffle):
    """Shared walker for the pre-activation block family.

    Sequential layout: [norm0?] act [up?] (pad?) conv0 [norm1?] act (pad?)
    conv1 [pool?]; skip = [up?] conv.  ``has_pads`` covers the original
    ResBlock's zero-pad placeholder Sequentials (absent in the
    shuffle/V2 variants).  'in' norms (InstanceNorm2d affine=True) carry
    weight/bias; 'ada*' norms are paramless."""
    params, spectral = {}, {}
    idx = 0

    def take_norm(name):
        nonlocal idx
        if normalize:
            key = _j(prefix, f"block.{idx}.weight")
            if key in sd:
                params[name] = {"weight": sd[key],
                                "bias": sd[_j(prefix, f"block.{idx}.bias")]}
            idx += 1

    def take_conv(name):
        nonlocal idx
        if has_pads:
            idx += 1
        if shuffle:
            p, s = convert_shuffle_conv(sd, _j(prefix, f"block.{idx}"))
        else:
            p, s = sn_conv(sd, _j(prefix, f"block.{idx}"))
        params[name], spectral[name] = p, s
        idx += 1

    take_norm("norm0")
    idx += 1  # activation
    if upsample:
        idx += 1
    take_conv("sc0" if shuffle else "conv0")
    take_norm("norm1")
    idx += 1  # activation
    take_conv("sc1" if shuffle else "conv1")

    skip_prefix = _j(prefix, f"skip.{1 if upsample else 0}")
    skip_probe = (f"{skip_prefix}.block.0.weight_orig" if shuffle
                  else f"{skip_prefix}.weight_orig")
    if skip_probe in sd:
        if shuffle:
            p, s = convert_shuffle_conv(sd, skip_prefix)
        else:
            p, s = sn_conv(sd, skip_prefix)
        params["skip"], spectral["skip"] = p, s
    return params, spectral


def convert_resblock_shuffle(sd, prefix, normalize, upsample):
    """Reference ResBlockShuffle (blocks.py:167-235) -> our ResBlockShuffle."""
    return _convert_preact_block(sd, prefix, normalize, upsample,
                                 has_pads=False, shuffle=True)


def convert_resblock_v2(sd, prefix, normalize, upsample):
    """Reference ResBlockV2 (blocks.py:239-301) -> our ResBlockV2."""
    return _convert_preact_block(sd, prefix, normalize, upsample,
                                 has_pads=False, shuffle=False)


def convert_resblock_v2_shuffle(sd, prefix, normalize, upsample):
    """Reference ResBlockV2Shuffle (blocks.py:303-368) -> ours."""
    return _convert_preact_block(sd, prefix, normalize, upsample,
                                 has_pads=False, shuffle=True)


# --------------------------------------------------------------------------
# Flagship generator (vector_pose_unsupervised_segmentation_noBottleneck)
# --------------------------------------------------------------------------

def _infer_module_count(sd, prefix, fmt):
    """Highest consecutive index i for which any ``fmt.format(i)``-prefixed
    key exists (e.g. decoder_blocks.{i} / blocks.{i})."""
    n = 0
    while any(k.startswith(prefix + fmt.format(n)) for k in sd):
        n += 1
    return n


def convert_flagship_generator(sd, prefix="", num_blocks=None,
                               num_residual=2):
    params, spectral = {}, {}
    pf = prefix
    if num_blocks is None:
        # decoder_blocks = num_blocks ResBlocks, then [AdaIN, ReLU, head
        # conv]; AdaIN/ReLU are paramless, so the consecutive key scan
        # stops exactly at num_blocks — infer it so 64²-ablation
        # checkpoints (4 up blocks) convert too
        num_blocks = _infer_module_count(sd, pf, "decoder_blocks.{}.")

    params["constant"] = np.transpose(sd[pf + "constant.constant"],
                                      (0, 2, 3, 1))
    for i in range(num_blocks):
        up = i >= num_residual
        p, s = convert_resblock(sd, pf + f"decoder_blocks.{i}",
                                normalize=True, upsample=up,
                                downsample=False)
        params[f"block{i}"], spectral[f"block{i}"] = p, s

    # decoder_blocks: [8]=AdaIN (no params), [9]=ReLU, [10]=head conv
    p, s = sn_conv(sd, pf + f"decoder_blocks.{num_blocks + 2}")
    params["head_conv"], spectral["head_conv"] = p, s

    p, s = sn_dense(sd, pf + "affine_params_projector.0")
    params["projector_0"], spectral["projector_0"] = p, s
    p, s = sn_dense(sd, pf + "affine_params_projector.2")
    params["projector_1"], spectral["projector_1"] = p, s

    extra = {}
    if pf + "identity_embedding" in sd:  # fine-tuned checkpoint
        extra["finetune_embedding"] = sd[pf + "identity_embedding"]
    return params, spectral, extra


# --------------------------------------------------------------------------
# FSTH family (embedders/FSTH.py, embedders/no_pose_encoder.py,
# generators/FSTH.py, generators/FSTH_plus.py, discriminators/FSTH.py)
# --------------------------------------------------------------------------

def _convert_padded_stem(sd, prefix, params, spectral):
    """Stem with explicit pad placeholders: convs at down_block.1/.4,
    skip conv at skip.0 (FSTH embedder :38-49 / generator :50-65 /
    discriminator :52-67; unlike no_landmarks, whose pads are commented
    out so its convs sit at .0/.2)."""
    for ours, theirs in (("stem_conv0", "down_block.1"),
                         ("stem_conv1", "down_block.4"),
                         ("stem_skip", "skip.0")):
        p, s = sn_conv(sd, _j(prefix, theirs))
        params[ours], spectral[ours] = p, s


def convert_fsth_embedder(sd, prefix=""):
    """FSTH / no_pose encoder tower -> our SumPoolEncoder tree (module
    name 'encoder'; blocks named block1..block{n} to keep the reference's
    'stem counts as block 0' indexing)."""
    params, spectral = {}, {}
    _convert_padded_stem(sd, prefix, params, spectral)
    n = _infer_module_count(sd, prefix, "down_blocks.{}.")
    for i in range(n):
        p, s = convert_resblock(sd, _j(prefix, f"down_blocks.{i}"),
                                normalize=False, upsample=False,
                                downsample=True)
        params[f"block{i + 1}"], spectral[f"block{i + 1}"] = p, s
    return {"encoder": params}, {"encoder": spectral}


def convert_fsth_generator(sd, prefix=""):
    """generators/FSTH.py -> our models/generators/FSTH.Generator."""
    params, spectral = {}, {}
    _convert_padded_stem(sd, prefix, params, spectral)
    n_down = _infer_module_count(sd, prefix, "down_blocks.{}.")
    for i in range(n_down):
        p, s = convert_resblock(sd, _j(prefix, f"down_blocks.{i}"),
                                normalize=True, upsample=False,
                                downsample=True)
        params[f"down{i}"], spectral[f"down{i}"] = p, s

    # count only ResBlocks ("…{i}.block." keys): after fine-tuning the
    # trailing head AdaptiveNorm2d gains trainable weight/bias leaves that
    # would otherwise inflate the plain index scan
    n_dec = _infer_module_count(sd, prefix, "decoder_blocks.{}.block.")
    # up blocks are the trailing (n_down + 1) decoder entries (reference
    # :78-81 emits gen_num_downsample_blocks of them)
    n_up = n_down + 1
    for i in range(n_dec):
        p, s = convert_resblock(sd, _j(prefix, f"decoder_blocks.{i}"),
                                normalize=True, upsample=i >= n_dec - n_up,
                                downsample=False, capture_norms=False)
        params[f"dec{i}"], spectral[f"dec{i}"] = p, s
    # decoder tail: [AdaIN, ReLU, pad, head conv, Tanh] (reference :82-89)
    p, s = sn_conv(sd, _j(prefix, f"decoder_blocks.{n_dec + 3}"))
    params["head_conv"], spectral["head_conv"] = p, s
    p, s = sn_dense(sd, _j(prefix, "project"))
    params["project"], spectral["project"] = p, s
    return params, spectral


def convert_fsth_plus_generator(sd, prefix=""):
    """generators/FSTH_plus.py -> our FSTH_plus.Generator: flagship-style
    constant + AdaIN decoder, plain 3-layer MLP projector (reference
    :96-103), head conv directly after ReLU (no pad — :82-89)."""
    params, spectral = {}, {}
    params["constant"] = np.transpose(sd[_j(prefix, "constant.constant")],
                                      (0, 2, 3, 1))
    n_dec = _infer_module_count(sd, prefix, "decoder_blocks.{}.block.")
    num_up = sum(1 for k in sd
                 if k.startswith(_j(prefix, "decoder_blocks"))
                 and k.endswith(".skip.1.weight_orig"))
    for i in range(n_dec):
        p, s = convert_resblock(sd, _j(prefix, f"decoder_blocks.{i}"),
                                normalize=True, upsample=i >= n_dec - num_up,
                                downsample=False, capture_norms=False)
        params[f"block{i}"], spectral[f"block{i}"] = p, s
    p, s = sn_conv(sd, _j(prefix, f"decoder_blocks.{n_dec + 2}"))
    params["head_conv"], spectral["head_conv"] = p, s
    for ours, theirs in (("projector_0", "affine_params_projector.0"),
                         ("projector_1", "affine_params_projector.2"),
                         ("projector_2", "affine_params_projector.4")):
        params[ours] = {"kernel": dense_kernel(sd[_j(prefix,
                                                     theirs + ".weight")]),
                        "bias": sd[_j(prefix, theirs + ".bias")]}
    extra = {}
    if _j(prefix, "identity_embedding") in sd:
        extra["finetune_embedding"] = sd[_j(prefix, "identity_embedding")]
    return params, spectral, extra


def convert_fsth_discriminator(sd, prefix="", num_blocks=None):
    """discriminators/FSTH.py -> our FSTH Discriminator (same trunk as
    no_landmarks but a padded stem)."""
    params, spectral = {}, {}
    _convert_padded_stem(sd, prefix, params, spectral)
    if num_blocks is None:
        num_blocks = _infer_module_count(sd, prefix, "blocks.{}.")
    for i in range(num_blocks):
        p, s = convert_resblock(sd, _j(prefix, f"blocks.{i}"),
                                normalize=False, upsample=False,
                                downsample=False)
        params[f"block{i}"], spectral[f"block{i}"] = p, s
    p, s = sn_dense(sd, _j(prefix, "linear"))
    params["linear"], spectral["linear"] = p, s
    p, s = sn_embed(sd, _j(prefix, "embed"))
    params["embed"], spectral["embed"] = p, s
    return params, spectral


# --------------------------------------------------------------------------
# Flagship discriminator (no_landmarks)
# --------------------------------------------------------------------------

def convert_flagship_discriminator(sd, prefix="", num_blocks=None):
    params, spectral = {}, {}
    pf = prefix
    if num_blocks is None:
        num_blocks = _infer_module_count(sd, pf, "blocks.{}.")
    for ours, theirs in (("stem_conv0", "down_block.0"),
                         ("stem_conv1", "down_block.2"),
                         ("stem_skip", "skip.0")):
        p, s = sn_conv(sd, pf + theirs)
        params[ours], spectral[ours] = p, s
    for i in range(num_blocks):
        down = f"{pf}blocks.{i}.block.5.weight_orig" in sd  # downsample pool
        # norm='none': [ReLU, pad, conv0, ReLU, pad, conv1, (pool)]
        p, s = convert_resblock(sd, pf + f"blocks.{i}", normalize=False,
                                upsample=False, downsample=down)
        params[f"block{i}"], spectral[f"block{i}"] = p, s
    p, s = sn_dense(sd, pf + "linear")
    params["linear"], spectral["linear"] = p, s
    p, s = sn_embed(sd, pf + "embed")
    params["embed"], spectral["embed"] = p, s
    return params, spectral


# --------------------------------------------------------------------------
# torchvision ResNeXt-50 / MobileNetV2 (flagship embedder)
# --------------------------------------------------------------------------

def convert_resnext50(sd, prefix=""):
    params, stats = {}, {}

    def put_bn(ours, theirs):
        p, s = bn(sd, prefix + theirs)
        params[ours], stats[ours] = p, s

    params["conv1"] = {"kernel": conv_kernel(sd[prefix + "conv1.weight"])}
    put_bn("bn1", "bn1")
    layers = (3, 4, 6, 3)
    for stage, blocks in enumerate(layers, start=1):
        for i in range(blocks):
            t = f"layer{stage}.{i}."
            o = f"layer{stage}_{i}"
            block_p, block_s = {}, {}
            for c in ("conv1", "conv2", "conv3"):
                block_p[c] = {"kernel": conv_kernel(
                    sd[prefix + t + c + ".weight"])}
            for b in ("bn1", "bn2", "bn3"):
                p, s = bn(sd, prefix + t + b)
                block_p[b], block_s[b] = p, s
            if prefix + t + "downsample.0.weight" in sd:
                block_p["downsample_conv"] = {"kernel": conv_kernel(
                    sd[prefix + t + "downsample.0.weight"])}
                p, s = bn(sd, prefix + t + "downsample.1")
                block_p["downsample_bn"], block_s["downsample_bn"] = p, s
            params[o], stats[o] = block_p, block_s
    params["fc"] = {"kernel": dense_kernel(sd[prefix + "fc.weight"]),
                    "bias": sd[prefix + "fc.bias"]}
    return params, stats


def convert_mobilenet_v2(sd, prefix=""):
    params, stats = {}, {}

    def put(ours_conv, ours_bn, theirs_conv, theirs_bn, block_p, block_s):
        block_p[ours_conv] = {"kernel": conv_kernel(
            sd[prefix + theirs_conv + ".weight"])}
        p, s = bn(sd, prefix + theirs_bn)
        block_p[ours_bn], block_s[ours_bn] = p, s

    params["stem_conv"] = {"kernel": conv_kernel(
        sd[prefix + "features.0.0.weight"])}
    p, s = bn(sd, prefix + "features.0.1")
    params["stem_bn"], stats["stem_bn"] = p, s

    settings = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))
    feature_idx = 1
    block_idx = 0
    for t, c, n, s_ in settings:
        for _ in range(n):
            th = f"features.{feature_idx}.conv."
            block_p, block_s = {}, {}
            if t == 1:
                # [0]=dw ConvBNReLU, [1]=project conv, [2]=project bn
                put("conv0", "bn0", th + "0.0", th + "0.1", block_p, block_s)
                put("conv1", "bn1", th + "1", th + "2", block_p, block_s)
            else:
                put("conv0", "bn0", th + "0.0", th + "0.1", block_p, block_s)
                put("conv1", "bn1", th + "1.0", th + "1.1", block_p, block_s)
                put("conv2", "bn2", th + "2", th + "3", block_p, block_s)
            params[f"block{block_idx}"] = block_p
            stats[f"block{block_idx}"] = block_s
            feature_idx += 1
            block_idx += 1

    params["head_conv"] = {"kernel": conv_kernel(
        sd[prefix + "features.18.0.weight"])}
    p, s = bn(sd, prefix + "features.18.1")
    params["head_bn"], stats["head_bn"] = p, s
    params["classifier"] = {
        "kernel": dense_kernel(sd[prefix + "classifier.1.weight"]),
        "bias": sd[prefix + "classifier.1.bias"]}
    return params, stats


def convert_flagship_embedder(sd, prefix=""):
    idt_p, idt_s = convert_resnext50(sd, prefix + "identity_encoder.")
    pose_p, pose_s = convert_mobilenet_v2(sd, prefix + "pose_encoder.")
    params = {"identity_encoder": idt_p, "pose_encoder": pose_p}
    stats = {"identity_encoder": idt_s, "pose_encoder": pose_s}
    return params, stats


# --------------------------------------------------------------------------
# FAN / S3FD (face-alignment checkpoints)
# --------------------------------------------------------------------------

def convert_fan(sd):
    """face-alignment 2DFAN4 state dict -> our eval/fan.py tree."""
    flat = {}

    def put_conv(ours, theirs, bias=True):
        flat[f"{ours}/kernel"] = conv_kernel(sd[theirs + ".weight"])
        if bias and theirs + ".bias" in sd:
            flat[f"{ours}/bias"] = sd[theirs + ".bias"]

    def put_bn(ours, theirs):
        flat[f"{ours}/scale"] = sd[theirs + ".weight"]
        flat[f"{ours}/bias"] = sd[theirs + ".bias"]
        # batch_stats go in a separate tree for npz flatness
        flat[f"{ours}__mean"] = sd[theirs + ".running_mean"]
        flat[f"{ours}__var"] = sd[theirs + ".running_var"]

    def put_convblock(ours, theirs):
        put_bn(f"{ours}/bn1", f"{theirs}.bn1")
        put_conv(f"{ours}/conv1", f"{theirs}.conv1", bias=False)
        put_bn(f"{ours}/bn2", f"{theirs}.bn2")
        put_conv(f"{ours}/conv2", f"{theirs}.conv2", bias=False)
        put_bn(f"{ours}/bn3", f"{theirs}.bn3")
        put_conv(f"{ours}/conv3", f"{theirs}.conv3", bias=False)
        if f"{theirs}.downsample.2.weight" in sd:
            put_bn(f"{ours}/down_bn", f"{theirs}.downsample.0")
            put_conv(f"{ours}/down_conv", f"{theirs}.downsample.2",
                     bias=False)

    put_conv("conv1", "conv1")
    put_bn("bn1", "bn1")
    put_convblock("conv2", "conv2")
    put_convblock("conv3", "conv3")
    put_convblock("conv4", "conv4")
    num_modules = sum(1 for k in sd if k.startswith("l")
                      and k.endswith(".weight") and k[1:-7].isdigit())
    for m in range(num_modules):
        for level in range(4, 0, -1):
            put_convblock(f"m{m}/b1_{level}", f"m{m}.b1_{level}")
            put_convblock(f"m{m}/b2_{level}", f"m{m}.b2_{level}")
            put_convblock(f"m{m}/b3_{level}", f"m{m}.b3_{level}")
            if level == 1:
                put_convblock(f"m{m}/b2plus_{level}", f"m{m}.b2_plus_{level}")
        put_convblock(f"top_m_{m}", f"top_m_{m}")
        put_conv(f"conv_last{m}", f"conv_last{m}")
        put_bn(f"bn_end{m}", f"bn_end{m}")
        put_conv(f"l{m}", f"l{m}")
        if m < num_modules - 1:
            put_conv(f"bl{m}", f"bl{m}")
            put_conv(f"al{m}", f"al{m}")
    return flat


# --------------------------------------------------------------------------
# S3FD (face-alignment s3fd-619a316812.pth naming -> preprocess/s3fd.py)
# --------------------------------------------------------------------------

# (their mbox head prefix, our cls/reg index)
_S3FD_HEADS = (("conv3_3_norm", 0), ("conv4_3_norm", 1), ("conv5_3_norm", 2),
               ("fc7", 3), ("conv6_2", 4), ("conv7_2", 5))
_S3FD_L2NORMS = (("conv3_3_norm", "l2norm3"), ("conv4_3_norm", "l2norm4"),
                 ("conv5_3_norm", "l2norm5"))


def convert_s3fd(sd):
    """face-alignment S3FD state dict -> our preprocess/s3fd.py tree
    (reference consumes it via ``utils/crop_as_in_dataset.py:21-22``)."""
    flat = {}

    def put_conv(ours, theirs):
        flat[f"{ours}/kernel"] = conv_kernel(sd[theirs + ".weight"])
        flat[f"{ours}/bias"] = sd[theirs + ".bias"]

    for stage, reps in enumerate((2, 2, 3, 3, 3), start=1):
        for i in range(1, reps + 1):
            put_conv(f"conv{stage}_{i}", f"conv{stage}_{i}")
    for name in ("fc6", "fc7", "conv6_1", "conv6_2", "conv7_1", "conv7_2"):
        put_conv(name, name)
    for theirs, ours in _S3FD_L2NORMS:
        flat[f"{ours}/scale"] = sd[theirs + ".weight"]
    for prefix, idx in _S3FD_HEADS:
        put_conv(f"cls{idx}", f"{prefix}_mbox_conf")
        put_conv(f"reg{idx}", f"{prefix}_mbox_loc")
    return flat


# --------------------------------------------------------------------------
# Generic structural converter: torch modules whose dotted paths mirror the
# flax tree (used for Graphonomy / X2Face / FAbNet — external nets the
# reference consumes as frozen dependencies)
# --------------------------------------------------------------------------

def convert_generic(sd, rename=None):
    """torch state dict -> flat npz keys ('params/...', 'batch_stats/...').

    Assumes module paths mirror the flax tree (the torch twins in tests/ are
    built that way; real release files with different naming pass a
    ``rename`` callable first).  Rules:
    - ``*.weight`` 4D -> ``kernel`` OIHW->HWIO (covers depthwise: (C,1,k,k)
      -> (k,k,1,C), flax's feature_group_count layout);
    - ``*.weight`` 2D -> ``kernel`` transposed (torch Linear);
    - ``*.weight`` 1D with running stats sibling -> BatchNorm ``scale`` (+
      mean/var into batch_stats); without -> PReLU ``alpha``;
    - ``*.bias`` -> ``bias``; num_batches_tracked dropped;
    - parameters with any other leaf name pass through untouched (e.g. a
      learned ``adjacency`` matrix).
    """
    flat = {}
    for key, value in sd.items():
        if rename is not None:
            key = rename(key)
            if key is None:
                continue
        value = np.asarray(value)
        parts = key.split(".")
        prefix, leaf = ".".join(parts[:-1]), parts[-1]
        path = "/".join(parts[:-1])
        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            flat[f"batch_stats/{path}/mean"] = value
        elif leaf == "running_var":
            flat[f"batch_stats/{path}/var"] = value
        elif leaf == "weight":
            if value.ndim == 4:
                flat[f"params/{path}/kernel"] = conv_kernel(value)
            elif value.ndim == 2:
                flat[f"params/{path}/kernel"] = dense_kernel(value)
            elif prefix + ".running_mean" in sd:
                flat[f"params/{path}/scale"] = value
            else:
                flat[f"params/{path}/alpha"] = value
        elif leaf == "bias":
            flat[f"params/{path}/bias"] = value
        else:
            flat[f"params/{path}/{leaf}"] = value
    return flat


def convert_graphonomy(sd):
    """Graphonomy universal parser -> preprocess/graphonomy.py tree (see
    the torch twin in tests/test_graphonomy_golden_parity.py; release files
    need a rename pass documented in WEIGHTS.md)."""
    return convert_generic(sd)


def convert_x2face(sd):
    """X2Face release model -> models/generators/X2Face.py tree."""
    return convert_generic(sd)


def convert_fabnet(sd):
    """FAb-Net release encoder -> FAbNet_pretrained embedder pose net."""
    return convert_generic(sd)


# --------------------------------------------------------------------------
# LPIPS (PerceptualSimilarity v0.1, net='alex') — eval/lpips.py
# --------------------------------------------------------------------------

# torchvision alexnet.features conv module indices
ALEXNET_CONV_INDICES = (0, 3, 6, 8, 10)


def convert_lpips(alex_sd, lin_sd):
    """(torchvision alexnet state dict, LPIPS v0.1 alex.pth lin heads) ->
    eval/lpips.py flat npz: conv{i}/kernel|bias (HWIO) + lin{i}/weight
    (a (C,) vector from the (1, C, 1, 1) 1x1 conv)."""
    flat = {}
    for i, idx in enumerate(ALEXNET_CONV_INDICES):
        for pat in (f"features.{idx}.weight", f"{idx}.weight"):
            if pat in alex_sd:
                flat[f"conv{i}/kernel"] = conv_kernel(alex_sd[pat])
                flat[f"conv{i}/bias"] = alex_sd[
                    pat.replace("weight", "bias")]
                break
        else:
            raise KeyError(f"alexnet features[{idx}] missing")
    for i in range(len(ALEXNET_CONV_INDICES)):
        for pat in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if pat in lin_sd:
                flat[f"lin{i}/weight"] = np.asarray(
                    lin_sd[pat]).reshape(-1)
                break
        else:
            raise KeyError(f"LPIPS lin head {i} missing")
    return flat


# --------------------------------------------------------------------------
# Full reference checkpoint -> our .ckpt
# --------------------------------------------------------------------------

def convert_reference_checkpoint(in_path, out_dir):
    import torch
    ckpt = torch.load(in_path, map_location="cpu", weights_only=False)

    def sd_of(key):
        entry = ckpt.get(key)
        if entry is None:
            return None
        return {k: v.detach().numpy() for k, v in entry.items()}

    emb_sd = sd_of("embedder")
    gen_sd = sd_of("generator")
    dis_sd = sd_of("discriminator")
    ra = ckpt.get("running_averages", {})
    args = ckpt.get("args")
    args_dict = vars(args) if args is not None else {}

    emb_p, emb_stats = convert_flagship_embedder(emb_sd)
    gen_p, gen_spec, gen_extra = convert_flagship_generator(gen_sd)
    dis_p, dis_spec = convert_flagship_discriminator(dis_sd)

    params = {"embedder": emb_p, "generator": gen_p,
              "discriminator": dis_p}
    params.update(gen_extra)
    state_dict = {
        "step": np.int32(args_dict.get("iteration", 0)),
        "params": params,
        "batch_stats": {"embedder": emb_stats},
        "spectral": {"embedder": {}, "generator": gen_spec,
                     "discriminator": dis_spec},
        "ema_params": {},
    }
    if "embedder" in ra:
        ema_sd = {k: v.detach().numpy() for k, v in ra["embedder"].items()}
        state_dict["ema_params"]["embedder"] = \
            convert_flagship_embedder(ema_sd)[0]
    if "generator" in ra:
        ema_sd = {k: v.detach().numpy() for k, v in ra["generator"].items()}
        ema_p, _, ema_extra = convert_flagship_generator(ema_sd)
        state_dict["ema_params"]["generator"] = ema_p
        if "finetune_embedding" in ema_extra:
            state_dict["ema_params"]["finetune_embedding"] = \
                ema_extra["finetune_embedding"]

    from latentpose_tpu.checkpoint import _flatten
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(out_dir / "arrays.npz", **_flatten(state_dict))
    meta = {"format_version": 1,
            "iteration": int(args_dict.get("iteration", 0)),
            "finetune": "finetune_embedding" in params,
            "args": {k: (str(v) if not isinstance(
                v, (int, float, str, bool, list, type(None))) else v)
                for k, v in args_dict.items()},
            "converted_from": str(in_path)}
    with open(out_dir / "meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {out_dir}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("kind", choices=["vgg19", "vggface", "fan", "s3fd",
                                         "graphonomy", "x2face", "fabnet",
                                         "lpips", "checkpoint"])
    parser.add_argument("input",
                        help="state-dict path; for `lpips`: "
                             "ALEXNET_PTH:LIN_PTH (torchvision alexnet + "
                             "PerceptualSimilarity v0.1 alex.pth)")
    parser.add_argument("output_dir")
    args = parser.parse_args(argv)

    out = Path(args.output_dir)
    if args.kind == "checkpoint":
        convert_reference_checkpoint(args.input, out)
        return
    if args.kind == "lpips":
        alex_path, _, lin_path = args.input.partition(":")
        if not lin_path:
            raise SystemExit("lpips needs `ALEXNET_PTH:LIN_PTH` as input")
        save_flat_npz(
            convert_lpips(load_torch_state_dict(alex_path),
                          load_torch_state_dict(lin_path)),
            out / "lpips_alex.npz")
        return
    sd = load_torch_state_dict(args.input)
    if args.kind == "vgg19":
        save_flat_npz(convert_vgg(sd, VGG19_CONV_INDICES),
                      out / "vgg19_caffe.npz")
    elif args.kind == "vggface":
        save_flat_npz(convert_vgg(sd, VGG16_CONV_INDICES),
                      out / "vgg_face.npz")
    elif args.kind == "fan":
        save_flat_npz(convert_fan(sd), out / "fan_2d.npz")
    elif args.kind == "s3fd":
        save_flat_npz(convert_s3fd(sd), out / "s3fd.npz")
    elif args.kind == "graphonomy":
        save_flat_npz(convert_graphonomy(sd), out / "graphonomy.npz")
    elif args.kind == "x2face":
        save_flat_npz(convert_x2face(sd), out / "x2face.npz")
    elif args.kind == "fabnet":
        save_flat_npz(convert_fabnet(sd), out / "fabnet.npz")


if __name__ == "__main__":
    main()
