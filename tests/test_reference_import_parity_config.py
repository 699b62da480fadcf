"""Config-resolution parity against the ACTUAL reference implementation.

Drives the reference's real ``utils.utils.get_args_and_modules``
(``/root/reference/utils/utils.py:41-175``) — with the REAL base parser
exec'd out of ``/root/reference/train.py`` (everything up to the
``get_args_and_modules`` call) and the REAL ``configs/default.yaml`` — and
asserts our ``latentpose_tpu.config.get_args_and_modules`` resolves every
shared argument to the same value for the same inputs:

    CLI  >  custom_args  >  configs/default.yaml  >  checkpoint args  >
    argparse/plugin defaults

including the two-phase plugin registration (runner/dataloader/criterion
flags resolved against yaml values) and the dynamic
``experiment_name = config_name`` default (utils.py:160-163).

The reference side imports its own module plugins for their get_args
(embedder/dataloader import torchvision/imgaug at module scope —
satisfied by tools/torchvision_shim.py's import-time stubs).
"""

import sys
from argparse import Namespace
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference")
if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)
if str(REFERENCE) not in sys.path:
    sys.path.append(str(REFERENCE))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import torchvision_shim  # noqa: E402

torchvision_shim.install_reference_import_stubs()

import utils.utils as ref_utils  # noqa: E402  (the reference's)

from latentpose_tpu.config import (build_core_parser,  # noqa: E402
                                   get_args_and_modules)


def build_reference_parser():
    """The real base parser: exec train.py's prefix (imports + every
    parser.add) up to — excluding — its get_args_and_modules call."""
    src = (REFERENCE / "train.py").read_text()
    cut = src.index("args, default_args, m, checkpoint_object")
    prefix = src[:cut]
    ns = {"__name__": "ref_train_prefix",
          "__file__": str(REFERENCE / "train.py")}
    exec(compile(prefix, str(REFERENCE / "train.py"), "exec"), ns)
    return ns["parser"]


# args saved inside the fabricated checkpoint: one core arg that nothing
# else sets (num_channels -> must win over the argparse default), one that
# the yaml also sets (batch_size -> yaml must win), one the CLI also sets
# (image_size -> CLI must win), and the resume iteration counter.
CKPT_ARGS = {"num_channels": 32, "batch_size": 5, "image_size": 200,
             "embed_channels": 256, "iteration": 7}

CLI = ["--config_name", "default", "--batch_size", "3",
       "--image_size", "128"]
CUSTOM = {"lr_gen": 1e-4, "beta1": 0.5}

# (key, expected) — expected values double-check the resolution order;
# parity additionally requires ref == ours on every one of them.
EXPECTED = [
    # module selection from the reference yaml
    ("generator", "vector_pose_unsupervised_segmentation_noBottleneck"),
    ("embedder", "unsupervised_pose_separate_embResNeXt_segmentation"),
    ("discriminator", "no_landmarks"),
    ("criterions", "idt_embed, perceptual, adversarial, featmat, "
                   "dis_embed, dice"),
    ("dataloader", "voxceleb2_segmentation_nolandmarks"),
    ("runner", "holycow"),
    # CLI > yaml > ckpt
    ("batch_size", 3),
    ("image_size", 128),
    # custom_args > defaults
    ("lr_gen", 1e-4),
    ("beta1", 0.5),
    # yaml > plugin defaults (two-phase registration)
    ("perc_weight", 3e-2),
    ("idt_embed_weight", 0.6e-2),
    ("pose_embedding_size", 256),
    ("log_frequency_images", 500),
    ("log_frequency_fixed_images", 2500),
    ("use_pixelwise_augs", True),
    ("use_affine_scale", True),
    ("use_affine_shift", True),
    ("data_root", "/datasets/VoxCeleb2"),
    ("img_dir", "cropped_fix"),
    ("kp_dir", "cropped_landmarks_fix"),
    ("segm_dir", "segmentation_Graphonomy"),
    # checkpoint args > defaults
    ("num_channels", 32),
    ("embed_channels", 256),
    ("iteration", 7),
    # untouched argparse defaults
    ("max_num_channels", 512),
    ("optimizer", "Adam"),
    # dynamic default (utils.py:160-163)
    ("experiment_name", "default"),
]


def norm(v):
    return str(v) if isinstance(v, Path) else v


@pytest.fixture(scope="module")
def resolved(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg_parity")

    # reference-format checkpoint (torch file with an args Namespace).
    # torch>=2.6 defaults torch.load to weights_only=True, which rejects
    # pickled Namespaces — allowlist it so the reference's unmodified
    # torch.load call (utils.py:108) can read its own format.
    torch.serialization.add_safe_globals([Namespace])
    ref_ckpt = d / "ref.pth"
    torch.save({"args": Namespace(**CKPT_ARGS)}, ref_ckpt)
    # our-format checkpoint (directory with meta.json)
    our_ckpt = d / "our_ckpt"
    our_ckpt.mkdir()
    import json
    (our_ckpt / "meta.json").write_text(json.dumps(
        {"args": CKPT_ARGS, "iteration": CKPT_ARGS["iteration"]}))

    # --- reference side (cwd must be the reference root: its
    # load_config_file reads the relative 'configs/<name>.yaml') ---------
    ref_parser = build_reference_parser()
    old_cwd, old_argv = Path.cwd(), sys.argv
    try:
        import os
        os.chdir(REFERENCE)
        sys.argv = ["train.py", *CLI, "--checkpoint_path", str(ref_ckpt)]
        ref_args, ref_defaults, _, _ = ref_utils.get_args_and_modules(
            ref_parser, use_checkpoint_args=True, custom_args=dict(CUSTOM))
    finally:
        os.chdir(old_cwd)
        sys.argv = old_argv

    # --- our side --------------------------------------------------------
    our_args, our_defaults, _, _ = get_args_and_modules(
        build_core_parser(), use_checkpoint_args=True,
        custom_args=dict(CUSTOM), configs_dir=str(REFERENCE / "configs"),
        argv=[*CLI, "--checkpoint_path", str(our_ckpt)])
    return ref_args, our_args


@pytest.mark.parametrize("key, expected", EXPECTED,
                         ids=[k for k, _ in EXPECTED])
def test_reference_config_resolution_parity(resolved, key, expected):
    ref_args, our_args = resolved
    ref_val, our_val = norm(getattr(ref_args, key)), \
        norm(getattr(our_args, key))
    assert ref_val == expected, f"reference resolved {key}={ref_val!r}"
    assert our_val == ref_val, (
        f"{key}: ours={our_val!r} vs reference={ref_val!r}")


def test_reference_experiment_postfix_parity():
    """Experiment auto-naming: our get_postfix must spell directory names
    exactly like the reference's (tensorboard_logging.py:47-54), so a
    user's downstream tooling (batched_finetune sweeps, log parsing)
    keeps working."""
    ref_tb = __import__("utils.tensorboard_logging",
                        fromlist=["get_postfix"])
    from latentpose_tpu.utils.logging_writer import get_postfix

    args = {"batch_size": 16, "lr_gen": 5e-5, "rank": 3,
            "data_root": "/datasets/VoxCeleb2", "finetune": True,
            "experiment_name": ""}
    defaults = {"batch_size": 8, "lr_gen": 5e-5, "rank": 0,
                "data_root": "", "finetune": False,
                "experiment_name": ""}
    ignore = ["rank", "experiment_name"]
    ours = get_postfix(args, defaults, ignore)
    theirs = ref_tb.get_postfix(args, defaults, ignore)
    assert ours == theirs
    assert ours == "batch_size^16__data_root^+datasets+VoxCeleb2__" \
                   "finetune^True"
