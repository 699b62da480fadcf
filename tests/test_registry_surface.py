"""Registry surface: every plugin registers args and constructs via its
Wrapper — catches constructor drift across the whole plugin inventory."""

import types

import pytest

from latentpose_tpu import registry
from latentpose_tpu.config import MyArgumentParser

EMBEDDERS = ["unsupervised_pose_separate_embResNeXt_segmentation", "FSTH",
             "no_pose_encoder", "X2Face", "X2Face_pretrained_embResNeXt",
             "FAbNet_pretrained_embResNeXt", "simple_conv"]
GENERATORS = ["vector_pose_unsupervised_segmentation_noBottleneck", "FSTH",
              "FSTH_plus", "X2Face"]
DISCRIMINATORS = ["no_landmarks", "FSTH", "none"]
CRITERIONS = ["adversarial", "perceptual", "idt_embed", "featmat", "dice",
              "dis_embed", "l1_rgb"]
METRICS = ["psnr", "segmentation_iou"]
DATALOADERS = ["synthetic", "voxceleb2", "voxceleb2_segm",
               "voxceleb2_FSTH_crop", "voxceleb2_X2Face",
               "voxceleb2_segmentation_nolandmarks",
               "voxceleb2_segmentation_nolandmarks_X2Face_FAbNet_crops"]


def flagship_args():
    return types.SimpleNamespace(
        image_size=32, in_channels=3, out_channels=3, num_channels=8,
        max_num_channels=32, embed_channels=32, pose_embedding_size=16,
        gen_padding="zero", gen_constant_input_size=4,
        gen_num_residual_blocks=1, norm_layer="in", dis_padding="zero",
        dis_num_blocks=3, num_labels=4, optimizer="Adam", lr_gen=1e-3,
        lr_dis=1e-3, beta1=0.0, average_function="sum", finetune=False,
        gan_type="gan", fm_weight=10.0, dice_weight=1.0,
        idt_embed_weight=2e-3, perc_weight=1e-2, dis_embed_weight=1e-2,
        l1_weight=30.0, vgg_weights_dir="", allow_random_vgg=True,
        compute_dtype="float32",
        embed_padding="zero", embed_num_blocks=3,
        gen_num_downsample_blocks=2, simple_embedder_width=8,
        X2Face_num_identity_images=1)


@pytest.mark.parametrize("kind,names", [
    ("embedders", EMBEDDERS), ("generators", GENERATORS),
    ("discriminators", DISCRIMINATORS), ("criterions", CRITERIONS),
    ("metrics", METRICS),
])
def test_every_plugin_constructs(kind, names):
    args = flagship_args()
    for name in names:
        wrapper = registry.load_wrapper(kind, name)
        parser = MyArgumentParser(conflict_handler="resolve")
        parser.add = parser.add_argument
        wrapper.get_args(parser)
        net = wrapper.get_net(args)
        assert net is not None, f"{kind}/{name}"


@pytest.mark.parametrize("name", DATALOADERS)
def test_every_dataloader_registers_args(name):
    module = registry.load_module("dataloaders", name)
    parser = MyArgumentParser(conflict_handler="resolve")
    parser.add = parser.add_argument
    module.Wrapper.get_args(parser)
    assert hasattr(module.Wrapper, "get_dataloader")


def test_runner_plugin_loads():
    module = registry.load_module("runners", "holycow")
    assert hasattr(module, "make_train_step")
