"""latentpose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for few-shot
neural head reenactment with latent pose descriptors.

Re-designed from scratch for TPU with the same capabilities as the reference
PyTorch implementation of "Neural Head Reenactment with Latent Pose
Descriptors" (CVPR 2020).  The compute path is pure-functional JAX compiled by
XLA onto the MXU; scaling is SPMD over a `jax.sharding.Mesh`; hot elementwise
paths use Pallas kernels.

Top-level layout (mirrors SURVEY.md §2's component inventory):

- ``config``     : 5-level argument resolution + plugin arg registration
                   (reference: utils/utils.py:42-174, utils/argparse_utils.py)
- ``registry``   : named-module registry (reference: utils/utils.py:177-193)
- ``ops``        : TPU kernels — fused AdaIN/instance-norm, spectral-norm
                   power iteration, image resize/crop
- ``nn``         : block library (ResBlock, backbones: ResNeXt-50, MobileNetV2,
                   VGG16/19) (reference: generators/common/blocks.py)
- ``models``     : embedders / generators / discriminators plugin families
- ``losses``     : criterion plugins (adversarial, perceptual, idt_embed,
                   featmat, dice, dis_embed, l1_rgb)
- ``data``       : synthetic fixture + VoxCeleb2 pipelines, augmentation
- ``parallel``   : mesh construction + sharding rules (DP over ICI)
- ``runners``    : TrainState + the single jitted GAN train step + epoch loop
- ``utils``      : meters, visualization, logging
- ``cli``        : train / drive / batched_finetune / batched_drive / eval
"""

__version__ = "0.1.0"
