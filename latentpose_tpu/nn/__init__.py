from latentpose_tpu.nn.blocks import (InstanceNormAffine, ResBlock,
                                      SelfAttention)
from latentpose_tpu.nn.backbones import MobileNetV2, ResNeXt50
from latentpose_tpu.nn.vgg import VGG16_CFG, VGG19_CFG, VGGFeatures

__all__ = ["InstanceNormAffine", "ResBlock", "SelfAttention", "MobileNetV2",
           "ResNeXt50", "VGGFeatures", "VGG16_CFG", "VGG19_CFG"]
