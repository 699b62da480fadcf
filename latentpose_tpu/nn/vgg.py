"""VGG16/19 feature towers for the perceptual losses.

Parity with the reference's PerceptualLoss backbone construction
(``criterions/common/perceptual_loss.py:32-88``):
- caffe-VGG19 (perceptual) / caffe-VGGFace-VGG16 (identity) feature stacks,
- every MaxPool2d swapped for AvgPool2d(2),
- truncated to the first 30 layers (conv/relu/pool each count as one layer,
  i.e. through relu5_1 for VGG19 / relu5_3 for VGG16),
- features collected at every ReLU output (13 maps for either net).

Pretrained weights are converted offline from the reference's two ``.pth``
files with ``tools/convert_torch_weights.py`` into ``.npz``; without them the
tower runs with random weights (hermetic tests only — a loud warning is
emitted by the criterion wrapper).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Union

import jax.numpy as jnp
import flax.linen as nn

from latentpose_tpu.ops import initializers as tinit
from latentpose_tpu.ops.image import avg_pool_2x

VGG19_CFG: Sequence[Union[int, str]] = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
    512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
VGG16_CFG: Sequence[Union[int, str]] = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
    512, 512, 512, "M", 512, 512, 512, "M")


class VGGFeatures(nn.Module):
    """Truncated VGG feature tower returning all ReLU activations.

    ``dtype``: compute dtype for the convs (bf16 mixed-precision path) —
    without it flax's type promotion silently upcasts to the f32 params.
    """

    cfg: Sequence[Union[int, str]] = VGG19_CFG
    num_layers: int = 30  # conv/relu/pool each count as one torch layer
    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        layer_idx = 0
        conv_idx = 0
        h = x
        for item in self.cfg:
            if layer_idx >= self.num_layers:
                break
            if item == "M":
                h = avg_pool_2x(h)  # maxpool -> avgpool swap
                layer_idx += 1
            else:
                h = nn.Conv(int(item), (3, 3), padding=1,
                            kernel_init=tinit.torch_conv_kernel_init,
                            dtype=self.dtype,
                            name=f"conv{conv_idx}")(h)
                conv_idx += 1
                layer_idx += 1
                if layer_idx >= self.num_layers:
                    break
                h = nn.relu(h)
                layer_idx += 1
                feats.append(h)
        return feats
