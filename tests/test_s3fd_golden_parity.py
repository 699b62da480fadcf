"""S3FD converter + forward numeric validation: a torch twin with the REAL
face-alignment ``s3fd-619a316812.pth`` state-dict naming (conv1_1...,
conv3_3_norm, *_mbox_conf/_mbox_loc — the file the reference's cropper
downloads, ``utils/crop_as_in_dataset.py:21-22``) is exported through
``convert_torch_weights.convert_s3fd`` and must reproduce our
preprocess/s3fd.py head outputs numerically."""

import os
import sys

import numpy as np
import pytest

import torch
import torch.nn as tnn
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


class TorchL2Norm(tnn.Module):
    def __init__(self, channels, scale):
        super().__init__()
        self.weight = tnn.Parameter(torch.full((channels,), float(scale)))

    def forward(self, x):
        norm = torch.sqrt((x * x).sum(dim=1, keepdim=True) + 1e-10)
        return x / norm * self.weight.view(1, -1, 1, 1)


class TorchS3FD(tnn.Module):
    """face-alignment net_s3fd graph with its exact parameter names."""

    def __init__(self):
        super().__init__()
        cfg = ((3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3),
               (512, 512, 3))
        for stage, (c_in, c_out, reps) in enumerate(cfg, start=1):
            c = c_in
            for i in range(1, reps + 1):
                setattr(self, f"conv{stage}_{i}",
                        tnn.Conv2d(c, c_out, 3, padding=1))
                c = c_out
        self.fc6 = tnn.Conv2d(512, 1024, 3, padding=3, dilation=3)
        self.fc7 = tnn.Conv2d(1024, 1024, 1)
        self.conv6_1 = tnn.Conv2d(1024, 256, 1)
        self.conv6_2 = tnn.Conv2d(256, 512, 3, stride=2, padding=1)
        self.conv7_1 = tnn.Conv2d(512, 128, 1)
        self.conv7_2 = tnn.Conv2d(128, 256, 3, stride=2, padding=1)

        self.conv3_3_norm = TorchL2Norm(256, 10)
        self.conv4_3_norm = TorchL2Norm(512, 8)
        self.conv5_3_norm = TorchL2Norm(512, 5)

        self.conv3_3_norm_mbox_conf = tnn.Conv2d(256, 4, 3, padding=1)
        self.conv3_3_norm_mbox_loc = tnn.Conv2d(256, 4, 3, padding=1)
        self.conv4_3_norm_mbox_conf = tnn.Conv2d(512, 2, 3, padding=1)
        self.conv4_3_norm_mbox_loc = tnn.Conv2d(512, 4, 3, padding=1)
        self.conv5_3_norm_mbox_conf = tnn.Conv2d(512, 2, 3, padding=1)
        self.conv5_3_norm_mbox_loc = tnn.Conv2d(512, 4, 3, padding=1)
        self.fc7_mbox_conf = tnn.Conv2d(1024, 2, 3, padding=1)
        self.fc7_mbox_loc = tnn.Conv2d(1024, 4, 3, padding=1)
        self.conv6_2_mbox_conf = tnn.Conv2d(512, 2, 3, padding=1)
        self.conv6_2_mbox_loc = tnn.Conv2d(512, 4, 3, padding=1)
        self.conv7_2_mbox_conf = tnn.Conv2d(256, 2, 3, padding=1)
        self.conv7_2_mbox_loc = tnn.Conv2d(256, 4, 3, padding=1)

    def forward(self, x):
        h = x
        for stage, reps in ((1, 2), (2, 2), (3, 3), (4, 3), (5, 3)):
            for i in range(1, reps + 1):
                h = F.relu(getattr(self, f"conv{stage}_{i}")(h))
            if stage == 3:
                f3_3 = h
            if stage == 4:
                f4_3 = h
            if stage == 5:
                f5_3 = h
            h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.fc6(h))
        ffc7 = F.relu(self.fc7(h))
        h = F.relu(self.conv6_1(ffc7))
        f6_2 = F.relu(self.conv6_2(h))
        h = F.relu(self.conv7_1(f6_2))
        f7_2 = F.relu(self.conv7_2(h))

        f3_3 = self.conv3_3_norm(f3_3)
        f4_3 = self.conv4_3_norm(f4_3)
        f5_3 = self.conv5_3_norm(f5_3)

        outputs = []
        for i, (src, prefix) in enumerate((
                (f3_3, "conv3_3_norm"), (f4_3, "conv4_3_norm"),
                (f5_3, "conv5_3_norm"), (ffc7, "fc7"),
                (f6_2, "conv6_2"), (f7_2, "conv7_2"))):
            cls = getattr(self, prefix + "_mbox_conf")(src)
            reg = getattr(self, prefix + "_mbox_loc")(src)
            if i == 0:  # max-out background label
                bg = torch.max(cls[:, :3], dim=1, keepdim=True)[0]
                cls = torch.cat([bg, cls[:, 3:]], dim=1)
            outputs.append((torch.softmax(cls, dim=1), reg))
        return outputs


@pytest.mark.slow
def test_s3fd_conversion_numeric_parity():
    import jax.numpy as jnp

    from convert_torch_weights import convert_s3fd
    from latentpose_tpu.preprocess.s3fd import S3FD
    from latentpose_tpu.utils.weights import load_flat_npz_variables

    torch.manual_seed(3)
    twin = TorchS3FD().eval()
    # keep activations sane through the deep VGG trunk
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight *= 0.2
        x = torch.rand(1, 3, 128, 128) * 255.0 \
            - torch.tensor([123.0, 117.0, 104.0]).view(1, 3, 1, 1)
        expected = twin(x)

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = load_flat_npz_variables(convert_s3fd(sd))

    outputs = S3FD().apply(
        variables, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))))
    assert len(outputs) == len(expected) == 6
    for i, ((cls, reg), (tcls, treg)) in enumerate(zip(outputs, expected)):
        np.testing.assert_allclose(
            np.asarray(cls), np.transpose(tcls.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-4, err_msg=f"cls head {i}")
        np.testing.assert_allclose(
            np.asarray(reg), np.transpose(treg.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-3, err_msg=f"reg head {i}")
