"""The `facebook` (swsl-shaped) VOSNet variant: torchvision-shaped ResNet-50
with layer3/4 strides patched to 1 and a 2048→1024→256 head
(reference ``vos_net.py:29-38``). The torch.hub download is replaced by
offline conversion; this pins the architecture and converter key mapping."""

import jax
import numpy as np
import torch

from semi_supervised_vos_tpu.models.convert import convert_vosnet_state_dict
from semi_supervised_vos_tpu.models.vos_net import VOSNet


def build_torch_facebook():
    """Torch twin of the facebook variant without the hub download:
    torchvision-widths ResNet-50 body, strides patched, two-conv head."""
    import sys

    sys.path.insert(0, "/root/reference")
    from src.model.backbone.resnet import Bottleneck, ResNet

    torch.manual_seed(0)
    resnet = ResNet(Bottleneck, [3, 4, 6, 3], BatchNorm=torch.nn.BatchNorm2d)
    # torchvision widths: rebuild layer3/4 at standard widths & stride-1 —
    # the reference patches strides on the hub model (vos_net.py:32-35);
    # our reference-twin just builds them stride-1 directly
    resnet.inplanes = 512
    resnet.layer3 = resnet._make_layer(Bottleneck, 256, 6, torch.nn.BatchNorm2d, stride=2)
    resnet.inplanes = 1024
    resnet.layer4 = resnet._make_layer(Bottleneck, 512, 3, torch.nn.BatchNorm2d, stride=2)
    resnet.layer3[0].conv2.stride = (1, 1)
    resnet.layer3[0].downsample[0].stride = (1, 1)
    resnet.layer4[0].conv2.stride = (1, 1)
    resnet.layer4[0].downsample[0].stride = (1, 1)

    class RefFacebook(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = torch.nn.Sequential(*list(resnet.children())[0:8])
            self.adjust_dim = torch.nn.Sequential(
                torch.nn.Conv2d(2048, 1024, 1, 1, 0, bias=False),
                torch.nn.Conv2d(1024, 256, 1, 1, 0, bias=False),
            )
            self.bn256 = torch.nn.BatchNorm2d(256)

        def forward(self, x):
            return self.bn256(self.adjust_dim(self.backbone(x)))

    net = RefFacebook()
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    return net.eval()


def test_facebook_conversion_and_parity(rng):
    tnet = build_torch_facebook()
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = convert_vosnet_state_dict(sd, "facebook")

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = VOSNet(model="facebook").apply(variables, x, train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape  # (1, 256, 8, 8): stride 8, 256-d
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)
