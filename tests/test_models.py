"""Backbone/VOSNet parity vs the reference torch implementation.

The reference package is importable (torch-only deps) from its read-only
mount; we build its ResNet classes directly (pretrained=False — no network),
assemble the same truncated VOSNet, convert the torch weights with
``models.convert`` and compare activations layer-for-layer.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from semi_supervised_vos_tpu.models.convert import convert_vosnet_state_dict
from semi_supervised_vos_tpu.models.resnet import out_spatial
from semi_supervised_vos_tpu.models.vos_net import VOSNet

ref_resnet = pytest.importorskip(
    "src.model.backbone.resnet", reason="reference repo not mounted"
)


def build_reference_vosnet(model: str) -> torch.nn.Module:
    """Assemble the reference VOSNet without the pretrained download
    (same structure as /root/reference/src/model/vos_net.py:16-28)."""
    torch.manual_seed(0)
    if model == "resnet18":
        resnet = ref_resnet.resnet18(pretrained=False)
    elif model == "resnet50":
        resnet = ref_resnet.resnet50(pretrained=False)
    elif model == "resnet101":
        resnet = ref_resnet.resnet101(pretrained=False)
    else:
        raise ValueError(model)

    class RefVOSNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = torch.nn.Sequential(*list(resnet.children())[0:8])
            if model != "resnet18":
                self.adjust_dim = torch.nn.Conv2d(1024, 256, 1, 1, 0, bias=False)
                self.bn256 = torch.nn.BatchNorm2d(256)

        def forward(self, x):
            x = self.backbone(x)
            if model != "resnet18":
                x = self.adjust_dim(x)
                x = self.bn256(x)
            return x

    net = RefVOSNet()
    # randomise BN stats so eval mode is a real test, not identity stats
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    return net.eval()


@pytest.mark.parametrize("model", ["resnet18", "resnet50"])
def test_vosnet_activation_parity(model, rng):
    tnet = build_reference_vosnet(model)
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = convert_vosnet_state_dict(sd, model)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    net = VOSNet(model=model)
    out = net.apply(variables, x, train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)

    assert out.shape == ref_out.shape
    # tolerance covers f32 accumulation-order noise through ~50 conv layers
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-3)


def test_vosnet_stride8_output_shapes(rng):
    net = VOSNet(model="resnet18")
    import jax

    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    for h, w in [(64, 64), (480, 854)]:
        hd, wd = out_spatial(h, w)
        assert (hd, wd) == (int(np.ceil(h / 8)), int(np.ceil(w / 8)))
    out = net.apply(variables, np.zeros((1, 64, 96, 3), np.float32))
    assert out.shape == (1, 8, 12, 256)


def test_dataparallel_prefix_and_dict_checkpoint(tmp_path, rng):
    tnet = build_reference_vosnet("resnet18")
    sd = {"module." + k: v for k, v in tnet.state_dict().items()}
    ckpt = {"epoch": 3, "state_dict": sd}
    path = tmp_path / "ckpt.pth.tar"
    torch.save(ckpt, path)

    from semi_supervised_vos_tpu.models.convert import load_torch_checkpoint

    variables = load_torch_checkpoint(str(path), "resnet18")
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = VOSNet(model="resnet18").apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out, rtol=1e-3, atol=1e-4
    )


def test_torchvision_pretrained_drops_layer4(rng):
    """Pretrained merge keeps layer1-3 weights, leaves layer4 fresh
    (reference resnet.py:194-199)."""
    import jax

    from semi_supervised_vos_tpu.models.convert import convert_torchvision_backbone

    net = VOSNet(model="resnet18")
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))

    # fake torchvision checkpoint: correct shapes for a standard resnet18
    tv = {}
    torch.manual_seed(1)

    def conv(key, o, i, k):
        tv[key] = torch.randn(o, i, k, k)

    def bn(prefix, c):
        tv[prefix + ".weight"] = torch.randn(c)
        tv[prefix + ".bias"] = torch.randn(c)
        tv[prefix + ".running_mean"] = torch.randn(c)
        tv[prefix + ".running_var"] = torch.rand(c) + 0.5

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    widths = {1: 64, 2: 128, 3: 256, 4: 512}
    for stage in (1, 2, 3, 4):
        w = widths[stage]
        for b in (0, 1):
            p = f"layer{stage}.{b}"
            in_w = widths[stage - 1] if stage > 1 and b == 0 else w
            conv(f"{p}.conv1.weight", w, in_w, 3)
            bn(f"{p}.bn1", w)
            conv(f"{p}.conv2.weight", w, w, 3)
            bn(f"{p}.bn2", w)
            if b == 0 and stage > 1:
                conv(f"{p}.downsample.0.weight", w, in_w, 1)
                bn(f"{p}.downsample.1", w)
    tv["fc.weight"] = torch.randn(1000, 512)
    tv["fc.bias"] = torch.randn(1000)

    merged = convert_torchvision_backbone(
        {k: v.numpy() for k, v in tv.items()}, variables, "resnet18"
    )
    got = merged["params"]["backbone"]["layer1_0"]["conv1"]["conv"]["kernel"]
    np.testing.assert_allclose(
        got, tv["layer1.0.conv1.weight"].numpy().transpose(2, 3, 1, 0)
    )
    # layer4 untouched (fresh init)
    np.testing.assert_array_equal(
        merged["params"]["backbone"]["layer4_0"]["conv1"]["conv"]["kernel"],
        variables["params"]["backbone"]["layer4_0"]["conv1"]["conv"]["kernel"],
    )
