"""Model-zoo bootstrap: fetch (file:// URL), cache reuse, offline fallback,
and layer4/fc-drop conversion semantics (reference ``resnet.py:159-171``)."""

import sys

import numpy as np
import pytest

from semi_supervised_vos_tpu.models.zoo import (
    MODEL_ZOO_URLS,
    auto_pretrained_path,
    fetch_pretrained,
)


@pytest.fixture(scope="module")
def torchvision_style_ckpt(tmp_path_factory):
    """A torchvision-key-format resnet18 checkpoint (conv1/bn1/layerX.Y...)
    built from the reference's ResNet class — layer4/fc present so the
    drop semantics are exercised."""
    sys.path.insert(0, "/root/reference")
    import torch

    from src.model.backbone.resnet import resnet18

    torch.manual_seed(7)
    net = resnet18(pretrained=False)
    path = tmp_path_factory.mktemp("zoo_src") / "resnet18-test.pth"
    torch.save(net.state_dict(), path)
    return path


def test_urls_match_reference_table():
    """The zoo URL table is the reference's model_zoo table for the archs
    the CLI exposes (``reference/src/model/backbone/resnet.py:13-19``), plus
    the swsl hub checkpoint the ``facebook`` variant bootstraps from
    (``vos_net.py:29-38`` — torch.hub resolves to fbaipublicfiles)."""
    assert set(MODEL_ZOO_URLS) == {"resnet18", "resnet50", "resnet101", "facebook"}
    for name, url in MODEL_ZOO_URLS.items():
        if name == "facebook":
            assert url.startswith("https://dl.fbaipublicfiles.com/")
        else:
            assert url.startswith("https://download.pytorch.org/models/")


def test_fetch_file_url_and_cache(torchvision_style_ckpt, tmp_path):
    cache = tmp_path / "cache"
    url = torchvision_style_ckpt.as_uri()
    got = fetch_pretrained("resnet18", url=url, cache_dir=cache)
    # mirror (non-table) URLs are cached keyed BY MODEL so a single-model
    # mirror can never be served for a different architecture
    assert got is not None
    assert (cache / f"resnet18-{torchvision_style_ckpt.name}").exists()
    assert fetch_pretrained("resnet50", url=url, cache_dir=cache) != got

    # cache hit: the source may vanish, the cached copy is served
    import torch

    sd = torch.load(got, map_location="cpu", weights_only=True)
    assert "conv1.weight" in sd and "layer4.0.conv1.weight" in sd
    got2 = fetch_pretrained(
        "resnet18", url="file:///nonexistent/" + torchvision_style_ckpt.name,
        cache_dir=cache,
    )
    assert got2 == got  # same cached file, no fetch attempted


def test_corrupt_hashed_download_rejected(tmp_path):
    """A file whose torchvision-style name embeds a sha256 prefix is
    verified: a corrupt payload is neither published to the cache nor
    served from it (the reference's model_zoo.load_url check_hash
    semantics, ``resnet.py:13-19``)."""
    src = tmp_path / "resnet18-5c106cde.pth"  # real zoo prefix, wrong bytes
    src.write_bytes(b"corrupt payload")
    cache = tmp_path / "cache"
    assert fetch_pretrained("resnet18", url=src.as_uri(), cache_dir=cache) is None
    assert not list(cache.glob("*.pth")) and not list(cache.glob("*.part"))

    # a pre-poisoned cache entry is also detected and evicted on read
    # (mirror URLs cache under a model-prefixed name — poison that name)
    cache.mkdir(exist_ok=True)
    poisoned = cache / "resnet18-resnet18-5c106cde.pth"
    poisoned.write_bytes(b"corrupt payload")
    got = fetch_pretrained(
        "resnet18",
        url="file:///definitely/not/here/resnet18-5c106cde.pth",
        cache_dir=cache,
    )
    assert got is None
    assert not poisoned.exists()


def test_fetch_offline_returns_none(tmp_path):
    got = fetch_pretrained(
        "resnet18", url="file:///definitely/not/here.pth",
        cache_dir=tmp_path / "c",
    )
    assert got is None
    assert not list((tmp_path / "c").glob("*.part"))  # no partial left


def test_auto_pretrained_disabled_by_env(monkeypatch):
    monkeypatch.setenv("SVOS_ZOO", "0")
    assert auto_pretrained_path("resnet18") is None


def test_fetched_checkpoint_converts_with_layer4_drop(
    torchvision_style_ckpt, tmp_path
):
    """The fetched file flows through the same convert path as an explicit
    --pretrained: conv1..layer3 weights land, layer4 keeps the fresh init
    (shapes differ in the VOS topology — reference ``resnet.py:166-171``)."""
    import jax
    import torch

    from semi_supervised_vos_tpu.models.convert import (
        convert_torchvision_backbone,
    )
    from semi_supervised_vos_tpu.models.vos_net import VOSNet

    path = fetch_pretrained(
        "resnet18", url=torchvision_style_ckpt.as_uri(),
        cache_dir=tmp_path / "cache",
    )
    sd = {
        k: v.numpy()
        for k, v in torch.load(path, map_location="cpu", weights_only=True).items()
    }

    net = VOSNet(model="resnet18")
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    fresh_l4 = np.asarray(
        variables["params"]["backbone"]["layer4_0"]["conv1"]["conv"]["kernel"]
    ).copy()
    merged = convert_torchvision_backbone(sd, variables, "resnet18")

    got_c1 = np.asarray(merged["params"]["backbone"]["conv1"]["conv"]["kernel"])
    want_c1 = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got_c1, want_c1, rtol=1e-6)
    # layer4 dropped: stays at the fresh init
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["backbone"]["layer4_0"]["conv1"]["conv"]["kernel"]),
        fresh_l4,
    )


def test_facebook_swsl_bootstrap_full_load(tmp_path):
    """The swsl checkpoint is a plain torchvision-format resnet50 state dict;
    unlike the resnet18/50/101 paths the reference loads it WHOLE (torch.hub
    + stride patch, ``vos_net.py:29-38``), so the facebook conversion merges
    layer4 too and drops only fc."""
    import sys

    import jax
    import torch

    from semi_supervised_vos_tpu.models.convert import (
        convert_torchvision_backbone,
    )
    from semi_supervised_vos_tpu.models.vos_net import VOSNet

    sys.path.insert(0, "/root/reference")
    from src.model.backbone.resnet import Bottleneck, ResNet

    torch.manual_seed(3)
    resnet = ResNet(Bottleneck, [3, 4, 6, 3], BatchNorm=torch.nn.BatchNorm2d)
    # torchvision widths for layer3/4 (the VOS ResNet narrows them); strides
    # don't affect the state dict so no patch is needed for key/shape parity
    resnet.inplanes = 512
    resnet.layer3 = resnet._make_layer(
        Bottleneck, 256, 6, torch.nn.BatchNorm2d, stride=2
    )
    resnet.inplanes = 1024
    resnet.layer4 = resnet._make_layer(
        Bottleneck, 512, 3, torch.nn.BatchNorm2d, stride=2
    )
    src = tmp_path / "swsl_resnet50_test.pth"  # no sha suffix: synthetic bytes
    torch.save(resnet.state_dict(), src)

    cache = tmp_path / "cache"
    path = fetch_pretrained("facebook", url=src.as_uri(), cache_dir=cache)
    assert path is not None
    assert (cache / f"facebook-{src.name}").exists()

    sd = {
        k: v.numpy()
        for k, v in torch.load(path, map_location="cpu", weights_only=True).items()
    }
    assert any(k.startswith("fc") for k in sd)  # hub dict carries the head

    net = VOSNet(model="facebook")
    variables = net.init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32)
    )
    merged = convert_torchvision_backbone(sd, variables, "facebook")

    for layer, tkey in [
        (("backbone", "conv1"), "conv1.weight"),
        (("backbone", "layer4_0", "conv1"), "layer4.0.conv1.weight"),
        (("backbone", "layer4_2", "conv3"), "layer4.2.conv3.weight"),
    ]:
        got = merged["params"]
        for part in layer:
            got = got[part]
        np.testing.assert_allclose(
            np.asarray(got["conv"]["kernel"]),
            np.transpose(sd[tkey], (2, 3, 1, 0)),
            rtol=1e-6,
        )
    # the head has no ImageNet counterpart: stays at the fresh init
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["adjust_dim_0"]["conv"]["kernel"]),
        np.asarray(variables["params"]["adjust_dim_0"]["conv"]["kernel"]),
    )
