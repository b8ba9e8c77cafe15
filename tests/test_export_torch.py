"""Round-trip interop: Flax state → reference-format .pth.tar → the actual
reference implementation produces the same predictions as our engine."""

import jax
import numpy as np
import pytest
from PIL import Image

from tests.helpers import make_davis_dataset
from tests.test_reference_parity import run_ours, run_reference


def test_flax_to_torch_roundtrip(rng, tmp_path):
    """export -> convert back -> identical variables."""
    from semi_supervised_vos_tpu.models.convert import (
        convert_vosnet_state_dict,
        export_torch_state_dict,
    )
    from semi_supervised_vos_tpu.models.vos_net import VOSNet

    net = VOSNet(model="resnet50")
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    sd = export_torch_state_dict(variables, "resnet50")
    back = convert_vosnet_state_dict(sd, "resnet50")

    flat_a = jax.tree_util.tree_leaves(variables["params"])
    flat_b = jax.tree_util.tree_leaves(back["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_runs_our_exported_checkpoint(tmp_path):
    """A checkpoint exported from Flax drives the reference implementation to
    the same predictions as our engine (within float noise)."""
    from semi_supervised_vos_tpu.models.convert import export_torch_checkpoint
    from semi_supervised_vos_tpu.models.vos_net import VOSNet

    davis = tmp_path / "davis"
    make_davis_dataset(davis, videos=("a", "b"), frames=20, size=(96, 112))

    net = VOSNet(model="resnet18")
    variables = net.init(jax.random.PRNGKey(3), np.zeros((1, 32, 32, 3), np.float32))
    ckpt = tmp_path / "exported.pth.tar"
    export_torch_checkpoint(variables, str(ckpt), "resnet18")

    ref_out = tmp_path / "ref"
    our_out = tmp_path / "ours"
    run_reference(davis, ckpt, ref_out)
    run_ours(davis, ckpt, our_out)

    total = agree = 0
    for video in ("a", "b"):
        for rf, of in zip(
            sorted((ref_out / video).glob("*.png")),
            sorted((our_out / video).glob("*.png")),
        ):
            r = np.asarray(Image.open(rf))
            o = np.asarray(Image.open(of))
            agree += (r == o).sum()
            total += r.size
    assert total > 0
    assert agree / total > 0.995, f"agreement {agree / total:.4f}"
