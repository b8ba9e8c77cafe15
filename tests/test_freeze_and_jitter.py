"""Backbone freezing (reference ``train.py:124-128``) and colour jitter
(``datasets.py:66-70``)."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from semi_supervised_vos_tpu.data.transforms import FixedColorJitter


def test_freeze_blocks_backbone_updates(rng):
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.ops.onehot import davis_centroids
    from semi_supervised_vos_tpu.train.loop import LossSpec, make_train_step
    from semi_supervised_vos_tpu.train.train_state import init_train_state, make_optimizer

    net = VOSNet(model="resnet50")
    tx = make_optimizer(base_lr=0.01)
    state = init_train_state(net, jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    mask = net.frozen_backbone_mask(state.params)
    frozen_mask = jax.tree_util.tree_map(float, mask)
    step = make_train_step(net, LossSpec(name="cross_entropy"), tx, frozen_mask)

    imgs = rng.integers(0, 255, (1, 3, 32, 32, 3)).astype(np.uint8)
    anns = np.zeros((1, 3, 32, 32, 3), np.uint8)
    anns[:, :, 8:20, 8:20] = [128, 0, 0]
    centroids = jnp.asarray(davis_centroids(), jnp.float32)

    bb_before = np.asarray(state.params["backbone"]["conv1"]["conv"]["kernel"]).copy()
    head_before = np.asarray(state.params["adjust_dim"]["conv"]["kernel"]).copy()
    state2, loss = step(state, imgs, anns, centroids, jax.random.PRNGKey(1))
    bb_after = np.asarray(state2.params["backbone"]["conv1"]["conv"]["kernel"])
    head_after = np.asarray(state2.params["adjust_dim"]["conv"]["kernel"])

    np.testing.assert_array_equal(bb_before, bb_after)  # frozen
    assert not np.array_equal(head_before, head_after)  # head trains


def test_fixed_color_jitter_is_deterministic_per_instance(rng):
    img = Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
    jit1 = FixedColorJitter(0.4, 0.4, 0.4, 0.4, rng=np.random.default_rng(0))
    a = np.asarray(jit1(img))
    b = np.asarray(jit1(img))
    np.testing.assert_array_equal(a, b)  # frozen params: same output twice

    jit2 = FixedColorJitter(0.4, 0.4, 0.4, 0.4, rng=np.random.default_rng(1))
    c = np.asarray(jit2(img))
    assert not np.array_equal(a, c)  # different draw differs


def test_train_dataset_color_jitter_path(tmp_path, rng):
    from tests.helpers import make_davis_dataset

    from semi_supervised_vos_tpu.data.davis import TrainDataset

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a",), frames=4, size=(64, 64))
    ds = TrainDataset(
        root / "JPEGImages/480p", root / "Annotations/480p",
        cropping=48, frame_num=3, color_jitter=True,
    )
    imgs, anns, vid = ds[0]
    assert imgs.shape == (3, 48, 48, 3) and anns.shape == (3, 48, 48, 3)
