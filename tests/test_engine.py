"""Ring-memory-bank engine equivalence vs an unbounded-history reference.

The engine keeps only ``frame_range + continuous_frame + 1`` frames in a ring
buffer; the reference concatenates every frame forever
(``inference_utils.py:71-72``). These must produce identical predictions
because the sampling schedule never reaches beyond the ring capacity.
"""

import jax
import numpy as np
import pytest

from semi_supervised_vos_tpu.core.propagation import affinity_propagate
from semi_supervised_vos_tpu.core.sampling import sample_frames_host
from semi_supervised_vos_tpu.core.spatial import spatial_weight
from semi_supervised_vos_tpu.infer.engine import EngineConfig, PropagationEngine
from semi_supervised_vos_tpu.models.vos_net import VOSNet
from semi_supervised_vos_tpu.ops.onehot import index_to_onehot
from semi_supervised_vos_tpu.ops.resize import nearest_resize


@pytest.fixture(scope="module")
def net_and_vars():
    net = VOSNet(model="resnet18", dtype=np.float32)
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    return net, variables


def test_engine_matches_unbounded_history(net_and_vars, rng):
    net, variables = net_and_vars
    h = w = 32
    t_total = 14
    # small frame_range so the ring wraps within the test
    cfg = EngineConfig(
        ref_num=5,
        frame_range=6,
        temperature=1.3,
        compute_dtype=np.float32,
        matmul_precision="highest",
    )
    engine = PropagationEngine(net, variables, (h, w), cfg)
    assert cfg.capacity < t_total  # the ring genuinely wraps

    frames = rng.integers(0, 255, size=(t_total, h, w, 3), dtype=np.uint8)
    label0 = (rng.random((h, w)) < 0.3).astype(np.int32)

    # --- engine path -------------------------------------------------------
    state = engine.start_video(frames[0], label0)
    engine_masks = []
    for t in range(1, t_total):
        pred, state = engine.step(frames[t], state, t)
        engine_masks.append(np.asarray(jax.numpy.argmax(pred, axis=0)))

    # --- unbounded-history reference --------------------------------------
    wd = spatial_weight((engine.hd, engine.wd), cfg.sigma_1)
    ws = spatial_weight((engine.hd, engine.wd), cfg.sigma_2)
    feats_history = []
    labels_history = []

    def encode(frame):
        return np.asarray(engine._encode(variables, frame))

    feats_history.append(encode(frames[0]))
    label_small = np.asarray(
        nearest_resize(label0[:, :, None], (engine.hd, engine.wd))
    ).reshape(-1)
    labels_history.append(np.asarray(index_to_onehot(label_small, cfg.num_classes)))

    for t in range(1, t_total):
        target = encode(frames[t])
        idx = sample_frames_host(t, cfg.frame_range, cfg.ref_num)
        k = len(idx)
        ref_f = np.stack([feats_history[i] for i in idx])
        ref_l = np.stack([labels_history[i] for i in idx])
        n_valid = k
        dense = np.ones(k, bool)
        if t > 15:
            dense[: n_valid - cfg.continuous_frame] = False
        pred = affinity_propagate(
            ref_f,
            target,
            ref_l,
            temperature=cfg.temperature,
            dense=dense,
            weight_dense=wd,
            weight_sparse=ws,
        )
        mask = np.asarray(jax.numpy.argmax(pred, axis=0))
        np.testing.assert_array_equal(
            engine_masks[t - 1], mask, err_msg=f"frame {t}"
        )
        feats_history.append(target)
        labels_history.append(np.asarray(index_to_onehot(mask, cfg.num_classes)))


def test_engine_probability_propagation(net_and_vars, rng):
    """Probability mode stores raw scores, never argmaxes into the bank."""
    net, variables = net_and_vars
    cfg = EngineConfig(
        ref_num=3, frame_range=4, probability_propagation=True,
        compute_dtype=np.float32,
    )
    engine = PropagationEngine(net, variables, (32, 32), cfg)
    frames = rng.integers(0, 255, size=(4, 32, 32, 3), dtype=np.uint8)
    label0 = (rng.random((32, 32)) < 0.4).astype(np.int32)
    state = engine.start_video(frames[0], label0)
    for t in range(1, 4):
        pred, state = engine.step(frames[t], state, t)
        pred = np.asarray(pred)
        assert np.isfinite(pred).all()
        # prob-prop has no spatial weighting: per-pixel scores sum to 1
        np.testing.assert_allclose(pred.sum(axis=0), 1.0, rtol=1e-4)
        # bank holds the soft scores, not a one-hot
        slot_vals = np.asarray(state.labels[t % cfg.capacity])
        assert not np.array_equal(slot_vals, slot_vals.round())


def test_single_frame_video_saves_annotation_only(tmp_path):
    """A 1-frame video must not crash; output = the copied annotation alone
    (the reference silently saves nothing at all and leaks an unbound
    ``pred_visualize`` crash risk — ``inference_utils.py:80-87``)."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl
    from tests.helpers import make_davis_dataset, make_reference_checkpoint

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("one",), frames=1, size=(64, 80))
    make_davis_dataset(root, videos=("two",), frames=4, size=(64, 80))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    out = tmp_path / "out"
    inference_command_impl(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        save=str(out), device="cpu", inference_strategy="single",
        additional_resume=None, additional_model_type="resnet18",
        probability_propagation=False, scale=1.15, reduction="mean",
        disable=True,
    )
    assert sorted(p.name for p in (out / "one").glob("*.png")) == ["00000.png"]
    assert len(list((out / "two").glob("*.png"))) == 4


def test_odd_named_first_annotation_falls_back(tmp_path):
    """Annotation dirs without 00000.png fall back to the first PNG present
    (the reference hardcodes 00000.png and crashes)."""
    from semi_supervised_vos_tpu.cli.inference import inference_command_impl
    from tests.helpers import make_davis_dataset, make_reference_checkpoint

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("v",), frames=3, size=(64, 80))
    ann = root / "Annotations" / "480p" / "v"
    (ann / "00000.png").rename(ann / "frame_a.png")

    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")
    out = tmp_path / "out"
    inference_command_impl(
        ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
        temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
        save=str(out), device="cpu", inference_strategy="single",
        additional_resume=None, additional_model_type="resnet18",
        probability_propagation=False, scale=1.15, reduction="mean",
        disable=True,
    )
    assert len(list((out / "v").glob("*.png"))) == 3

    # and a clear error when a video has no annotations at all
    import shutil

    shutil.rmtree(ann)
    ann.mkdir()
    import pytest as _pytest

    from semi_supervised_vos_tpu.utils.image import first_annotation_path

    with _pytest.raises(FileNotFoundError, match="no first-frame annotation"):
        first_annotation_path(root / "Annotations" / "480p", "v")
