"""Coverage for early stopping, the validation command, sharded-affinity
K padding, AverageMeter, and morphology primitives."""

import json

import numpy as np
import pytest

from tests.helpers import make_davis_dataset, make_reference_checkpoint


def test_early_stopping_semantics(tmp_path):
    from semi_supervised_vos_tpu.train.early_stopping import EarlyStopping

    saved = []
    es = EarlyStopping(
        tmp_path, patience=2, save_fn=lambda state, path: saved.append((state, path))
    )
    assert es(1.0, 0, "s0") is False  # first: best, saved
    assert es(0.5, 1, "s1") is False  # improvement: saved, counter reset
    assert es(float("nan"), 2, "sx") is False  # no signal: ignored entirely
    assert es(0.6, 3, "s2") is False  # worse: counter 1
    assert es(0.7, 4, "s3") is True   # worse: counter 2 == patience → stop
    assert [s[0] for s in saved] == ["s0", "s1"]
    assert es.best_epoch == 1 and es.val_loss_min == 0.5


def test_plateau_update_is_pure():
    from semi_supervised_vos_tpu.train.early_stopping import (
        PlateauMonitor,
        plateau_update,
    )

    m0 = PlateauMonitor()
    m1, improved, stop = plateau_update(m0, 2.0, 0, patience=1)
    assert improved and not stop and m1.best_epoch == 0
    assert m0 == PlateauMonitor()  # input untouched
    # equal loss is NOT an improvement (matches the reference's strictness)
    m2, improved, stop = plateau_update(m1, 2.0, 1, patience=1)
    assert not improved and stop and m2.stale == 1


def test_average_meter():
    from semi_supervised_vos_tpu.utils.meters import AverageMeter

    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.val == 4.0
    assert m.count == 4
    assert m.avg == pytest.approx((2 + 12) / 4)
    m.reset()
    assert m.count == 0


def test_validation_command_reports_losses(tmp_path):
    from semi_supervised_vos_tpu.cli.validation import validation_command_impl

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a",), frames=6, size=(64, 64))
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    make_reference_checkpoint(ckpt_dir / "one.pth.tar", "resnet18")

    out = tmp_path / "losses.json"
    losses = validation_command_impl(
        data=str(root), checkpoints=str(ckpt_dir), bs=2, loss="cross_entropy",
        miner="default", margin=0.1, loss_weight=1.0, output=str(out),
        model_name="resnet18", device="cpu", frame_num=3, crop=64,
    )
    assert "one.pth.tar" in losses
    assert np.isfinite(losses["one.pth.tar"])
    assert json.loads(out.read_text()) == pytest.approx(losses)


def test_validation_command_data_parallel(tmp_path, monkeypatch):
    """Validation over the data mesh (bs divides the 8 virtual devices)
    reports the same loss as the single-device run."""
    import jax

    from semi_supervised_vos_tpu.cli.validation import validation_command_impl

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a",), frames=18, size=(64, 64))
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    make_reference_checkpoint(ckpt_dir / "one.pth.tar", "resnet18")

    kwargs = dict(
        data=str(root), checkpoints=str(ckpt_dir), bs=8, loss="cross_entropy",
        miner="default", margin=0.1, loss_weight=1.0, output=None,
        model_name="resnet18", device="cpu", frame_num=3, crop=64,
    )
    losses_dp = validation_command_impl(**kwargs)  # engages the 8-mesh

    real_count = jax.device_count
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    try:
        losses_single = validation_command_impl(**kwargs)
    finally:
        monkeypatch.setattr(jax, "device_count", real_count)

    assert losses_dp["one.pth.tar"] == pytest.approx(
        losses_single["one.pth.tar"], rel=1e-5
    )


def test_sharded_affinity_pads_uneven_k(rng):
    """K=9 over an 8-device model axis pads with masked slots — exact."""
    from semi_supervised_vos_tpu.core.propagation import affinity_propagate
    from semi_supervised_vos_tpu.parallel.mesh import make_mesh
    from semi_supervised_vos_tpu.parallel.sharded_affinity import (
        sharded_affinity_propagate,
    )

    mesh = make_mesh(n_data=1, n_model=8)
    k, p, c, d = 9, 16, 8, 4
    ref = rng.standard_normal((k, p, c)).astype(np.float32)
    tgt = rng.standard_normal((p, c)).astype(np.float32)
    lab = rng.random((k, p, d)).astype(np.float32)

    expect = affinity_propagate(ref, tgt, lab, temperature=1.0, precision="highest")
    got = sharded_affinity_propagate(
        mesh, ref, tgt, lab, temperature=1.0, precision="highest"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-6)


def test_skeletonize_basic_shapes():
    from semi_supervised_vos_tpu.utils.morphology import skeletonize

    # a thick horizontal bar thins to a line
    bar = np.zeros((11, 21), np.uint8)
    bar[3:8, 2:19] = 1
    sk = skeletonize(bar)
    assert sk.sum() > 0
    assert sk.sum() < bar.sum() / 2
    assert (bar[sk == 1] == 1).all()  # skeleton lies inside the mask

    assert skeletonize(np.zeros((5, 5))).sum() == 0


def test_mask_drain_orders_and_propagates():
    """MaskDrain returns conversion results in submission order, supports
    multiple drain cycles (one per video), and re-raises worker exceptions
    at drain() — the contract the inference runners rely on."""
    import time

    import pytest

    from semi_supervised_vos_tpu.infer.drain import MaskDrain

    with MaskDrain() as d:
        # later submissions finish faster; order must still hold
        d.submit(lambda: (time.sleep(0.05), "a")[1])
        d.submit(lambda: "b")
        assert d.drain() == ["a", "b"]
        # second cycle starts empty
        assert d.drain() == []
        d.submit(lambda: "c")
        assert d.drain() == ["c"]

    d = MaskDrain()
    try:
        d.submit(lambda: 1 / 0)
        d.submit(lambda: "after")
        with pytest.raises(ZeroDivisionError):
            d.drain()
    finally:
        d.close()
