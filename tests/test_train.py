"""Training-loop tests: optimizer parity, loss-decrease e2e, checkpoint
round-trip, and all losses through the train step."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.helpers import make_davis_dataset


def test_sgd_nesterov_matches_torch(rng):
    """optax chain vs torch.optim.SGD(momentum=0.9, nesterov, wd=3e-4)."""
    from semi_supervised_vos_tpu.train.train_state import make_optimizer, set_learning_rate

    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(4)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=0.02, momentum=0.9, nesterov=True, weight_decay=3e-4)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = make_optimizer(base_lr=0.02)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_cosine_lr_matches_torch():
    from semi_supervised_vos_tpu.train.train_state import cosine_lr

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.02)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, 240, eta_min=4e-5)
    for epoch in range(0, 50, 7):
        while sched.last_epoch < epoch:
            sched.step()
        np.testing.assert_allclose(
            float(cosine_lr(epoch, base_lr=0.02, epochs=240)),
            opt.param_groups[0]["lr"],
            rtol=1e-6,
        )


@pytest.mark.parametrize("loss_name", ["cross_entropy", "focal", "contrastive", "triplet"])
def test_train_step_all_losses(loss_name, rng):
    """One optimizer step per loss: finite loss, params move."""
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.ops.onehot import davis_centroids
    from semi_supervised_vos_tpu.train.loop import LossSpec, make_train_step
    from semi_supervised_vos_tpu.train.miners import get_miner
    from semi_supervised_vos_tpu.train.train_state import init_train_state, make_optimizer

    net = VOSNet(model="resnet18")
    tx = make_optimizer(base_lr=0.01)
    state = init_train_state(net, jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    miner = get_miner("default") if loss_name == "triplet" else None
    if miner:
        miner.max_triplets = 32
    spec = LossSpec(name=loss_name, miner=miner)
    step = make_train_step(net, spec, tx)

    imgs = rng.integers(0, 255, (2, 3, 32, 32, 3)).astype(np.uint8)
    anns = np.zeros((2, 3, 32, 32, 3), np.uint8)
    anns[:, :, 8:20, 8:20] = [128, 0, 0]
    centroids = jnp.asarray(davis_centroids(), jnp.float32)

    before = np.asarray(state.params["backbone"]["conv1"]["conv"]["kernel"]).copy()
    state2, loss = step(state, imgs, anns, centroids, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), loss_name
    after = np.asarray(state2.params["backbone"]["conv1"]["conv"]["kernel"])
    assert not np.array_equal(before, after), f"{loss_name}: params did not move"


def test_training_reduces_loss_and_improves_inference(tmp_path, rng):
    """Mini end-to-end: train a few epochs on a synthetic dataset, check the
    loss drops and inference J beats the random-init baseline."""
    from semi_supervised_vos_tpu.cli.train import train_command_impl

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a", "b"), frames=8, size=(96, 96))

    state = train_command_impl(
        frame_num=4, training=str(root), validation=str(root), resume=None,
        save_model=str(tmp_path / "ckpts"), epochs=3, bs=2, lr=0.01,
        loss="cross_entropy", freeze=False, miner="default", margin=0.1,
        loss_weight=1.0, max_triplets=0, early_stop=False,
        model_name="resnet18", device="cpu", disable=True, crop=96,
    )

    ckpts = sorted((tmp_path / "ckpts").iterdir())
    assert len(ckpts) == 3
    # loss embedded in the filename (reference naming, train.py:144)
    losses = [float(c.name.split("-")[3]) for c in ckpts]
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip(tmp_path):
    from semi_supervised_vos_tpu.models.vos_net import VOSNet
    from semi_supervised_vos_tpu.train.train_state import (
        init_train_state,
        make_optimizer,
        restore_checkpoint,
        save_checkpoint,
    )

    net = VOSNet(model="resnet18")
    tx = make_optimizer()
    state = init_train_state(net, jax.random.PRNGKey(7), (1, 32, 32, 3), tx)
    state = state._replace(epoch=jnp.int32(5))
    save_checkpoint(state, tmp_path / "ck.ckpt")

    blank = init_train_state(net, jax.random.PRNGKey(8), (1, 32, 32, 3), tx)
    restored = restore_checkpoint(tmp_path / "ck.ckpt", blank)
    assert int(restored.epoch) == 5
    np.testing.assert_array_equal(
        np.asarray(restored.params["backbone"]["conv1"]["conv"]["kernel"]),
        np.asarray(state.params["backbone"]["conv1"]["conv"]["kernel"]),
    )


def test_train_cli_data_parallel_8_devices(tmp_path):
    """bs divisible by the (virtual) device count engages the DP mesh in the
    train command itself."""
    from semi_supervised_vos_tpu.cli.train import train_command_impl

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a", "b"), frames=10, size=(64, 64))

    state = train_command_impl(
        frame_num=3, training=str(root), validation=str(root), resume=None,
        save_model=str(tmp_path / "ckpts"), epochs=1, bs=8, lr=0.01,
        loss="cross_entropy", freeze=False, miner="default", margin=0.1,
        loss_weight=1.0, max_triplets=0, early_stop=False,
        model_name="resnet18", device="cpu", disable=True, crop=64,
    )
    ckpts = sorted((tmp_path / "ckpts").iterdir())
    assert len(ckpts) == 1
    loss = float(ckpts[0].name.split("-")[3])
    assert np.isfinite(loss)


def test_bf16_training_step(tmp_path):
    """Mixed-precision training: bf16 backbone compute, f32 params — loss
    finite and decreasing over two steps."""
    from semi_supervised_vos_tpu.cli.train import train_command_impl

    root = tmp_path / "davis"
    make_davis_dataset(root, videos=("a",), frames=6, size=(64, 64))
    train_command_impl(
        frame_num=3, training=str(root), validation=str(root), resume=None,
        save_model=str(tmp_path / "ckpts"), epochs=2, bs=2, lr=0.01,
        loss="cross_entropy", freeze=False, miner="default", margin=0.1,
        loss_weight=1.0, max_triplets=0, early_stop=False,
        model_name="resnet18", device="cpu", disable=True, crop=64, bf16=True,
    )
    ckpts = sorted((tmp_path / "ckpts").iterdir())
    losses = [float(c.name.split("-")[3]) for c in ckpts]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_full_workflow_multiobject_jf(tmp_path, rng):
    """The complete reference workflow (``reference/example.sh:1-19``) on a
    MULTI-OBJECT synthetic set, trained-weights-realistic, on CPU:
    train (CLI) -> inference (CLI, Orbax checkpoint) -> evaluation (CLI),
    asserting the trained model's J&F clears a fixed floor AND beats the
    random-init baseline run through the identical pipeline. This is the
    strongest offline stand-in for real-DAVIS J&F parity (BASELINE.md)."""
    from tests.helpers import make_reference_checkpoint

    from semi_supervised_vos_tpu.cli.inference import inference_command_impl
    from semi_supervised_vos_tpu.cli.train import train_command_impl
    from semi_supervised_vos_tpu.eval.evaluation import evaluation_command_impl

    root = tmp_path / "davis"
    make_davis_dataset(
        root, videos=("a", "b"), frames=8, size=(96, 96), objects=2
    )

    train_command_impl(
        frame_num=4, training=str(root), validation=str(root), resume=None,
        save_model=str(tmp_path / "ckpts"), epochs=4, bs=2, lr=0.01,
        loss="cross_entropy", freeze=False, miner="default", margin=0.1,
        loss_weight=1.0, max_triplets=0, early_stop=False,
        model_name="resnet18", device="cpu", disable=True, crop=96,
    )
    last_ckpt = sorted((tmp_path / "ckpts").iterdir())[-1]

    def infer_and_eval(ckpt, tag):
        out = tmp_path / f"out_{tag}"
        inference_command_impl(
            ref_num=9, data=str(root), resume=str(ckpt), model="resnet18",
            temperature=1.0, frame_range=40, sigma_1=8.0, sigma_2=21.0,
            save=str(out), device="cpu", inference_strategy="single",
            additional_resume=None, additional_model_type="resnet18",
            probability_propagation=False, scale=1.15, reduction="mean",
            disable=True,
        )
        j, f, jf = evaluation_command_impl(
            root / "Annotations" / "480p", out, disable=True, processes=1
        )
        return j, f, jf

    rand_ckpt = tmp_path / "rand.pth.tar"
    make_reference_checkpoint(rand_ckpt, "resnet18")
    j_rand, _, jf_rand = infer_and_eval(rand_ckpt, "random")
    j_tr, f_tr, jf_tr = infer_and_eval(last_ckpt, "trained")

    # multi-object J&F: per-object (ids 1 and 2) J and F averaged — the
    # DAVIS-2017 protocol the reference's evaluation implements. On 96²
    # frames the boundary-F term is structurally capped: stride-8 features
    # upsampled nearest give 8-px boundary steps against a 0.008·diag ≈
    # 1.6-px DAVIS tolerance (measured: J 0.76, F 0.23 trained), so the
    # fixed floors are J > 0.7 (segmentation quality) and J&F > 0.45.
    assert j_tr > 0.7, (j_tr, f_tr, jf_tr)
    assert jf_tr > 0.45, (j_tr, f_tr, jf_tr)
    assert jf_tr > jf_rand, (jf_tr, jf_rand)


def test_device_stage_order_shard_and_errors():
    """`_device_stage` preserves batch order, applies shard_fn on the staging
    thread, and re-raises loader exceptions on the consumer side."""
    from semi_supervised_vos_tpu.train.loop import _device_stage

    batches = [
        (np.full((2, 2), i, np.uint8), np.full((2,), i, np.uint8))
        for i in range(5)
    ]
    out = list(_device_stage(iter(batches), None))
    assert [int(i[0, 0]) for i, _, _ in out] == list(range(5))
    assert all(isinstance(i, jax.Array) for i, _, _ in out)
    assert all(g is None for _, _, g in out)  # no geometry_fn → None slot

    tagged = list(
        _device_stage(iter(batches), lambda i, a: (i, a + 100))
    )
    assert [int(a[0]) for _, a, _ in tagged] == [100 + i for i in range(5)]

    # geometry_fn runs on the staging thread and its output rides along
    geo = list(
        _device_stage(
            iter(batches), None, geometry_fn=lambda anns: (anns + 1,)
        )
    )
    assert [int(g[0][0]) for _, _, g in geo] == [1 + i for i in range(5)]

    def bad_loader():
        yield batches[0]
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(_device_stage(bad_loader(), None))


def test_device_stage_consumer_abort_reaps_producer():
    """If the epoch loop aborts mid-stream (train-step exception), the
    staging thread must not stay parked forever on the bounded queue — the
    generator's close path signals it and joins."""
    import threading
    import time

    from semi_supervised_vos_tpu.train.loop import _device_stage

    started = threading.active_count()

    def endless_loader():
        i = 0
        while True:  # more batches than the consumer will ever take
            yield np.full((2, 2), i % 251, np.uint8), np.full((2,), i % 251, np.uint8)
            i += 1

    gen = _device_stage(endless_loader(), None)
    first = next(gen)
    assert int(np.asarray(first[0])[0, 0]) == 0
    gen.close()  # what an exception propagating through the loop does

    deadline = time.time() + 10.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= started, "staging thread leaked"
