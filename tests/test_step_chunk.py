"""Scanned chunk steps equal per-frame steps, including partial final chunks."""

import jax
import numpy as np
import pytest

from semi_supervised_vos_tpu.infer.engine import EngineConfig, PropagationEngine
from semi_supervised_vos_tpu.models.vos_net import VOSNet


@pytest.fixture(scope="module")
def setup():
    net = VOSNet(model="resnet18", dtype=np.float32)
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    return net, variables


def test_step_chunk_matches_per_frame(setup, rng):
    net, variables = setup
    cfg = EngineConfig(ref_num=5, frame_range=6, compute_dtype=np.float32)
    t_total = 10
    frames = rng.integers(0, 255, (t_total, 32, 32, 3), dtype=np.uint8)
    label0 = (rng.random((32, 32)) < 0.3).astype(np.int32)

    e1 = PropagationEngine(net, variables, (32, 32), cfg)
    st = e1.start_video(frames[0], label0)
    per_frame = []
    for t in range(1, t_total):
        m, st = e1.step_final(frames[t], st, t)
        per_frame.append(np.asarray(m))

    e2 = PropagationEngine(net, variables, (32, 32), cfg)
    st = e2.start_video(frames[0], label0)
    m1, st = e2.step_chunk(frames[1:5], st, 1)       # frames 1..4
    m2, st = e2.step_chunk(frames[5:10], st, 5)      # frames 5..9
    chunked = np.concatenate([np.asarray(m1), np.asarray(m2)])

    np.testing.assert_array_equal(np.stack(per_frame), chunked)


def test_step_chunk_scores_matches_per_frame(setup, rng):
    """The multi-stream strategies' chunked path: raw (N, D, P) scores from
    one scanned program equal per-frame ``step`` scores, including a
    final partial chunk padded caller-style (repeat last frame, slice
    ``[:k]`` — ``strategies.run_streams``)."""
    net, variables = setup
    cfg = EngineConfig(ref_num=5, frame_range=6, compute_dtype=np.float32)
    t_total = 8
    frames = rng.integers(0, 255, (t_total, 32, 32, 3), dtype=np.uint8)
    label0 = (rng.random((32, 32)) < 0.3).astype(np.int32)

    e1 = PropagationEngine(net, variables, (32, 32), cfg)
    st = e1.start_video(frames[0], label0)
    per_frame = []
    for t in range(1, t_total):
        p, st = e1.step(frames[t], st, t)
        per_frame.append(np.asarray(p))

    e2 = PropagationEngine(net, variables, (32, 32), cfg)
    st = e2.start_video(frames[0], label0)
    s1, st = e2.step_chunk_scores(frames[1:5], st, 1)          # frames 1..4
    tail = np.concatenate([frames[5:8], frames[7:8]])           # 3 real + 1 pad
    s2, st = e2.step_chunk_scores(tail, st, 5)
    chunked = np.concatenate([np.asarray(s1), np.asarray(s2)[:3]])

    np.testing.assert_allclose(np.stack(per_frame), chunked, rtol=0, atol=1e-5)


def test_grouped_map_remainder_and_divisor():
    """grouped_map encodes full cap-sized groups plus one remainder call —
    identical rows to fn(x), for cap | n, cap coprime with n, and cap >= n."""
    import jax.numpy as jnp

    from semi_supervised_vos_tpu.infer.engine import grouped_map

    x = np.arange(9 * 4, dtype=np.float32).reshape(9, 4)
    fn = lambda xb: jnp.sin(xb) * 2.0 + xb.shape[0] * 0  # per-row, shape-safe
    want = np.asarray(fn(jnp.asarray(x)))
    for cap in (1, 2, 3, 4, 9, 100):
        got = np.asarray(grouped_map(fn, jnp.asarray(x), cap))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_encode_batch_grouped_equals_whole(setup, rng, monkeypatch):
    """A capped (grouped + remainder) chunk encode returns the same features
    as the single whole-chunk forward — e.g. SVOS_CHUNK=5 at a cap of 2."""
    net, variables = setup
    cfg = EngineConfig(ref_num=5, frame_range=6, compute_dtype=np.float32)
    frames = rng.integers(0, 255, (5, 32, 32, 3), dtype=np.uint8)

    e = PropagationEngine(net, variables, (32, 32), cfg)
    whole = np.asarray(e._encode_batch_impl(variables, frames))

    import semi_supervised_vos_tpu.infer.batched as batched_mod

    monkeypatch.setattr(batched_mod, "_hbm_lanes_cap", lambda hw: 2)
    grouped = np.asarray(
        jax.jit(e._encode_batch_impl)(variables, frames)
    )  # fresh trace under the patched cap
    np.testing.assert_allclose(grouped, whole, atol=1e-5)
