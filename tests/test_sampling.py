"""Golden tests for the frame-sampling schedule vs the reference semantics
(``/root/reference/src/model/predict.py:74-89``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_vos_tpu.core.sampling import (
    bank_capacity,
    sample_frames,
    sample_frames_host,
)


def reference_transcription(frame_idx, take_range, num_refs, continuous_frame=4):
    """Direct NumPy transcription of predict.py:74-89 (np.linspace + trunc)."""
    if frame_idx <= num_refs:
        return list(range(frame_idx))
    dense_num = continuous_frame - 1
    sparse_num = num_refs - dense_num
    ref_end = frame_idx - dense_num - 1
    ref_start = max(ref_end - take_range, 0)
    idx = np.linspace(ref_start, ref_end, sparse_num).astype(np.int64).tolist()
    for j in range(dense_num):
        idx.append(frame_idx - dense_num + j)
    return idx


@pytest.mark.parametrize("take_range,num_refs", [(40, 9), (20, 9), (40, 5), (12, 7), (40, 4)])
def test_host_matches_reference_transcription(take_range, num_refs):
    for frame_idx in range(1, 130):
        assert sample_frames_host(frame_idx, take_range, num_refs) == reference_transcription(
            frame_idx, take_range, num_refs
        )


@pytest.mark.parametrize("take_range,num_refs", [(40, 9), (20, 9), (40, 5), (12, 7)])
def test_jit_matches_host(take_range, num_refs):
    fn = jax.jit(
        lambda t: sample_frames(t, take_range, num_refs), static_argnums=()
    )
    for frame_idx in range(1, 130):
        idx, valid, dense = fn(jnp.int32(frame_idx))
        idx, valid, dense = np.asarray(idx), np.asarray(valid), np.asarray(dense)
        expect = sample_frames_host(frame_idx, take_range, num_refs)
        got = idx[valid].tolist()
        assert got == expect, (frame_idx, got, expect)
        # invalid slots are zeroed
        assert (idx[~valid] == 0).all()


def test_dense_mask_positional_rule():
    # frame_idx <= 15: all sampled slots dense (predict.py:66)
    for frame_idx in range(1, 16):
        _, valid, dense = sample_frames(jnp.int32(frame_idx), 40, 9)
        assert np.asarray(dense)[np.asarray(valid)].all()
    # frame_idx > 15: exactly the last CONTINUOUS_FRAME sampled slots dense
    for frame_idx in range(16, 100):
        _, valid, dense = sample_frames(jnp.int32(frame_idx), 40, 9)
        dense = np.asarray(dense)[np.asarray(valid)]
        assert (~dense[:-4]).all() and dense[-4:].all()


def test_sampled_indices_within_bank_capacity():
    cap = bank_capacity(40)
    for frame_idx in range(1, 500):
        idx = sample_frames_host(frame_idx, 40, 9)
        assert all(frame_idx - i <= cap for i in idx)
        assert all(0 <= i < frame_idx for i in idx)


def test_jit_matches_host_fuzz(rng):
    """Random (take_range, num_refs, continuous_frame) configs stay exact."""
    for _ in range(60):
        take_range = int(rng.integers(1, 60))
        continuous_frame = int(rng.integers(2, 6))
        num_refs = int(rng.integers(continuous_frame, continuous_frame + 12))
        frame_idx = int(rng.integers(1, 150))
        expect = sample_frames_host(frame_idx, take_range, num_refs, continuous_frame)
        idx, valid, dense = sample_frames(
            frame_idx, take_range, num_refs, continuous_frame
        )
        got = np.asarray(idx)[np.asarray(valid)].tolist()
        assert got == expect, (frame_idx, take_range, num_refs, continuous_frame)
