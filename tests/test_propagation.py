"""Golden tests for the propagation core vs a torch transcription of
``/root/reference/src/model/predict.py:19-71`` (the `predict` function)."""

import numpy as np
import pytest
import torch

from semi_supervised_vos_tpu.core.propagation import (
    affinity_propagate,
    batch_predict,
    batch_similarity,
)
from semi_supervised_vos_tpu.core.sampling import sample_frames, sample_frames_host
from semi_supervised_vos_tpu.core.spatial import spatial_weight


def torch_reference_predict(
    ref, target, ref_label, weight_dense, weight_sparse, frame_idx,
    take_range, ref_num, temperature, probability_propagation,
    continuous_frame=4,
):
    """Transcription of predict() + sample_frames() (predict.py:19-89)."""
    d = ref_label.shape[0]
    sample_idx = torch.tensor(
        sample_frames_host(frame_idx, take_range, ref_num), dtype=torch.long
    )
    ref_selected = ref.index_select(0, sample_idx)
    ref_label_selected = ref_label.index_select(1, sample_idx).reshape(d, -1)

    (num_ref, feature_dim, H, W) = ref_selected.shape
    ref_selected = ref_selected.permute(0, 2, 3, 1).reshape(-1, feature_dim)
    target = target.reshape(feature_dim, -1)
    sim = ref_selected.mm(target)
    sim = sim * temperature
    sim = sim.softmax(dim=0)
    sim = sim.contiguous().view(num_ref, H * W, H * W)
    if not probability_propagation:
        if frame_idx > 15:
            sim[:-continuous_frame] *= weight_sparse
            sim[-continuous_frame:] *= weight_dense
        else:
            sim = sim.mul(weight_dense)
    sim = sim.view(-1, H * W)
    return ref_label_selected.float().mm(sim.float()).numpy()


def _setup(rng, n_frames, h, w, c=16, d=5):
    feats = rng.standard_normal((n_frames, c, h, w)).astype(np.float32)
    labels = rng.integers(0, d, size=(n_frames, h * w))
    onehot = np.zeros((d, n_frames, h * w), np.float32)
    for f in range(n_frames):
        onehot[labels[f], f, np.arange(h * w)] = 1.0
    return feats, onehot


@pytest.mark.parametrize("frame_idx", [1, 3, 9, 12, 16, 30, 60])
@pytest.mark.parametrize("prob_prop", [False, True])
def test_matches_reference_predict(rng, frame_idx, prob_prop):
    h, w, c, d = 6, 7, 16, 5
    take_range, ref_num, temperature = 40, 9, 1.7
    feats, onehot = _setup(rng, frame_idx, h, w, c, d)
    target = rng.standard_normal((c, h, w)).astype(np.float32)
    wd = np.asarray(spatial_weight((h, w), 8.0))
    ws = np.asarray(spatial_weight((h, w), 21.0))

    expect = torch_reference_predict(
        torch.from_numpy(feats), torch.from_numpy(target), torch.from_numpy(onehot),
        torch.from_numpy(wd), torch.from_numpy(ws),
        frame_idx, take_range, ref_num, temperature, prob_prop,
    )

    # TPU-native call: fixed ref_num slots gathered + masked.
    idx, valid, dense = sample_frames(frame_idx, take_range, ref_num)
    idx = np.asarray(idx)
    ref_feats = feats[idx].transpose(0, 2, 3, 1).reshape(ref_num, h * w, c)
    ref_labels = onehot[:, idx, :].transpose(1, 2, 0)  # (K, P, D)
    target_feat = target.reshape(c, h * w).T

    got = affinity_propagate(
        ref_feats, target_feat, ref_labels,
        temperature=temperature, valid=valid, dense=dense,
        weight_dense=None if prob_prop else wd,
        weight_sparse=None if prob_prop else ws,
    )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4, atol=1e-5)


def test_padded_classes_never_win(rng):
    """Class channels >= d stay exactly zero, so argmax never picks padding."""
    h, w, c, d, d_pad = 4, 5, 8, 3, 22
    feats, onehot = _setup(rng, 5, h, w, c, d)
    onehot_padded = np.zeros((d_pad, 5, h * w), np.float32)
    onehot_padded[:d] = onehot
    target = rng.standard_normal((c, h, w)).astype(np.float32)
    wd = np.asarray(spatial_weight((h, w), 8.0))

    idx, valid, dense = sample_frames(4, 40, 9)
    idx = np.asarray(idx)
    got = affinity_propagate(
        feats[idx].transpose(0, 2, 3, 1).reshape(9, h * w, c),
        target.reshape(c, h * w).T,
        onehot_padded[:, idx, :].transpose(1, 2, 0),
        temperature=1.0, valid=valid, dense=dense,
        weight_dense=wd, weight_sparse=wd,
    )
    got = np.asarray(got)
    assert (got[d:] == 0.0).all()
    assert (np.argmax(got, axis=0) < d).all()


def test_batch_similarity_and_predict_match_torch(rng):
    """Training-side math vs loss.py:13-36."""
    b, n, c, h, w, d = 2, 3, 8, 4, 5, 6
    ref = rng.standard_normal((b, n, c, h, w)).astype(np.float32)
    target = rng.standard_normal((b, c, h, w)).astype(np.float32)
    label = rng.standard_normal((b, n, d, h, w)).astype(np.float32)

    tref, ttgt, tlab = map(torch.from_numpy, (ref, target, label))
    sim_t = tref.permute(0, 1, 3, 4, 2).reshape(b, -1, c).bmm(ttgt.reshape(b, c, -1))
    pred_t = tlab.transpose(1, 2).reshape(b, d, -1).bmm(sim_t).reshape(b, d, h, w)

    sim = batch_similarity(ref.transpose(0, 1, 3, 4, 2), target.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(sim), sim_t.numpy(), rtol=1e-5, atol=1e-5)

    pred = batch_predict(sim, label.transpose(0, 1, 3, 4, 2))
    np.testing.assert_allclose(
        np.asarray(pred).transpose(0, 3, 1, 2), pred_t.numpy(), rtol=1e-4, atol=1e-5
    )
