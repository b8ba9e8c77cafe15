"""Spatial-weight parity vs a torch transcription of the reference
(``/root/reference/src/model/predict.py:158-175``), including the
fractional-row coordinate quirk of torch 1.8 true division."""

import numpy as np
import torch

from semi_supervised_vos_tpu.core.spatial import spatial_coords, spatial_weight


def torch_reference_spatial_weight(shape, sigma):
    """Transcription of get_spatial_weight (predict.py:158-175) on CPU."""
    h, w = shape
    index_matrix = torch.arange(h * w, dtype=torch.long).reshape(h * w, 1)
    index_matrix = torch.cat((index_matrix.div(float(w)), index_matrix % w), -1)
    d = index_matrix - index_matrix.unsqueeze(1)
    d = d.float().pow(2).sum(-1)
    return (-d / sigma**2).exp().numpy()


def test_matches_torch_semantics():
    for shape, sigma in [((4, 7), 8.0), ((6, 5), 21.0), ((3, 3), 1.5)]:
        ref = torch_reference_spatial_weight(shape, sigma)
        mine = np.asarray(spatial_weight(shape, sigma))
        np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)


def test_fractional_row_coordinate():
    # The reference's row coordinate is idx / W (true division), NOT idx // W.
    coords = np.asarray(spatial_coords(2, 4))
    np.testing.assert_allclose(coords[5], [1.25, 1.0])
    np.testing.assert_allclose(coords[3], [0.75, 3.0])


def test_symmetry_and_diagonal():
    w = np.asarray(spatial_weight((5, 6), 8.0))
    np.testing.assert_allclose(w, w.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(w), 1.0)
