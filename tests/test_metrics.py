"""DAVIS J&F metric tests on hand-crafted masks (reference
``src/utils/metrics.py`` has no tests upstream; these pin the semantics)."""

import numpy as np
import pytest

from semi_supervised_vos_tpu.eval.metrics import (
    disk,
    eval_f,
    eval_j,
    evaluate_segmentation,
    _seg2bmap,
)


def test_jaccard_hand_computed():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[2:6, 2:6] = True  # 16 px
    b[4:8, 4:8] = True  # 16 px, overlap 2x2=4
    j = eval_j(a, b)
    assert j == pytest.approx(4 / 28)


def test_jaccard_empty_masks_is_one():
    a = np.zeros((5, 5), bool)
    assert eval_j(a, a) == 1


def test_jaccard_void_pixels_excluded():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[0:4, 0:4] = True
    b[0:4, 0:4] = True
    void = np.zeros((10, 10), bool)
    void[0:2, :] = True  # removes half of the overlap from both sets
    j = eval_j(a, b, void)
    assert j == pytest.approx(1.0)  # still identical where not void


def test_f_perfect_match_is_one():
    a = np.zeros((32, 32))
    a[8:24, 8:24] = 1
    assert eval_f(a, a) == pytest.approx(1.0)


def test_f_empty_pred_vs_nonempty_gt_is_zero():
    gt = np.zeros((32, 32))
    gt[8:24, 8:24] = 1
    pred = np.zeros((32, 32))
    assert eval_f(gt, pred) == 0.0  # precision=1, recall=0 → F=0


def test_f_shifted_boundary_within_tolerance():
    # bound_th=0.008 of diag(32,32)≈45 → bound_pix=1: a 1-px shift stays F=1
    gt = np.zeros((32, 32))
    gt[8:24, 8:24] = 1
    pred = np.zeros((32, 32))
    pred[9:25, 8:24] = 1
    assert eval_f(gt, pred) == pytest.approx(1.0)
    # a 3-px shift exceeds the 1-px tolerance on two edges
    pred3 = np.zeros((32, 32))
    pred3[11:27, 8:24] = 1
    assert eval_f(gt, pred3) < 1.0


def test_disk_matches_skimage_definition():
    # skimage.morphology.disk(2)
    expect = np.array(
        [
            [0, 0, 1, 0, 0],
            [0, 1, 1, 1, 0],
            [1, 1, 1, 1, 1],
            [0, 1, 1, 1, 0],
            [0, 0, 1, 0, 0],
        ],
        np.uint8,
    )
    np.testing.assert_array_equal(disk(2), expect)


def test_seg2bmap_single_square():
    seg = np.zeros((8, 8))
    seg[2:6, 2:6] = 1
    b = _seg2bmap(seg)
    # boundary offset 1/2 px toward the origin: a ring over rows/cols 1..5
    assert b[1, 1] and b[5, 5]
    assert not b[2, 2] and not b[3, 3]  # interior clear
    assert b.sum() == 16  # perimeter of the 5x5 ring


def test_evaluate_segmentation_returns_pair():
    a = np.zeros((16, 16), bool)
    a[4:12, 4:12] = True
    j, f = evaluate_segmentation(a, a)
    assert j == 1 and f == pytest.approx(1.0)


def _write_palette_png(path, arr):
    from PIL import Image

    img = Image.fromarray(arr.astype(np.uint8), mode="P")
    img.putpalette([0, 0, 0, 255, 0, 0, 0, 255, 0] + [0] * (768 - 9))
    img.save(path)


def test_match_ids_vs_zip_pairing_divergence(tmp_path):
    """VERDICT r3 #5 / SURVEY §7: with mismatched id sets, the reference's
    zip-of-sorted-palettes pairing (``evaluation.py:24-31``) silently scores
    unrelated objects against each other; ``match_ids=True`` pairs by palette
    value and scores unmatched ids as 0."""
    from semi_supervised_vos_tpu.eval.evaluation import process_pair

    # GT: object 1 fills the left block, object 2 the right block.
    gt = np.zeros((32, 32), np.uint8)
    gt[8:24, 2:14] = 1
    gt[8:24, 18:30] = 2
    # Prediction misses object 1 entirely but nails object 2.
    pred = np.zeros((32, 32), np.uint8)
    pred[8:24, 18:30] = 2

    gt_png, pred_png = tmp_path / "gt.png", tmp_path / "pred.png"
    _write_palette_png(gt_png, gt)
    _write_palette_png(pred_png, pred)

    # Zip mode pairs GT ids (0,1,2) with predicted ids (0,2): GT object 1 is
    # scored against predicted object 2 (disjoint regions -> J=0) and GT
    # object 2 is never scored at all.
    zipped = process_pair(gt_png, pred_png)
    # Match mode: id 0 ~exact-ish background, id 1 -> missed (0, 0),
    # id 2 -> perfect (1, 1).
    matched = process_pair(gt_png, pred_png, match_ids=True)

    j0, f0 = evaluate_segmentation(gt == 0, pred == 0)
    np.testing.assert_allclose(matched, [(j0 + 0 + 1) / 3, (f0 + 0 + 1) / 3])
    np.testing.assert_allclose(
        zipped,
        np.mean(
            [
                evaluate_segmentation(gt == 0, pred == 0),
                evaluate_segmentation(gt == 1, pred == 2),
            ],
            axis=0,
        ),
    )
    assert not np.allclose(zipped, matched)


def test_match_ids_equals_zip_when_id_sets_agree(tmp_path):
    from semi_supervised_vos_tpu.eval.evaluation import process_pair

    rng = np.random.default_rng(0)
    gt = rng.integers(0, 3, size=(24, 24)).astype(np.uint8)
    pred = rng.integers(0, 3, size=(24, 24)).astype(np.uint8)
    gt_png, pred_png = tmp_path / "gt.png", tmp_path / "pred.png"
    _write_palette_png(gt_png, gt)
    _write_palette_png(pred_png, pred)
    np.testing.assert_allclose(
        process_pair(gt_png, pred_png),
        process_pair(gt_png, pred_png, match_ids=True),
    )
