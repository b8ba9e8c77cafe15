"""Evaluation command: pair GT and predicted PNGs, compute mean J & F.

Reference ``src/evaluation.py``: recursive sorted globs of both trees,
per-frame per-object-id J&F (object ids paired by zipping the sorted unique
palette values of each image — ``evaluation.py:24-31``), means over objects
then frames, parallelised over a process pool.
"""

from __future__ import annotations

from multiprocessing import Pool
from pathlib import Path
from typing import Tuple

import numpy as np
from PIL import Image

from semi_supervised_vos_tpu.config import DEFAULT
from semi_supervised_vos_tpu.eval.metrics import evaluate_segmentation
from semi_supervised_vos_tpu.utils.logging import logger


def process_pair(gt, seg) -> np.ndarray:
    """Per-frame mean (J, F) over paired object ids
    (reference ``evaluation.py:16-36``)."""
    gt_img = Image.open(gt).convert("P")
    seg_img = Image.open(seg).convert("P")
    seg_img = seg_img.resize(gt_img.size)

    gt_arr = np.asarray(gt_img)
    seg_arr = np.asarray(seg_img)

    gt_palette = np.unique(gt_arr)
    seg_palette = np.unique(seg_arr)

    scores = []
    for gt_color, seg_color in zip(gt_palette, seg_palette):
        score = evaluate_segmentation(gt_arr == gt_color, seg_arr == seg_color)
        scores.append(score)
    return np.array(scores).mean(axis=0)


def evaluation_command_impl(
    ground_truth, computed_results, disable: bool = False, processes: int = None
) -> Tuple[float, float, float]:
    """Reference ``evaluation.py:48-75``; returns (j_mean, f_mean, j&f_mean)."""
    ground_truth = sorted(Path(ground_truth).glob("**/*.png"))
    computed = sorted(Path(computed_results).glob("**/*.png"))
    total = len(ground_truth)
    assert len(ground_truth) == len(computed), (
        f"count mismatch: {len(ground_truth)} GT vs {len(computed)} predictions"
    )
    logger.info(f"Starting evaluation on {total} pairs.")

    processes = processes or DEFAULT.cpu_count
    if processes > 1:
        with Pool(processes) as pool:
            scores = pool.starmap(process_pair, zip(ground_truth, computed))
    else:
        scores = [process_pair(g, s) for g, s in zip(ground_truth, computed)]

    scores = np.array(scores)
    j_mean = scores[:, 0].mean()
    f_mean = scores[:, 1].mean()
    jf_mean = np.array([j_mean, f_mean]).mean()
    logger.info(f"Evaluated: j_mean={j_mean}, f_mean={f_mean}, j&f_mean={jf_mean}.")
    return j_mean, f_mean, jf_mean
