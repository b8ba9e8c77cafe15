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


def process_pair(gt, seg, match_ids: bool = False) -> np.ndarray:
    """Per-frame mean (J, F) over paired object ids
    (reference ``evaluation.py:16-36``).

    Two pairing modes:

    - ``match_ids=False`` (default, reference-compatible): zip the two
      independently sorted unique palette lists — faithful to
      ``evaluation.py:24-31``, but when the GT and prediction carry
      different id sets it silently scores unrelated objects against each
      other (e.g. GT ids {0,1,2} vs predicted {0,2} pairs GT object 1 with
      predicted object 2).
    - ``match_ids=True`` (SURVEY §7's directive): pair objects by identical
      palette value over the union of both id sets. An id present on only
      one side scores against an empty mask — J=0 and F=0 for a missed or
      hallucinated object — so mismatched id sets are penalised instead of
      misattributed. When both images carry the same ids, the two modes are
      identical.
    """
    gt_img = Image.open(gt).convert("P")
    seg_img = Image.open(seg).convert("P")
    seg_img = seg_img.resize(gt_img.size)

    gt_arr = np.asarray(gt_img)
    seg_arr = np.asarray(seg_img)

    gt_palette = np.unique(gt_arr)
    seg_palette = np.unique(seg_arr)

    if match_ids:
        pairs = [(c, c) for c in np.union1d(gt_palette, seg_palette)]
    else:
        pairs = list(zip(gt_palette, seg_palette))

    scores = []
    for gt_color, seg_color in pairs:
        score = evaluate_segmentation(gt_arr == gt_color, seg_arr == seg_color)
        scores.append(score)
    return np.array(scores).mean(axis=0)


def evaluation_command_impl(
    ground_truth,
    computed_results,
    disable: bool = False,
    processes: int = None,
    match_ids: bool = False,
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
            scores = pool.starmap(
                process_pair,
                ((g, s, match_ids) for g, s in zip(ground_truth, computed)),
            )
    else:
        scores = [
            process_pair(g, s, match_ids) for g, s in zip(ground_truth, computed)
        ]

    scores = np.array(scores)
    j_mean = scores[:, 0].mean()
    f_mean = scores[:, 1].mean()
    jf_mean = np.array([j_mean, f_mean]).mean()
    logger.info(f"Evaluated: j_mean={j_mean}, f_mean={f_mean}, j&f_mean={jf_mean}.")
    return j_mean, f_mean, jf_mean
