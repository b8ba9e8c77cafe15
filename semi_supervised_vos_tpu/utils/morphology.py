"""Host-side morphology: skeletonisation and distance transforms.

The reference's skeleton/distance miners use ``skimage.morphology.skeletonize``
and ``scipy.ndimage.distance_transform_{edt,cdt}``
(``src/model/triplet_miners.py:178-180,237``). skimage is unavailable here;
``skeletonize`` is implemented as Zhang-Suen thinning (the same algorithm
family — a one-pixel-wide medial-axis skeleton), and the distance transforms
come from SciPy directly.
"""

from __future__ import annotations

import functools

import numpy as np
from scipy import ndimage


def distance_transform(mask: np.ndarray, metric: str = "euclidean", return_indices: bool = False):
    """Distance to the nearest zero pixel + (optionally) its indices.

    Mirrors the reference's metric table (``triplet_miners.py:174-180``):
    ``euclidean`` → edt, others → cdt with the given metric.
    """
    if metric == "euclidean":
        return ndimage.distance_transform_edt(mask, return_indices=return_indices)
    fn = functools.partial(ndimage.distance_transform_cdt, metric=metric)
    return fn(mask, return_indices=return_indices)


_ZS_NEIGHBOURS = [
    (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)
]  # P2..P9 clockwise from north


def skeletonize(mask: np.ndarray) -> np.ndarray:
    """Zhang-Suen thinning to a one-pixel-wide skeleton (uint8 0/1).

    Drop-in replacement for ``skimage.morphology.skeletonize`` as used by
    the skeleton miners (anchor selection on thin object medial axes —
    ``triplet_miners.py:237``); the exact skeleton pixel set may differ
    from skimage's algorithm but has the same medial-axis character.
    """
    img = (np.asarray(mask) > 0).astype(np.uint8)
    if img.sum() == 0:
        return img
    img = np.pad(img, 1)

    def neighbours(a):
        return [np.roll(np.roll(a, -dy, 0), -dx, 1) for dy, dx in _ZS_NEIGHBOURS]

    changed = True
    while changed:
        changed = False
        for step in (0, 1):
            p = neighbours(img)
            b = sum(p)  # number of set neighbours
            seq = p + [p[0]]
            a = sum(
                ((seq[i] == 0) & (seq[i + 1] == 1)).astype(np.uint8)
                for i in range(8)
            )  # 0->1 transitions around the ring
            if step == 0:
                cond = (p[0] * p[2] * p[4] == 0) & (p[2] * p[4] * p[6] == 0)
            else:
                cond = (p[0] * p[2] * p[6] == 0) & (p[0] * p[4] * p[6] == 0)
            delete = (img == 1) & (b >= 2) & (b <= 6) & (a == 1) & cond
            if delete.any():
                img[delete] = 0
                changed = True
    return img[1:-1, 1:-1]
