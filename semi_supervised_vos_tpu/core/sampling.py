"""Memory-bank frame sampling schedule.

Reproduces the reference schedule (``src/model/predict.py:74-89``):

* while ``frame_idx <= num_refs`` every previous frame is a reference;
* afterwards, ``num_refs - (continuous_frame - 1)`` frames are linspaced over
  the trailing ``take_range`` window ending at ``frame_idx - continuous_frame``
  and the ``continuous_frame - 1`` immediately-previous frames are appended.

TPU-native twist: under ``jit`` everything must be statically shaped, so
:func:`sample_frames` always returns ``num_refs`` indices plus a validity mask
(invalid slots are masked out of the affinity softmax downstream, which is
numerically identical to excluding them). ``frame_idx`` stays a traced scalar
so one compiled program serves every frame of a video.

The linspace truncation is computed with exact integer arithmetic
(``start + (span * i) // (n - 1)``). For non-negative spans this equals
``floor(start + span * i / (n-1))``, the value NumPy's float64 linspace +
``astype(int)`` produces for all DAVIS-relevant configurations (verified by
the parity sweep in ``tests/test_sampling.py``).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from semi_supervised_vos_tpu.config import DEFAULT


def sample_frames_host(
    frame_idx: int,
    take_range: int,
    num_refs: int,
    continuous_frame: int = DEFAULT.continuous_frame,
) -> List[int]:
    """Host/NumPy transcription of the reference schedule (golden for tests)."""
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


def sample_frames(
    frame_idx: jnp.ndarray,
    take_range: int,
    num_refs: int,
    continuous_frame: int = DEFAULT.continuous_frame,
    dense_switch_frame: int = DEFAULT.dense_switch_frame,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-shape, jit-friendly sampling.

    Args:
      frame_idx: traced int32 scalar, index of the frame being predicted (>= 1).
      take_range: static window length for the sparse samples.
      num_refs: static number of reference slots.
      continuous_frame: static dense-tail size.
      dense_switch_frame: frame index after which the sparse/dense spatial-
        weight split activates (positional, reference ``predict.py:61-66``).

    Returns:
      idx:   (num_refs,) int32 logical frame indices (invalid slots hold 0).
      valid: (num_refs,) bool — slot participates in the softmax.
      dense: (num_refs,) bool — slot uses the dense (sigma1) spatial weight.
        Matches the reference's positional rule: the last ``continuous_frame``
        *valid* slots are dense once ``frame_idx > dense_switch_frame``,
        otherwise every slot is dense.
    """
    frame_idx = jnp.asarray(frame_idx, jnp.int32)
    dense_num = continuous_frame - 1
    sparse_num = num_refs - dense_num
    slot = jnp.arange(num_refs, dtype=jnp.int32)

    # Early branch: idx = slot, valid for slot < frame_idx.
    early_idx = slot

    # Late branch: sparse linspace followed by the dense tail.
    ref_end = frame_idx - dense_num - 1
    ref_start = jnp.maximum(ref_end - take_range, 0)
    span = ref_end - ref_start
    i = slot  # for slots < sparse_num
    lin = ref_start + (span * i) // (sparse_num - 1) if sparse_num > 1 else ref_start + i * 0
    tail = frame_idx - dense_num + (slot - sparse_num)
    late_idx = jnp.where(slot < sparse_num, lin, tail)

    early = frame_idx <= num_refs
    idx = jnp.where(early, early_idx, late_idx)
    valid = jnp.where(early, slot < frame_idx, jnp.ones_like(slot, bool))
    idx = jnp.where(valid, idx, 0)

    n_valid = jnp.where(early, jnp.minimum(frame_idx, num_refs), num_refs)
    dense = jnp.where(
        frame_idx > dense_switch_frame,
        slot >= n_valid - continuous_frame,
        jnp.ones_like(slot, bool),
    )
    return idx, valid, dense


def bank_capacity(take_range: int, continuous_frame: int = DEFAULT.continuous_frame) -> int:
    """Minimum ring-buffer capacity so every sampled logical index is live.

    The oldest index sampled at frame ``t`` is
    ``max(t - continuous_frame - take_range, 0)`` (reference
    ``predict.py:83-84``), i.e. at most ``take_range + continuous_frame``
    behind ``t``; one extra slot holds the frame being written.
    """
    return take_range + continuous_frame + 1
