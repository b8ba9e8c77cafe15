"""Ring-buffer wraparound vs the reference's unbounded history.

The bank holds ``frame_range + continuous_frame + 1`` slots (default 45);
with a 56-frame video the ring wraps while the reference keeps every frame
in memory. Outputs must still match — the sampling schedule never reaches
evicted frames (``core.sampling.bank_capacity``)."""

import numpy as np
from PIL import Image

from tests import reference_shims
from tests.helpers import make_davis_dataset, make_reference_checkpoint
from tests.test_reference_parity import run_ours, run_reference


def test_ring_wrap_matches_reference(tmp_path):
    frames = 56  # > bank capacity (45)
    davis = tmp_path / "davis"
    make_davis_dataset(davis, videos=("a",), frames=frames, size=(64, 80))
    ckpt = tmp_path / "ckpt.pth.tar"
    make_reference_checkpoint(ckpt, "resnet18")

    ref_out = tmp_path / "ref"
    our_out = tmp_path / "ours"
    run_reference(davis, ckpt, ref_out)
    run_ours(davis, ckpt, our_out)

    total = agree = 0
    ref_files = sorted((ref_out / "a").glob("*.png"))
    our_files = sorted((our_out / "a").glob("*.png"))
    assert len(ref_files) == len(our_files) == frames
    for rf, of in zip(ref_files, our_files):
        r = np.asarray(Image.open(rf))
        o = np.asarray(Image.open(of))
        agree += (r == o).sum()
        total += r.size
    assert agree / total > 0.995, f"pixel agreement {agree / total:.4f}"
