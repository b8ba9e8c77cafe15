"""Multi-object propagation (DAVIS-2017-style, several object ids per
video) through the strategy runner, PNG writer and per-object evaluation.

Uses a deterministic colour-pooling feature model so object separability is
guaranteed (a random backbone separates 3+ objects only by luck); what's
under test is the multi-object pipeline: d > 2 one-hot budgets, palette
round-trips, per-object J&F pairing.
"""

import numpy as np
from PIL import Image

from semi_supervised_vos_tpu.ops.onehot import davis_palette


class ColorPoolModel:
    """8x average-pool over the (normalised) image; features = colours."""

    def apply(self, variables, x, train=False):
        import jax.numpy as jnp

        b, h, w, c = x.shape
        hd, wd = -(-h // 8), -(-w // 8)
        xp = jnp.pad(x, ((0, 0), (0, hd * 8 - h), (0, wd * 8 - w), (0, 0)))
        pooled = xp.reshape(b, hd, 8, wd, 8, c).mean(axis=(2, 4))
        return pooled * 8.0  # scale sharpens the softmax


def make_multiobject_davis(root, frames=5, size=(128, 160), n_objects=3, seed=0):
    rng = np.random.default_rng(seed)
    h, w = size
    palette = davis_palette().reshape(-1).tolist()
    img_dir = root / "JPEGImages" / "480p" / "video"
    ann_dir = root / "Annotations" / "480p" / "video"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    bg = rng.integers(0, 40, size=(h, w, 3), dtype=np.uint8)
    colors = [[230, 40, 40], [40, 230, 40], [60, 60, 230], [230, 230, 40]]
    data = []
    for t in range(frames):
        img = bg.copy()
        label = np.zeros((h, w), np.uint8)
        for o in range(n_objects):
            y = 6 + o * (h // n_objects) + t
            x = 10 + o * 12 + 2 * t
            img[y : y + 32, x : x + 40] = colors[o]
            label[y : y + 32, x : x + 40] = o + 1
        Image.fromarray(img).save(img_dir / f"{t:05d}.jpg", quality=95)
        ann = Image.fromarray(label, mode="P")
        ann.putpalette(palette)
        ann.save(ann_dir / f"{t:05d}.png")
        data.append((img, label))
    return data


def test_multiobject_inference_and_eval(tmp_path):
    from semi_supervised_vos_tpu.data.davis import InferenceDataset
    from semi_supervised_vos_tpu.eval.evaluation import evaluation_command_impl
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.infer.strategies import inference_single

    root = tmp_path / "davis"
    root.mkdir()
    make_multiobject_davis(root, n_objects=3)

    dataset = InferenceDataset(str(root / "JPEGImages/480p"))
    save = tmp_path / "out"
    cfg = EngineConfig(feature_dim=3, compute_dtype=np.float32)
    inference_single(
        dataset, root / "Annotations/480p", save, ColorPoolModel(), None, cfg
    )

    preds = sorted((save / "video").glob("*.png"))
    assert len(preds) == 5
    last = np.asarray(Image.open(preds[-1]))
    assert set(np.unique(last)) >= {0, 1, 2, 3}, np.unique(last)

    j, f, jf = evaluation_command_impl(
        root / "Annotations" / "480p", save, disable=True, processes=1
    )
    assert j > 0.7, j


def test_more_objects_than_default_budget(tmp_path):
    """A video with 25 object ids (> the 22-colour table) grows the padded
    class budget instead of silently dropping labels."""
    from semi_supervised_vos_tpu.data.davis import InferenceDataset
    from semi_supervised_vos_tpu.infer.engine import EngineConfig
    from semi_supervised_vos_tpu.infer.strategies import inference_single

    root = tmp_path / "davis"
    root.mkdir()
    h, w, n = 128, 160, 25
    rng = np.random.default_rng(0)
    palette = davis_palette().reshape(-1).tolist()
    img_dir = root / "JPEGImages" / "480p" / "v"
    ann_dir = root / "Annotations" / "480p" / "v"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    colors = rng.integers(40, 255, size=(n, 3))
    for t in range(3):
        img = rng.integers(0, 30, size=(h, w, 3), dtype=np.uint8)
        label = np.zeros((h, w), np.uint8)
        for o in range(n):
            y, x = 8 * (o // 5) + 40 + t, 16 * (o % 5) + 40 + t
            img[y : y + 7, x : x + 13] = colors[o]
            label[y : y + 7, x : x + 13] = o + 1
        Image.fromarray(img).save(img_dir / f"{t:05d}.jpg", quality=98)
        ann = Image.fromarray(label, mode="P")
        ann.putpalette(palette)
        ann.save(ann_dir / f"{t:05d}.png")

    dataset = InferenceDataset(str(root / "JPEGImages/480p"))
    save = tmp_path / "out"
    from tests.test_multiobject import ColorPoolModel

    inference_single(
        dataset, root / "Annotations/480p", save, ColorPoolModel(), None,
        EngineConfig(feature_dim=3, compute_dtype=np.float32),
    )
    preds = sorted((save / "v").glob("*.png"))
    assert len(preds) == 3
    seen = set()
    for p in preds[1:]:
        seen |= set(np.unique(np.asarray(Image.open(p))).tolist())
    # class ids >= 22 can only appear if the padded budget grew beyond the
    # default 22 classes (ids 0..21)
    assert max(seen) >= 22, sorted(seen)


def test_more_objects_than_default_budget_batched(tmp_path):
    """The lockstep-batched runner must grow the padded class budget exactly
    like the single runner (regression: it used to build its engines with
    the default 22-class cfg, one-hotting ids >= 22 to all-zero rows)."""
    from semi_supervised_vos_tpu.data.davis import InferenceDataset
    from semi_supervised_vos_tpu.infer.batched import inference_batched
    from semi_supervised_vos_tpu.infer.engine import EngineConfig

    root = tmp_path / "davis"
    root.mkdir()
    h, w, n = 128, 160, 25
    rng = np.random.default_rng(0)
    palette = davis_palette().reshape(-1).tolist()
    img_dir = root / "JPEGImages" / "480p" / "v"
    ann_dir = root / "Annotations" / "480p" / "v"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    colors = rng.integers(40, 255, size=(n, 3))
    for t in range(3):
        img = rng.integers(0, 30, size=(h, w, 3), dtype=np.uint8)
        label = np.zeros((h, w), np.uint8)
        for o in range(n):
            y, x = 8 * (o // 5) + 40 + t, 16 * (o % 5) + 40 + t
            img[y : y + 7, x : x + 13] = colors[o]
            label[y : y + 7, x : x + 13] = o + 1
        Image.fromarray(img).save(img_dir / f"{t:05d}.jpg", quality=98)
        ann = Image.fromarray(label, mode="P")
        ann.putpalette(palette)
        ann.save(ann_dir / f"{t:05d}.png")

    dataset = InferenceDataset(str(root / "JPEGImages/480p"))
    save = tmp_path / "out"
    inference_batched(
        dataset, root / "Annotations/480p", save, ColorPoolModel(), None,
        EngineConfig(feature_dim=3, compute_dtype=np.float32),
        video_batch=2, strategy="single",
    )
    preds = sorted((save / "v").glob("*.png"))
    assert len(preds) == 3
    seen = set()
    for p in preds[1:]:
        seen |= set(np.unique(np.asarray(Image.open(p))).tolist())
    assert max(seen) >= 22, sorted(seen)
