"""Data-layer tests: ImageFolder-ordering semantics, clip sampling, prefetch."""

import numpy as np
from PIL import Image

from tests.helpers import make_davis_dataset

from semi_supervised_vos_tpu.data.davis import (
    InferenceDataset,
    TrainDataset,
    TripletLossTrainDataset,
    list_image_folder,
)
from semi_supervised_vos_tpu.data.loader import prefetch_dataset


def test_list_image_folder_sorted(tmp_path):
    for cls in ("zebra", "apple", "mango"):
        d = tmp_path / cls
        d.mkdir()
        for n in ("2.jpg", "10.jpg", "1.jpg"):
            Image.new("RGB", (4, 4)).save(d / n)
    samples, class_to_idx = list_image_folder(tmp_path)
    assert list(class_to_idx) == ["apple", "mango", "zebra"]
    # files sorted lexicographically within each class (ImageFolder semantics)
    names = [s[0].split("/")[-1] for s in samples[:3]]
    assert names == ["1.jpg", "10.jpg", "2.jpg"]


def test_train_dataset_clip_stays_in_video(tmp_path):
    make_davis_dataset(tmp_path, videos=("a", "b"), frames=6, size=(64, 64))
    ds = TrainDataset(
        tmp_path / "JPEGImages/480p", tmp_path / "Annotations/480p",
        cropping=48, frame_num=4,
    )
    # an index whose clip would straddle the video boundary walks back
    imgs, anns, vid = ds[4]  # frames 4..7 cross from video a (6 frames) into b
    assert imgs.shape == (4, 48, 48, 3)
    assert vid == 0  # clip stayed in video a


def test_train_dataset_seed_reproducible(tmp_path):
    make_davis_dataset(tmp_path, videos=("a",), frames=6, size=(64, 64))
    ds = TrainDataset(
        tmp_path / "JPEGImages/480p", tmp_path / "Annotations/480p",
        cropping=32, frame_num=3,
    )
    ds.seed(7)
    a = ds[0][0]
    ds.seed(7)
    b = ds[0][0]
    np.testing.assert_array_equal(a, b)


def test_inference_dataset_strategy_items(tmp_path):
    make_davis_dataset(tmp_path, videos=("a",), frames=3, size=(32, 40))
    root = str(tmp_path / "JPEGImages/480p")
    single = InferenceDataset(root)[0]
    assert single[0].shape == (32, 40, 3) and single[1] == "a"

    flip = InferenceDataset(root, inference_strategy="hor-flip")[0]
    np.testing.assert_array_equal(flip[0][1], flip[0][0][:, ::-1])

    two = InferenceDataset(root, inference_strategy="2-scale", scale=1.15)[0]
    assert two[0][1].shape == (int(np.ceil(32 * 1.15)), int(np.ceil(40 * 1.15)), 3)


def test_triplet_dataset_groups_by_video(tmp_path):
    make_davis_dataset(tmp_path, videos=("a", "b"), frames=4, size=(32, 32))
    ds = TripletLossTrainDataset(
        tmp_path / "JPEGImages/480p", tmp_path / "Annotations/480p"
    )
    assert len(ds) == 2
    seq = ds[0]
    assert len(seq) == 4
    assert seq[0][0].shape == (32, 32, 3)


def test_prefetch_order_preserved(tmp_path):
    make_davis_dataset(tmp_path, videos=("a",), frames=5, size=(32, 32))
    ds = InferenceDataset(str(tmp_path / "JPEGImages/480p"))
    direct = [np.asarray(ds[i][0]) for i in range(len(ds))]
    fetched = [np.asarray(item[0]) for item in prefetch_dataset(ds)]
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)


def test_train_dataset_fast_path_matches_pil(tmp_path):
    """The numpy fast path (decode -> flip views -> crop copy) is
    bit-identical to the reference-shaped PIL path for the same RNG stream
    (flip-then-crop commutes with crop-of-flipped-view)."""
    make_davis_dataset(tmp_path, videos=("a",), frames=8, size=(72, 96))
    ds = TrainDataset(
        tmp_path / "JPEGImages/480p", tmp_path / "Annotations/480p",
        cropping=48, frame_num=3,
    )
    for idx in range(4):
        ds.seed(100 + idx)
        fast = ds[idx]
        ds.seed(100 + idx)
        h = bool(ds.rng.random() < 0.5)
        v = bool(ds.rng.random() < 0.5)
        pil = ds._getitem_pil(idx, lambda img: img, h, v)
        np.testing.assert_array_equal(fast[0], pil[0])
        np.testing.assert_array_equal(fast[1], pil[1])
        assert fast[2] == pil[2]


def test_train_dataset_decode_cache_bit_identical(tmp_path):
    """decode_cache=True returns bit-identical items to the uncached path for
    the same RNG stream — on the fast path AND the jitter (PIL) path — and
    the second epoch is served from the populated cache."""
    make_davis_dataset(tmp_path, videos=("a", "b"), frames=6, size=(72, 96))
    roots = (tmp_path / "JPEGImages/480p", tmp_path / "Annotations/480p")
    for jitter in (False, True):
        plain = TrainDataset(*roots, cropping=48, frame_num=3, color_jitter=jitter)
        cached = TrainDataset(
            *roots, cropping=48, frame_num=3, color_jitter=jitter,
            decode_cache=True,
        )
        assert cached._img_cache is not None and plain._img_cache is None
        for epoch in range(2):  # epoch 0 populates, epoch 1 reads the cache
            plain.seed(40 + epoch)
            cached.seed(40 + epoch)
            for idx in range(4):
                a = plain[idx]
                b = cached[idx]
                np.testing.assert_array_equal(a[0], b[0])
                np.testing.assert_array_equal(a[1], b[1])
                assert a[2] == b[2]
        assert any(x is not None for x in cached._img_cache)
        assert any(x is not None for x in cached._ann_cache)


def test_train_dataset_decode_cache_env_default(tmp_path, monkeypatch):
    make_davis_dataset(tmp_path, videos=("a",), frames=3, size=(32, 32))
    roots = (tmp_path / "JPEGImages/480p", tmp_path / "Annotations/480p")
    monkeypatch.setenv("SVOS_DECODE_CACHE", "1")
    ds = TrainDataset(*roots, cropping=16, frame_num=2)
    assert ds.decode_cache and ds._img_cache is not None
    monkeypatch.delenv("SVOS_DECODE_CACHE")
    ds = TrainDataset(*roots, cropping=16, frame_num=2)
    assert not ds.decode_cache and ds._img_cache is None
