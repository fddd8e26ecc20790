"""Data layer: ERA5 npy/nc loaders, image/video datasets, prefetch,
color transforms (roundtrip properties)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def npy_root(tmp_path_factory):
    from cra5_tpu.data import ERA5NpyDataset, timestamp_range

    root = tmp_path_factory.mktemp("era5npy")
    names = ["z50", "z100", "t50", "t100", "t2m"]
    rng = np.random.default_rng(0)
    for ts in timestamp_range("1979-01-01T00:00:00", "1979-01-02T00:00:00", 6):
        ERA5NpyDataset.save_timestep(
            str(root), ts, rng.normal(size=(5, 8, 16)).astype(np.float32), names
        )
    return root


def test_timestamp_range():
    from cra5_tpu.data import timestamp_range

    ts = timestamp_range("1979-01-01T00:00:00", "1979-01-01T18:00:00", 6)
    assert len(ts) == 4
    assert ts[1] == "1979-01-01T06:00:00"


def test_era5_npy_dataset(npy_root):
    from cra5_tpu.data import ERA5NpyDataset

    ds = ERA5NpyDataset(
        str(npy_root),
        vnames={"pressure": ["z", "t"], "single": ["t2m"]},
        pressure_level=[50, 100],
        years=("1979-01-01T00:00:00", "1979-01-01T18:00:00"),
        time_interval=6,
        sequence_cfg={"input": [0], "gt": [6]},
    )
    assert ds.num_channels == 5
    assert ds.channel_names() == ["z50", "z100", "t50", "t100", "t2m"]
    item = ds[0]
    assert item["inputs"].shape == (1, 5, 8, 16)
    assert item["gt"].shape == (1, 5, 8, 16)
    # gt at +6h equals the next sample's input
    nxt = ds[1]
    np.testing.assert_array_equal(item["gt"][0], nxt["inputs"][0])


def test_era5_npy_normalization(npy_root):
    from cra5_tpu.data import ERA5NpyDataset

    mean = np.full(5, 2.0, np.float32)
    std = np.full(5, 4.0, np.float32)
    kw = dict(
        vnames={"pressure": ["z", "t"], "single": ["t2m"]},
        pressure_level=[50, 100],
        years=("1979-01-01T00:00:00", "1979-01-01T12:00:00"),
    )
    raw = ERA5NpyDataset(str(npy_root), **kw)[0]["inputs"]
    norm = ERA5NpyDataset(str(npy_root), mean=mean, std=std, **kw)[0]["inputs"]
    np.testing.assert_allclose(norm, (raw - 2.0) / 4.0, rtol=1e-6)


def test_batch_iterator_and_prefetch(npy_root):
    from cra5_tpu.data import ERA5NpyDataset, PrefetchLoader, batch_iterator

    ds = ERA5NpyDataset(
        str(npy_root),
        vnames={"pressure": ["z", "t"], "single": ["t2m"]},
        pressure_level=[50, 100],
        years=("1979-01-01T00:00:00", "1979-01-02T00:00:00"),
    )
    batches = list(batch_iterator(ds, 2, shuffle=True, seed=1))
    assert all(b.shape == (2, 5, 8, 16) for b in batches)
    n_direct = len(batches)

    loader = PrefetchLoader(batch_iterator(ds, 2, shuffle=True, seed=1), depth=2)
    fetched = list(loader)
    assert len(fetched) == n_direct
    for a, b in zip(batches, fetched):
        np.testing.assert_array_equal(a, b)


def test_prefetch_propagates_errors():
    from cra5_tpu.data import PrefetchLoader

    def gen():
        yield np.zeros(1)
        raise RuntimeError("boom")

    loader = PrefetchLoader(gen(), depth=1)
    it = iter(loader)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_image_folder(tmp_path):
    from PIL import Image

    from cra5_tpu.data import ImageFolder
    from cra5_tpu.data.image import center_crop, random_crop

    (tmp_path / "train").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)).save(
            tmp_path / "train" / f"{i}.png"
        )
    ds = ImageFolder(str(tmp_path), split="train")
    assert len(ds) == 3
    img = ds[0]
    assert img.shape == (3, 40, 48) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert center_crop(img, 32).shape == (3, 32, 32)
    assert random_crop(img, 32).shape == (3, 32, 32)
    with pytest.raises(RuntimeError):
        ImageFolder(str(tmp_path), split="nope")


def test_video_folder(tmp_path):
    from PIL import Image

    from cra5_tpu.data import VideoFolder

    rng = np.random.default_rng(0)
    for vid in range(2):
        d = tmp_path / "train" / f"v{vid}"
        d.mkdir(parents=True)
        for f in range(4):
            Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
                d / f"f{f:02d}.png"
            )
    ds = VideoFolder(str(tmp_path), split="train", max_frames=3)
    assert len(ds) == 2
    assert ds[0].shape == (3, 3, 16, 16)


def test_vimeo90k(tmp_path):
    from PIL import Image

    from cra5_tpu.data import Vimeo90kDataset

    seq = tmp_path / "sequences" / "00001" / "0001"
    seq.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(1, 4):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            seq / f"im{i}.png"
        )
    (tmp_path / "tri_trainlist.txt").write_text("00001/0001\n")
    ds = Vimeo90kDataset(str(tmp_path), split="train", tuplet=3)
    assert len(ds) == 3
    assert ds[0].shape == (3, 16, 16)


def test_color_transforms_roundtrip():
    import jax.numpy as jnp

    from cra5_tpu.data import rgb2ycbcr, ycbcr2rgb, yuv_420_to_444, yuv_444_to_420

    rgb = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 3, 16, 16)).astype(np.float32)
    )
    ycc = rgb2ycbcr(rgb)
    back = ycbcr2rgb(ycc)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    y, u, v = yuv_444_to_420(ycc)
    assert y.shape == (2, 1, 16, 16) and u.shape == (2, 1, 8, 8)
    full = yuv_420_to_444((y, u, v))
    assert full.shape == (2, 3, 16, 16)


def test_raw_video_sequence(tmp_path):
    from cra5_tpu.data import RawVideoSequence, yuv_420_to_444

    w, h = 16, 8
    rng = np.random.default_rng(0)
    frames = []
    raw = bytearray()
    for _ in range(3):
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        frames.append((y, u, v))
        raw += y.tobytes() + u.tobytes() + v.tobytes()
    path = tmp_path / f"clip_{w}x{h}_30.yuv"
    path.write_bytes(bytes(raw))

    seq = RawVideoSequence(str(path))
    assert len(seq) == 3
    f0 = seq[1]
    np.testing.assert_allclose(f0["y"][0], frames[1][0] / 255.0, atol=1e-6)
    assert f0["u"].shape == (1, 4, 8)
    # feeds the 420->444 transform
    import jax.numpy as jnp

    full = yuv_420_to_444(
        (jnp.asarray(f0["y"][None]), jnp.asarray(f0["u"][None]), jnp.asarray(f0["v"][None]))
    )
    assert full.shape == (1, 3, 8, 16)
    with pytest.raises(IndexError):
        seq[3]
