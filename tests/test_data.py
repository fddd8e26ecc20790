"""Data layer: ERA5 npy/nc loaders, image/video datasets, prefetch,
color transforms (roundtrip properties)."""

import json

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


def test_pregenerated_memmap(tmp_path):
    from cra5_tpu.data import PreGeneratedMemmapDataset

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (5, 8, 8, 3), dtype=np.uint8)
    raw.tofile(tmp_path / "training.npy")
    ds = PreGeneratedMemmapDataset(str(tmp_path), split="train", image_size=8)
    assert len(ds) == 5
    x = ds[2]
    assert x.shape == (3, 8, 8) and x.dtype == np.float32
    np.testing.assert_allclose(
        x, raw[2].astype(np.float32).transpose(2, 0, 1) / 255.0
    )
    crop = PreGeneratedMemmapDataset(
        str(tmp_path), split="train", image_size=(8, 8),
        transform=lambda im: im[:, :4, :4],
    )
    assert crop[0].shape == (3, 4, 4)
    with pytest.raises(ValueError):
        PreGeneratedMemmapDataset(str(tmp_path), split="test")
    with pytest.raises(RuntimeError):
        PreGeneratedMemmapDataset(str(tmp_path / "nope"))
    # registry-built like any other dataset
    from cra5_tpu.registry import DATASETS

    ds2 = DATASETS.build({
        "type": "PreGeneratedMemmapDataset", "root": str(tmp_path),
        "split": "train", "image_size": 8,
    })
    assert len(ds2) == 5


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


# ---------------------------------------------------------------------------
# evaluation modes (reference cra5_base.py:541-648)
# ---------------------------------------------------------------------------

_EVAL_VNAMES = {"pressure": ["z", "t"], "single": ["t2m"]}
_EVAL_KW = dict(
    vnames=_EVAL_VNAMES,
    pressure_level=[50, 100],
    years=("1979-01-01T00:00:00", "1979-01-01T12:00:00"),
    time_interval=6,
    sequence_cfg={"input": [0], "gt": [6, 12]},
)


@pytest.fixture(scope="module")
def eval_roots(tmp_path_factory):
    """Archive + ensemble-run + aimodel + climate-mean roots with known
    contents: channel c of timestep/step k has constant value 100*k + c."""
    from cra5_tpu.data import ERA5EvalDataset, ERA5NpyDataset, timestamp_range

    base = tmp_path_factory.mktemp("era5eval")
    archive, preds, clim = base / "archive", base / "preds", base / "climate"
    names = ["z50", "z100", "t50", "t100", "t2m"]
    C, H, W = 5, 8, 16

    def field(k):
        return (100.0 * k + np.arange(C).reshape(C, 1, 1)) * np.ones(
            (C, H, W), np.float32
        )

    stamps = timestamp_range("1979-01-01T00:00:00", "1979-01-02T00:00:00", 6)
    for k, ts in enumerate(stamps):
        ERA5NpyDataset.save_timestep(str(archive), ts, field(k), names)
    # one multi-step run per init time, 6 steps
    for ts in stamps:
        ERA5EvalDataset.save_prediction_run(
            str(preds), ts, [field(1000 + s) for s in range(6)]
        )
    # aimodel forecasts: per (init, valid) pair at half resolution
    for k, ts in enumerate(stamps):
        for off in (6, 12):
            valid = stamps[min(k + off // 6, len(stamps) - 1)]
            ERA5EvalDataset.save_aimodel_forecast(
                str(preds / "ai"), ts, valid, field(2000 + off)[:, ::2, ::2]
            )
    ERA5EvalDataset.save_climate_mean(str(clim), "01-01", field(-1), names)
    ERA5EvalDataset.save_climate_mean(str(clim), "01-02", field(-2), names)
    return archive, preds, clim


@pytest.mark.parametrize("mode", ["default", "ensemble", "hres", "aimodel",
                                  "aimodel_interp"])
def test_eval_dataset_modes(eval_roots, mode):
    from cra5_tpu.data import ERA5EvalDataset

    archive, preds, clim = eval_roots
    pred_root = str(preds / "ai") if mode.startswith("aimodel") else str(preds)
    ds = ERA5EvalDataset(
        str(archive),
        test_mode=mode,
        pred_root=None if mode == "default" else pred_root,
        climate_root=str(clim),
        **_EVAL_KW,
    )
    item = ds[0]
    assert set(item) >= {"input", "gt_label", "pred_label", "in_time_stamp",
                         "gt_time_stamp", "climate_mean"}
    # two gt offsets at full resolution
    assert item["gt_label"].shape == (2, 5, 8, 16)
    assert item["climate_mean"].shape == (2, 5, 8, 16)
    assert item["gt_time_stamp"][0] == np.datetime64("1979-01-01T06:00:00")
    # gt at +6h/+12h is archive steps 1 and 2 (channel 0 -> 100*k)
    np.testing.assert_allclose(item["gt_label"][0, 0, 0, 0], 100.0)
    np.testing.assert_allclose(item["gt_label"][1, 0, 0, 0], 200.0)

    if mode == "default":
        np.testing.assert_allclose(item["pred_label"], item["gt_label"])
    elif mode == "ensemble":
        # 12-hourly slots: steps 2 and 4 of the run
        np.testing.assert_allclose(item["pred_label"][0, 0, 0, 0], 100200.0)
        np.testing.assert_allclose(item["pred_label"][1, 0, 0, 0], 100400.0)
        np.testing.assert_allclose(item["input"][0, 0, 0, 0], 100000.0)
    elif mode == "hres":
        # one step per gt offset from step 0
        np.testing.assert_allclose(item["pred_label"][0, 0, 0, 0], 100000.0)
        np.testing.assert_allclose(item["pred_label"][1, 0, 0, 0], 100100.0)
    else:
        np.testing.assert_allclose(item["pred_label"][0, 0, 0, 0], 200600.0)
        np.testing.assert_allclose(item["pred_label"][1, 0, 0, 0], 201200.0)
        if mode == "aimodel_interp":
            assert item["pred_label"].shape == (2, 5, 8, 16)  # resized to gt
        else:
            assert item["pred_label"].shape == (2, 5, 4, 8)  # native 9km-ish
        np.testing.assert_allclose(item["input"][0], item["pred_label"][0])


def test_eval_dataset_validation(eval_roots):
    from cra5_tpu.data import ERA5EvalDataset

    archive, preds, _ = eval_roots
    with pytest.raises(ValueError, match="not in"):
        ERA5EvalDataset(str(archive), test_mode="nope", **_EVAL_KW)
    with pytest.raises(ValueError, match="pred_root"):
        ERA5EvalDataset(str(archive), test_mode="ensemble", **_EVAL_KW)


def test_eval_dataset_normalizes_predictions(eval_roots):
    from cra5_tpu.data import ERA5EvalDataset

    archive, preds, _ = eval_roots
    mean = np.full(5, 50.0, np.float32)
    std = np.full(5, 10.0, np.float32)
    ds = ERA5EvalDataset(
        str(archive), test_mode="hres", pred_root=str(preds),
        mean=mean, std=std, **_EVAL_KW,
    )
    item = ds[0]
    # gt step 1 channel 0: (100 - 50) / 10; pred step 0: (100000 - 50) / 10
    np.testing.assert_allclose(item["gt_label"][0, 0, 0, 0], 5.0)
    np.testing.assert_allclose(item["pred_label"][0, 0, 0, 0], 9995.0)


def test_forecast_eval_tool(eval_roots, tmp_path, capsys):
    """forecast_eval over the hres-mode dataset: the constant mock run
    scores huge WRMSE; a perfect run (gt copied into the step layout)
    scores ~0 WRMSE and ACC ~1."""
    from cra5_tpu.data import ERA5EvalDataset
    from cra5_tpu.tools import forecast_eval

    archive, preds, clim = eval_roots
    common = [
        str(archive), "--mode", "hres", "--climate-root", str(clim),
        "--years", "1979-01-01T00:00:00", "1979-01-02T00:00:00",
        "--time-interval", "6", "--gt-offsets", "6", "12",
        "--vnames", "z,t", "--levels", "50,100", "--singles", "t2m",
    ]
    rc = forecast_eval.main(common + ["--pred-root", str(preds),
                                      "-o", str(tmp_path / "r.json")])
    assert rc == 0
    report = json.loads((tmp_path / "r.json").read_text())
    assert report["lead_hours"] == [6, 12]
    assert report["channels"] == ["z50", "z100", "t50", "t100", "t2m"]
    assert report["n_init_times"] == 3
    # mock forecasts are constant ~100k fields vs gt ~100*k: enormous error
    assert min(report["wrmse"]["6"]) > 1000
    assert set(report["acc"]) == {"6", "12"}

    # perfect forecast: hres mode reads step00/step01 for offsets 6h/12h
    perfect = tmp_path / "perfect"
    kw = dict(_EVAL_KW, years=("1979-01-01T00:00:00", "1979-01-02T00:00:00"))
    ds = ERA5EvalDataset(str(archive), test_mode="default", **kw)
    for i in range(len(ds)):
        item = ds[i]
        init = str(item["in_time_stamp"][0]).replace(" ", "T")
        ERA5EvalDataset.save_prediction_run(
            str(perfect), init, [item["gt_label"][0], item["gt_label"][1]]
        )
    capsys.readouterr()
    rc = forecast_eval.main(common + ["--pred-root", str(perfect)])
    assert rc == 0
    perfect_report = json.loads(capsys.readouterr().out)
    assert max(perfect_report["wrmse"]["6"]) < 1e-4
    assert max(perfect_report["wrmse"]["12"]) < 1e-4
    for v in perfect_report["acc"]["6"]:
        assert abs(v - 1.0) < 1e-3
