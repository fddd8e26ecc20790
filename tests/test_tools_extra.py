"""Video eval, ERA5 JPEG2000 baseline, recompression fan-out, profiling."""

import json
import os

import jax
import numpy as np
import pytest


def test_era5_jpeg2000_tool(tmp_path, capsys):
    from cra5_tpu.tools import era5_jpeg2000

    # smooth fields so the J2K rate control has room (random noise pins it)
    rng = np.random.default_rng(0)
    xx, yy = np.meshgrid(np.linspace(0, 4, 128), np.linspace(0, 4, 128))
    data = np.stack(
        [np.sin(xx * (c + 1)) * np.cos(yy) + 0.05 * rng.normal(size=xx.shape) for c in range(3)]
    ).astype(np.float32)
    path = tmp_path / "ts.npy"
    np.save(path, data)
    rc = era5_jpeg2000.main([str(path), "-q", "5", "80"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    mses = out["results"]["mse"]
    bpsps = out["results"]["bpsp"]
    assert len(mses) == 2
    # higher compression ratio (rate param) -> fewer bits, more error
    assert bpsps[1] < bpsps[0]
    assert mses[1] >= mses[0]


def test_era5_jpeg2000_roundtrip_monotone():
    from cra5_tpu.tools.era5_jpeg2000 import compress_channel, decompress_channel

    rng = np.random.default_rng(1)
    chan = rng.normal(size=(64, 64)).astype(np.float32)
    stream, shift, scale = compress_channel(chan, 5.0)
    rec = decompress_channel(stream, shift, scale)
    assert rec.shape == chan.shape
    assert float(np.mean((rec - chan) ** 2)) < float(np.var(chan))


@pytest.mark.slow
def test_video_eval_tool(tmp_path, capsys):
    from PIL import Image

    from cra5_tpu.tools import video_eval

    rng = np.random.default_rng(0)
    d = tmp_path / "train" / "clip0"
    d.mkdir(parents=True)
    for f in range(3):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            d / f"f{f}.png"
        )
    rc = video_eval.main(
        [str(tmp_path), "--frames", "3", "--planes", "8", "--mid-planes", "8",
         "--num-levels", "2"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["results"]["bpp"][0] > 0


@pytest.mark.slow
def test_recompress_fanout(tmp_path, capsys):
    from cra5_tpu.api.bitstream import load_bin
    from cra5_tpu.tools import recompress

    rng = np.random.default_rng(0)
    indir = tmp_path / "in"
    indir.mkdir()
    for i in range(3):  # 3 inputs over 8 devices exercises padding
        np.save(indir / f"ts{i}.npy", rng.normal(size=(8, 41, 40)).astype(np.float32))
    outdir = tmp_path / "out"
    rc = recompress.main([str(indir), "-o", str(outdir), "--config", "tiny"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["recompressed"] == 3
    bins = sorted(outdir.glob("*.bin"))
    assert len(bins) == 3
    strings, z_shape = load_bin(str(bins[0]))
    assert len(strings) == 2 and len(strings[0][0]) > 0


def test_timings_and_profiler_noop():
    import jax.numpy as jnp

    from cra5_tpu.utils.profiling import Timings, annotate, profile_trace

    t = Timings()
    with t.span("phase"):
        x = jnp.ones(8) * 2
    with t.span("phase2", block_on=x):
        pass
    d = t.as_dict()
    assert set(d) == {"phase", "phase2"} and all(v >= 0 for v in d.values())

    with profile_trace(None):
        pass
    with annotate("region"):
        pass


def test_era5_eval_tool(tmp_path, capsys):
    from cra5_tpu.tools import era5_eval

    rng = np.random.default_rng(0)
    target = rng.normal(size=(3, 32, 64)).astype(np.float32)
    recon = target + 0.1 * rng.normal(size=target.shape).astype(np.float32)
    np.save(tmp_path / "r.npy", recon)
    np.save(tmp_path / "t.npy", target)
    rc = era5_eval.main([str(tmp_path / "r.npy"), str(tmp_path / "t.npy")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert 0.05 < out["mean_wrmse"] < 0.2
    assert set(out["wrmse"]) == {"ch0", "ch1", "ch2"}
    # perfect reconstruction scores ~0
    from cra5_tpu.tools.era5_eval import evaluate_fields

    perfect = evaluate_fields(target, target)
    assert perfect["mean_wrmse"] < 1e-6


@pytest.mark.slow
def test_serve_tool(tmp_path, capsys):
    """compress with recompress, then serve decodes the bins back."""
    from cra5_tpu.tools import recompress, serve

    rng = np.random.default_rng(0)
    indir = tmp_path / "in"
    indir.mkdir()
    for i in range(2):
        np.save(indir / f"ts{i}.npy", rng.normal(size=(8, 41, 40)).astype(np.float32))
    bindir = tmp_path / "bins"
    rc = recompress.main([str(indir), "-o", str(bindir), "--config", "tiny"])
    assert rc == 0
    capsys.readouterr()

    outdir = tmp_path / "recon"
    rc = serve.main([str(bindir), "-o", str(outdir), "--config", "tiny"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["decoded"] == 2
    recon = np.load(outdir / "ts0.npy")
    assert recon.shape == (8, 41, 40)


def test_video_bench_tool(tmp_path, capsys):
    from PIL import Image

    from cra5_tpu.tools import video_bench

    rng = np.random.default_rng(0)
    d = tmp_path / "train" / "c0"
    d.mkdir(parents=True)
    for f in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(d / f"{f}.png")
    rc = video_bench.main(["jpeg", str(tmp_path), "-q", "30", "70"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["results"]["bpp"]) == 2

    rc = video_bench.main(["x265", str(tmp_path)])
    assert rc == 2


def test_acc_metric():
    import jax.numpy as jnp

    from cra5_tpu.metrics import acc

    rng = np.random.default_rng(0)
    clim = jnp.asarray(rng.normal(size=(1, 2, 16, 32)).astype(np.float32))
    anom = jnp.asarray(rng.normal(size=(1, 2, 16, 32)).astype(np.float32))
    target = clim + anom
    # perfect forecast -> ACC 1; climatology forecast -> ACC ~0
    perfect = np.asarray(acc(target, target, clim))
    np.testing.assert_allclose(perfect, 1.0, atol=1e-5)
    clim_fc = np.asarray(acc(clim, target, clim))
    assert np.all(np.abs(clim_fc) < 0.2)
    # anti-correlated forecast -> ACC -1
    anti = np.asarray(acc(clim - anom, target, clim))
    np.testing.assert_allclose(anti, -1.0, atol=1e-5)


def test_bench_watchdog_detects_wedge(tmp_path):
    """bench.py's attach watchdog kills a child that never heartbeats and
    reports a clean error JSON after the configured retries (the tunneled
    TPU backend intermittently hangs forever inside device attach)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        BENCH_WEDGE_SIM="1",
        BENCH_ATTACH_TIMEOUT="2",
        BENCH_ATTACH_TRIES="2",
        BENCH_ATTACH_COOLDOWN="1",
    )
    env.pop("BENCH_NO_WATCHDOG", None)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=120,
        cwd=repo,
    )
    assert r.returncode == 1
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "wedged" in out["error"]
    assert r.stderr.count("attach wedge") == 2


def test_vivt69_device_sampler_matches_host_statistics():
    """The jitted on-device spectral sampler (vivt69 --ntrain 0) must
    reproduce correlated_fields' statistics: unit channel variance and a
    cross-channel correlation matrix ~ mix @ mix.T (rank-r drivers
    dominate; the eps residual only shrinks it by ~1/(1+eps^2))."""
    from cra5_tpu.tools.vivt69_experiment import (
        correlated_fields, make_device_sampler)

    c, rank, h, w, eps = 6, 3, 32, 48, 0.2
    rng = np.random.default_rng(3)
    mix = rng.normal(size=(c, rank)).astype(np.float32)
    mix /= np.linalg.norm(mix, axis=1, keepdims=True) + 1e-12

    sampler = make_device_sampler(mix, h, w, eps, 3.0, batch=8)
    xs = np.concatenate(
        [np.asarray(sampler(jax.random.PRNGKey(k))) for k in range(8)]
    )  # (64, c, h, w)
    host = correlated_fields(rng, 64, c, h, w, rank=rank, eps=eps, mix=mix)

    # unit variance per channel (both paths standardize per field)
    np.testing.assert_allclose(xs.std(axis=(-2, -1)), 1.0, atol=1e-3)

    def corr(a):
        flat = a.transpose(1, 0, 2, 3).reshape(a.shape[1], -1)
        return np.corrcoef(flat)

    expect = mix @ mix.T  # driver-induced correlation, unit diagonal
    np.testing.assert_allclose(corr(xs), corr(host), atol=0.08)
    np.testing.assert_allclose(
        corr(xs), expect / (1.0 + eps**2), atol=0.08)


@pytest.mark.slow
def test_finalize_scaling_record_replay(tmp_path, capsys):
    """finalize_scaling record -> replay: the replayed host assembly must
    reproduce the recorded container bytes (the replay asserts byte
    equality internally) and report a thread-scaling sweep."""
    from cra5_tpu.tools import finalize_scaling

    npz = str(tmp_path / "fin.npz")
    assert finalize_scaling.main(
        ["record", "-o", npz, "--model", "tiny", "--no-calibrate"]
    ) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["recorded_streams"] == 2  # z + y
    assert finalize_scaling.main(
        ["replay", npz, "--workers", "1,2", "--seconds", "0.2",
         "--parse", "--required-rps", "25"]
    ) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rep["encode_finalize"]) == {"1", "2"}
    assert rep["decode_parse"]["1"] > 0
    assert rep["encode_headroom_x"] > 0


@pytest.mark.slow
def test_decode_profile_tiny(tmp_path, capsys):
    """decode_profile --model tiny: the full profiler path (sequential,
    depth sweep, cumulative phase chain with RTT-cancelling differencing)
    runs on CPU and the phase budget sums to the cumulative total."""
    from cra5_tpu.tools import decode_profile

    out = str(tmp_path / "prof.json")
    assert decode_profile.main(
        ["--model", "tiny", "--depths", "1,2", "--batches", "1",
         "--iters", "2", "--per-window", "4", "--phase-iters", "2",
         "-o", out]
    ) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["seq_b1"]["decodes_per_sec"] > 0
    assert set(res["pipelined_b1"]) == {"1", "2"}
    cum = res["phase_chain_cumulative_s"]
    assert len(cum) == 4 and cum[3] >= cum[0] > 0
    budget = res["phase_budget_s"]
    assert abs(sum(budget.values()) - cum[3]) < 1e-6
    with open(out) as f:
        assert json.load(f)["model"] == "tiny"
