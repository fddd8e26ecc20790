"""External-codec wrappers (mocked binaries), find_close bisection, and
the mocked-cdsapi downloader retry loop (VERDICT round-1 items 5 and 9)."""

import json
import os
import stat
import sys
import types

import numpy as np
import pytest


def _write_mock(path, body: str) -> str:
    """An executable python script; body sees sys.argv."""
    path.write_text("#!/usr/bin/env python3\nimport sys, shutil, os, glob\n" + body)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


def _flag_value(flag):
    return f"args = sys.argv[1:]\nval = args[args.index('{flag}') + 1]\n"


@pytest.fixture
def gradient_image(tmp_path):
    from PIL import Image

    x = np.linspace(0, 255, 48, dtype=np.uint8)
    arr = np.stack(np.broadcast_arrays(x[None, :], x[:, None], x[None, :]), -1)
    p = tmp_path / "img.png"
    Image.fromarray(np.ascontiguousarray(arr)).save(p)
    return p


# ---------------------------------------------------------------------------
# image codecs
# ---------------------------------------------------------------------------


def test_bpg_identity_mock(tmp_path, gradient_image, capsys):
    """bpgenc/bpgdec mocks that copy bytes through -> lossless roundtrip."""
    from cra5_tpu.tools import bench

    enc = _write_mock(
        tmp_path / "bpgenc",
        _flag_value("-o") + "shutil.copy(args[-1], val)\n",
    )
    dec = _write_mock(
        tmp_path / "bpgdec",
        _flag_value("-o") + "shutil.copy(args[-1], val)\n",
    )
    rc = bench.main(
        ["bpg", str(gradient_image.parent), "-q", "30",
         "--encoder-path", enc, "--decoder-path", dec]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    res = out["results"]
    assert res["bpp"][0] > 0
    assert res["psnr-rgb"][0] > 60  # identity mock -> (near-)lossless
    assert res["encoding_time"][0] >= 0 and res["decoding_time"][0] >= 0


def test_vtm_yuv_identity_mock(tmp_path, gradient_image):
    """VTM mock: encode copies the YUV into the bitstream, decode copies it
    back -> reconstruction equals the YCbCr-roundtripped image."""
    from PIL import Image

    from cra5_tpu.tools.ext_codecs import VTM

    build = tmp_path / "build"
    build.mkdir()
    _write_mock(
        build / "EncoderAppStatic",
        _flag_value("-i") + "out = args[args.index('-b') + 1]\nshutil.copy(val, out)\n",
    )
    _write_mock(
        build / "DecoderAppStatic",
        _flag_value("-b") + "out = args[args.index('-o') + 1]\nshutil.copy(val, out)\n",
    )
    cfg = tmp_path / "vtm.cfg"
    cfg.write_text("# mock cfg\n")

    codec = VTM(str(build), str(cfg))
    assert codec.available()
    rv = codec.run(Image.open(gradient_image), 32)
    assert rv["bpp"] > 0
    assert rv["psnr-rgb"] > 40  # only YCbCr u8 roundtrip error remains
    with pytest.raises(ValueError):
        codec.run(Image.open(gradient_image), 99)


def test_hm_uses_tapp_binaries(tmp_path):
    from cra5_tpu.tools.ext_codecs import HM

    codec = HM(str(tmp_path), str(tmp_path / "c.cfg"))
    assert codec.encoder_path.endswith("TAppEncoderStatic")
    assert codec.quality_range == (0, 51)
    assert "--SEIDecodedPictureHash" in codec.encode_cmd("a.yuv", 30, "b.bin", 8, 8)


def test_av1_identity_mock(tmp_path, gradient_image):
    from PIL import Image

    from cra5_tpu.tools.ext_codecs import AV1

    build = tmp_path / "aom"
    build.mkdir()
    _write_mock(
        build / "aomenc",
        _flag_value("-o") + "shutil.copy(args[-1], val)\n",
    )
    _write_mock(
        build / "aomdec",
        _flag_value("-o") + "shutil.copy(args[0], val)\n",
    )
    rv = AV1(str(build)).run(Image.open(gradient_image), 40)
    assert rv["bpp"] > 0 and rv["psnr-rgb"] > 40


def test_tfci_mock(tmp_path, gradient_image):
    from PIL import Image

    from cra5_tpu.tools.ext_codecs import TFCI

    script = tmp_path / "tfci.py"
    script.write_text(
        "import sys, shutil\n"
        "mode = sys.argv[1]\n"
        "if mode == 'compress': shutil.copy(sys.argv[3], sys.argv[4])\n"
        "else: shutil.copy(sys.argv[2], sys.argv[3])\n"
    )
    codec = TFCI(str(script))
    rv = codec.run(Image.open(gradient_image), 4)
    assert rv["bpp"] > 0 and rv["psnr-rgb"] > 60
    with pytest.raises(ValueError):
        codec.run(Image.open(gradient_image), 9)
    with pytest.raises(ValueError):
        TFCI(str(script), model="nope")


def test_bench_gates_on_missing_binary(tmp_path, gradient_image, capsys):
    from cra5_tpu.tools import bench

    rc = bench.main(
        ["bpg", str(gradient_image.parent), "-q", "30",
         "--encoder-path", "/nonexistent/bpgenc"]
    )
    assert rc == 2
    err = capsys.readouterr().err
    assert "bpgenc" in err and "unavailable" in err

    rc = bench.main(["vtm", str(gradient_image.parent), "-q", "30"])
    assert rc == 2  # missing --build-dir/--codec-config


# ---------------------------------------------------------------------------
# video codecs
# ---------------------------------------------------------------------------


def _make_clip(tmp_path, n=2, size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path / "train" / "clip0"
    d.mkdir(parents=True)
    paths = []
    for f in range(n):
        p = d / f"f{f}.png"
        Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    return tmp_path, paths


# a mock ffmpeg: encode packs the input pngs into one container file,
# decode unpacks them to the rec_%05d.png pattern
_MOCK_FFMPEG = """
args = sys.argv[1:]
inp = args[args.index('-i') + 1]
if '-c:v' in args:  # encode: pack pattern -> container
    files = sorted(glob.glob(inp.replace('%05d', '*')))
    out = args[-1]
    with open(out, 'wb') as fh:
        for f in files:
            data = open(f, 'rb').read()
            fh.write(len(data).to_bytes(8, 'big') + data)
else:  # decode: unpack container -> pattern
    pattern = args[-1]
    blob = open(inp, 'rb').read()
    i, idx = 0, 1
    while i < len(blob):
        n = int.from_bytes(blob[i:i+8], 'big'); i += 8
        open(pattern % idx, 'wb').write(blob[i:i+n]); i += n; idx += 1
"""


def test_x265_mock_ffmpeg(tmp_path, capsys):
    from cra5_tpu.tools import video_bench

    root, _ = _make_clip(tmp_path)
    ffmpeg = _write_mock(tmp_path / "ffmpeg", _MOCK_FFMPEG)
    rc = video_bench.main(
        ["x265", str(root), "--frames", "2", "-q", "30", "--encoder-path", ffmpeg]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["name"] == "x265"
    assert out["results"]["bpp"][0] > 0
    assert out["results"]["psnr-rgb"][0] > 60  # pack/unpack mock is lossless


def test_video_bench_gates_missing_ffmpeg(tmp_path, capsys):
    from cra5_tpu.tools import video_bench

    root, _ = _make_clip(tmp_path)
    rc = video_bench.main(
        ["x264", str(root), "--frames", "2", "--encoder-path", "/nonexistent/ffmpeg"]
    )
    assert rc == 2
    assert "ffmpeg" in capsys.readouterr().err


def test_vtm_video_multiframe_identity(tmp_path):
    from cra5_tpu.tools.ext_codecs import VTMVideo

    root, paths = _make_clip(tmp_path, n=3)
    build = tmp_path / "build"
    build.mkdir()
    _write_mock(
        build / "EncoderAppStatic",
        _flag_value("-i") + "out = args[args.index('-b') + 1]\n"
        "assert args[args.index('-f') + 1] == '3'\nshutil.copy(val, out)\n",
    )
    _write_mock(
        build / "DecoderAppStatic",
        _flag_value("-b") + "out = args[args.index('-o') + 1]\nshutil.copy(val, out)\n",
    )
    cfg = tmp_path / "v.cfg"
    cfg.write_text("#\n")
    rv = VTMVideo(str(build), str(cfg)).run_clip([str(p) for p in paths], 32)
    assert rv["bpp"] > 0 and rv["psnr-rgb"] > 40


# ---------------------------------------------------------------------------
# find_close
# ---------------------------------------------------------------------------


def test_find_close_bisects_jpeg(gradient_image):
    from PIL import Image

    from cra5_tpu.tools.find_close import find_close

    img = Image.open(gradient_image)
    q_low, v_low, _ = find_close("jpeg", img, 30.0, "psnr-rgb")
    q_high, v_high, _ = find_close("jpeg", img, 45.0, "psnr-rgb")
    assert q_high > q_low  # higher PSNR target -> higher quality setting
    assert abs(v_high - 45.0) < abs(v_low - 45.0)


def test_find_close_cli(gradient_image, capsys):
    from cra5_tpu.tools import find_close

    rc = find_close.main(["jpeg", str(gradient_image), "35", "--metric", "psnr-rgb"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "jpeg quality=" in out and "psnr-rgb=" in out


# ---------------------------------------------------------------------------
# era5_downloader with a mocked cdsapi client
# ---------------------------------------------------------------------------


class _MockResult:
    """cdsapi retrieve() result: download() writes a short file the first
    ``flaky`` times, then the full one (exercises the size-verified retry,
    reference era5_downloader.py:42-89)."""

    def __init__(self, payload: bytes, flaky: int):
        self.content_length = len(payload)
        self._payload = payload
        self._flaky = flaky
        self.downloads = 0

    def download(self, target):
        self.downloads += 1
        data = self._payload[:1] if self.downloads <= self._flaky else self._payload
        with open(target, "wb") as fh:
            fh.write(data)


class _MockClient:
    def __init__(self, flaky: int = 0):
        self.flaky = flaky
        self.requests = []
        self.results = []

    def retrieve(self, dataset, request):
        self.requests.append((dataset, request))
        # a fresh result per retrieve, as cdsapi does; flakiness is shared
        # across attempts via the remaining-failures counter
        r = _MockResult(b"netcdf-bytes-" + dataset.encode(), self.flaky)
        self.flaky = max(0, self.flaky - 1)
        self.results.append(r)
        return r


@pytest.fixture
def mock_cdsapi(monkeypatch):
    mod = types.ModuleType("cdsapi")
    holder = {}

    def client_factory():
        return holder["client"]

    mod.Client = client_factory
    monkeypatch.setitem(sys.modules, "cdsapi", mod)
    return holder


def test_downloader_requests_and_save(tmp_path, mock_cdsapi):
    from cra5_tpu.api.downloader import era5_downloader

    mock_cdsapi["client"] = _MockClient()
    dl = era5_downloader()
    paths = dl.get_form_timestamp("2024-06-01T00:00:00", str(tmp_path))
    assert set(paths) == {
        "2024-06-01T00:00:00_pressure.nc",
        "2024-06-01T00:00:00_single.nc",
    }
    for p in paths.values():
        assert os.path.getsize(p) > 1
        assert "/ERA5/2024/" in p
    (d1, req1), (d2, req2) = mock_cdsapi["client"].requests
    assert d1 == "reanalysis-era5-pressure-levels"
    assert d2 == "reanalysis-era5-single-levels"
    assert req1["date"] == "2024-06-01" and req1["time"] == "00:00"
    assert len(req1["pressure_level"]) == 37
    assert len(req1["variable"]) == 7 and len(req2["variable"]) == 9


def test_downloader_retries_on_size_mismatch(tmp_path, mock_cdsapi):
    from cra5_tpu.api.downloader import era5_downloader

    mock_cdsapi["client"] = _MockClient(flaky=1)
    dl = era5_downloader()
    paths = dl.save("2024-06-01T00:00:00", str(tmp_path))
    # the first (truncated) download triggered exactly one re-retrieve
    assert len(mock_cdsapi["client"].requests) == 3
    for p in paths.values():
        assert os.path.getsize(p) > 1


def test_downloader_gives_up_after_max_retries(tmp_path, mock_cdsapi):
    from cra5_tpu.api.downloader import era5_downloader

    mock_cdsapi["client"] = _MockClient(flaky=99)
    dl = era5_downloader()
    with pytest.raises(RuntimeError, match="size mismatch"):
        dl.save("2024-06-01T00:00:00", str(tmp_path), max_retries=2)


def test_downloader_without_cdsapi(monkeypatch, tmp_path):
    from cra5_tpu.api.downloader import era5_downloader

    # None in sys.modules makes `import cdsapi` raise ImportError
    monkeypatch.setitem(sys.modules, "cdsapi", None)
    dl = era5_downloader()  # construction must not need cdsapi
    with pytest.raises(RuntimeError, match="cdsapi"):
        dl.save("2024-06-01T00:00:00", str(tmp_path))


@pytest.mark.slow  # quick-suite re-budget (VERDICT r4 next #8): heavy tail
def test_find_close_external_bpg_mock(tmp_path, gradient_image, capsys):
    """find_close bisects an external codec's QP range (mocked bpg whose
    output size shrinks as -q grows, like a real QP)."""
    from cra5_tpu.tools import find_close

    enc = _write_mock(
        tmp_path / "bpgenc",
        _flag_value("-o")
        + "q = int(args[args.index('-q') + 1])\n"
        + "data = open(args[-1], 'rb').read()\n"
        + "keep = max(64, len(data) * (52 - q) // 52)\n"
        + "open(val, 'wb').write(data[:keep])\n",
    )
    dec = _write_mock(
        tmp_path / "bpgdec",
        # decode ignores the truncated payload; emit a fixed-size png
        _flag_value("-o")
        + "from PIL import Image\nimport numpy as np\n"
        + "Image.fromarray(np.zeros((48, 48, 3), np.uint8)).save(val)\n",
    )
    rc = find_close.main(
        ["bpg", str(gradient_image), "0.5", "--metric", "bpp",
         "--encoder-path", enc, "--decoder-path", dec]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "bpg quality=" in out

    rc = find_close.main(["bpg", str(gradient_image), "0.5", "--metric", "bpp"])
    assert rc == 2  # gated when binaries absent
