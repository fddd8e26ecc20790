"""L7 CLI tools smoke tests: eval_model (real + entropy-estimation),
classical bench, plot, update_model round-trip, and metrics sanity."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")
    return d


def test_eval_model_real_coder(img_dir, tmp_path):
    from cra5_tpu.tools import eval_model

    out = tmp_path / "eval.json"
    rc = eval_model.main(
        [str(img_dir), "-a", "bmshj2018-factorized", "-q", "1",
         "--min-div", "16", "-o", str(out)]
    )
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["name"] == "bmshj2018-factorized"
    r = data["results"]
    assert r["bpp"][0] > 0 and r["psnr-rgb"][0] > 0
    assert r["encoding_time"][0] > 0


def test_eval_model_entropy_estimation(img_dir, capsys):
    from cra5_tpu.tools import eval_model

    rc = eval_model.main(
        [str(img_dir), "-a", "bmshj2018-factorized", "-q", "1",
         "--entropy-estimation", "--min-div", "16"]
    )
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert data["results"]["bpp"][0] > 0


def test_bench_and_plot(img_dir, tmp_path):
    from cra5_tpu.tools import bench, plot

    out = tmp_path / "jpeg.json"
    rc = bench.main(["jpeg", str(img_dir), "-q", "20", "60", "-o", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    bpps = data["results"]["bpp"]
    assert len(bpps) == 2 and bpps[0] < bpps[1]  # higher quality -> more bits

    png = tmp_path / "rd.png"
    rc = plot.main(["-f", str(out), "--metric", "psnr-rgb", "-o", str(png)])
    assert rc == 0 and png.exists()


def test_bench_external_codec_gated(img_dir, capsys):
    from cra5_tpu.tools import bench

    rc = bench.main(["vtm", str(img_dir)])
    assert rc == 2


def test_plot_vendored_anchors(tmp_path):
    """The reference's published RD anchors resolve by bare name and plot
    on their native bpsp rate axis (reference utils/plot/VIVT-69.json)."""
    from cra5_tpu.tools import plot
    from cra5_tpu.tools.plot import list_anchors, load_result

    anchors = list_anchors()
    assert {"VIVT-69", "VIVT-138", "JPEG-2000", "bmshj2018-hyperprior"} <= set(anchors)
    data = load_result("VIVT-69")
    assert len(data["results"]["bpsp"]) == 5
    assert 0.13 < min(data["results"]["bpsp"]) < 0.16

    png = tmp_path / "anchors.png"
    rc = plot.main(["-f", "VIVT-69", "VIVT-138", "JPEG-2000",
                    "--metric", "MSE", "-o", str(png)])
    assert rc == 0 and png.exists()

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        load_result("no-such-anchor")


def test_update_model_roundtrip(tmp_path):
    from cra5_tpu.models import load_model
    from cra5_tpu.tools import update_model
    from cra5_tpu.tools.update_model import unpack_with_tables
    from cra5_tpu.train.checkpoints import save_variables

    _, variables, _ = load_model("bmshj2018-factorized", 1, input_shape=(1, 3, 32, 32))
    ckpt = tmp_path / "fp.msgpack"
    save_variables(str(ckpt), variables)
    rc = update_model.main(
        [str(ckpt), "-a", "bmshj2018-factorized", "-q", "1", "-d", str(tmp_path)]
    )
    assert rc == 0
    stamped = [p for p in tmp_path.glob("bmshj2018-factorized-1-*.msgpack")]
    assert len(stamped) == 1
    variables2, tables = unpack_with_tables(stamped[0].read_bytes())
    assert "eb" in tables
    tables["eb"].validate()


def test_metrics_sanity():
    import jax.numpy as jnp

    from cra5_tpu.metrics import lat_weights, ms_ssim, psnr, wrmse

    a = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 3, 64, 64)), jnp.float32)
    assert float(psnr(a, a)) > 80
    assert float(ms_ssim(a, a, weights=(0.3, 0.7))) == pytest.approx(1.0, abs=1e-5)

    w = lat_weights(721)
    assert w.shape == (721,)
    assert w[0] == pytest.approx(0.0, abs=1e-6)  # pole
    assert np.argmax(w) == 360  # equator
    assert float(np.mean(w)) == pytest.approx(1.0, abs=1e-6)

    b = a + 0.1
    r = wrmse(b, a)
    assert float(r) == pytest.approx(0.1, rel=1e-4)
    rc_ = wrmse(b, a, per_channel=True)
    assert rc_.shape == (3,)
