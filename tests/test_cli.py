"""CLI integration tests: compress.py round-trip on a tiny model + PNG images,
calc_metrics.py on the outputs, rd_sweep.py mini sweep."""

import json
import os

import numpy as np
import pytest
import yaml

from crdr_tpu.utils.img_utils import imwrite

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_config_and_images(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    from tests.test_comp_model import tiny_opt

    cfg = tiny_opt().to_dict()
    cfg_path = tmp / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    img_dir = tmp / "imgs"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    for i in range(2):
        # smooth-ish images so they compress
        base = rng.uniform(-0.6, 0.6, (1, 1, 3)).astype(np.float32)
        noise = rng.uniform(-0.2, 0.2, (72, 96, 3)).astype(np.float32)
        imwrite(str(img_dir / f"img{i}.png"), base + noise)
    return str(cfg_path), str(img_dir), str(tmp)


def test_compress_cli_roundtrip(tiny_config_and_images):
    cfg_path, img_dir, tmp = tiny_config_and_images
    from scripts.compress import main

    out_dir = os.path.join(tmp, "out")
    avg = main([cfg_path, "--img_dir", img_dir, "--save_dir", out_dir,
                "-q", "1.0", "-b", "2.56", "--decompress", "--seed", "0"])
    assert avg > 0
    assert os.path.exists(os.path.join(out_dir, "img0.bin"))
    assert os.path.exists(os.path.join(out_dir, "img0.png"))
    assert os.path.exists(os.path.join(out_dir, "_bitrates.csv"))
    with open(os.path.join(out_dir, "_avg_bitrate.json")) as f:
        assert abs(json.load(f)["avg_bpp"] - avg) < 1e-9


def test_calc_metrics_cli(tiny_config_and_images):
    cfg_path, img_dir, tmp = tiny_config_and_images
    out_dir = os.path.join(tmp, "out")
    if not os.path.exists(os.path.join(out_dir, "img0.png")):
        pytest.skip("compress test must run first")
    from scripts.calc_metrics import main

    results = main(["--real_dir", img_dir, "--fake_dir", out_dir,
                    "--metrics", "psnr", "ms_ssim"])
    assert 5 < results["PSNR"] < 60
    assert 0 <= results["MS-SSIM"] <= 1
    assert "bpp" in results
    assert os.path.exists(os.path.join(out_dir, "_metrics.json"))


def test_calc_metrics_random_weight_guard(tiny_config_and_images,
                                          monkeypatch):
    """Perceptual legs must refuse (or loudly tag) without pretrained
    weights: no bare number may reach _metrics.json (VERDICT r3 item 7)."""
    cfg_path, img_dir, tmp = tiny_config_and_images
    out_dir = os.path.join(tmp, "out")
    if not os.path.exists(os.path.join(out_dir, "img0.png")):
        pytest.skip("compress test must run first")
    from scripts.calc_metrics import main

    monkeypatch.delenv("CRDR_LPIPS_WEIGHTS", raising=False)
    monkeypatch.delenv("CRDR_INCEPTION_WEIGHTS", raising=False)
    monkeypatch.delenv("CRDR_DISTS_WEIGHTS", raising=False)
    monkeypatch.delenv("CRDR_ALLOW_RANDOM_LPIPS", raising=False)
    results = main(["--real_dir", img_dir, "--fake_dir", out_dir,
                    "--metrics", "lpips", "fid", "dists"])
    for name in ("LPIPS", "FID", "DISTS"):
        assert name not in results
        assert results[f"{name}_weights"].startswith("skipped")

    # random-weight LPIPS is allowed only with the explicit opt-in, and the
    # provenance tag must ride along with the value
    monkeypatch.setenv("CRDR_ALLOW_RANDOM_LPIPS", "1")
    results = main(["--real_dir", img_dir, "--fake_dir", out_dir,
                    "--metrics", "lpips"])
    assert "LPIPS" in results
    assert results["LPIPS_weights"] == "random"


def test_compress_cli_batched(tiny_config_and_images):
    """--batch groups same-size images; outputs identical to batch 1."""
    cfg_path, img_dir, tmp = tiny_config_and_images
    from scripts.compress import main

    out1 = os.path.join(tmp, "out_b1")
    out2 = os.path.join(tmp, "out_b2")
    avg1 = main([cfg_path, "--img_dir", img_dir, "--save_dir", out1,
                 "-q", "1.0", "-b", "2.56", "--decompress", "--seed", "0"])
    avg2 = main([cfg_path, "--img_dir", img_dir, "--save_dir", out2,
                 "-q", "1.0", "-b", "2.56", "--decompress", "--seed", "0",
                 "--batch", "2"])
    assert abs(avg1 - avg2) < 1e-12
    for name in ("img0", "img1"):
        with open(os.path.join(out1, f"{name}.bin"), "rb") as f1, \
                open(os.path.join(out2, f"{name}.bin"), "rb") as f2:
            assert f1.read() == f2.read()
        a = np.fromfile(os.path.join(out1, f"{name}.png"), np.uint8)
        b = np.fromfile(os.path.join(out2, f"{name}.png"), np.uint8)
        assert np.array_equal(a, b)


def test_rd_sweep_cli(tiny_config_and_images):
    """Mini sweep; the mixed-rate batched protocol must agree with the
    one-pair-at-a-time protocol (same math, [Q]- vs [1]-shaped programs)."""
    cfg_path, img_dir, tmp = tiny_config_and_images
    import pandas as pd

    from scripts.rd_sweep import main

    out_b = os.path.join(tmp, "sweep_batched")
    out_s = os.path.join(tmp, "sweep_serial")
    main([cfg_path, "--img_dir", img_dir, "--save_dir", out_b,
          "--qualities", "0.5", "2.0", "--betas", "1.28",
          "--max_images", "1"])
    main([cfg_path, "--img_dir", img_dir, "--save_dir", out_s,
          "--qualities", "0.5", "2.0", "--betas", "1.28",
          "--max_images", "1", "--no_rate_batch"])
    b = pd.read_csv(os.path.join(out_b, "rd_curve.csv"))
    s = pd.read_csv(os.path.join(out_s, "rd_curve.csv"))
    assert list(b["quality"]) == [0.5, 2.0]
    assert np.allclose(b["bpp"], s["bpp"], rtol=1e-3)
    assert np.allclose(b["psnr"], s["psnr"], atol=0.05)
    assert np.allclose(b["ms_ssim"], s["ms_ssim"], atol=1e-3)


def test_compress_cli_device_wire(tiny_config_and_images):
    """--wire device: CLI roundtrip through the lane-container bitstream."""
    cfg_path, img_dir, tmp = tiny_config_and_images
    from scripts.compress import main

    out = os.path.join(tmp, "out_devwire")
    avg = main([cfg_path, "--img_dir", img_dir, "--save_dir", out,
                "-q", "1.0", "-b", "2.56", "--decompress", "--seed", "0",
                "--wire", "device", "--batch", "2"])
    assert avg > 0
    for name in ("img0", "img1"):
        assert os.path.exists(os.path.join(out, f"{name}.png"))
        with open(os.path.join(out, f"{name}.bin"), "rb") as f:
            blob = f.read()
        assert b"CRDW" in blob  # lane-container magic rode to disk
