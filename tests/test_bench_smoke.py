"""bench.py protocol smoke (CRDR_BENCH_TINY): the full bench code path on the
CPU backend with a shrunken model, so the benchmark harness itself cannot
regress invisibly between TPU windows.  Checks the metric_version-3 JSON
contract: median-per-config keys with IQRs, photographic+noise bpp, FLOPs."""

from __future__ import annotations

import json

import pytest

pytestmark = pytest.mark.slow


def test_bench_tiny_json_contract(monkeypatch, capsys):
    monkeypatch.setenv("CRDR_BENCH_TINY", "1")
    monkeypatch.setenv("CRDR_BENCH_TRIALS", "2")
    import bench

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    blob = json.loads(out[-1])
    assert blob["unit"] == "Mpixel/s"
    assert blob["metric_version"] >= 3
    assert blob["value"] > 0
    # every serving config is visible with its spread
    for key in ("serial_mpix_s", "pipelined_mpix_s",
                "device_wire_serial_mpix_s", "device_wire_pipelined_mpix_s"):
        assert blob[key] > 0
        assert blob[key.replace("_mpix_s", "_iqr_s")] >= 0
    assert (blob["wire"], blob["schedule"]) in {
        (w, s) for w in ("compressai", "device")
        for s in ("serial", "pipelined")}
    # headline must equal the best config's median, not exceed it
    best = max(blob["serial_mpix_s"], blob["pipelined_mpix_s"],
               blob["device_wire_serial_mpix_s"],
               blob["device_wire_pipelined_mpix_s"])
    assert abs(blob["value"] - best) < 1e-6
    assert blob["real_bpp"] > 0 and blob["noise_bpp"] > 0
    assert blob["batch1_latency_ms"] > 0
    assert blob["flops_per_image"] > 0
    assert blob["vs_baseline"] > 0


def test_bench_images_photographic():
    from bench import load_bench_images

    imgs = load_bench_images(4, 128, 192)
    assert imgs.shape == (4, 128, 192, 3) and imgs.dtype == "uint8"
    # photographic content, not noise: neighbouring pixels correlate
    import numpy as np

    x = imgs[0].astype(np.float32)
    dx = np.abs(np.diff(x, axis=1)).mean()
    assert dx < 20.0, f"mean |horizontal gradient| {dx} — looks like noise"
