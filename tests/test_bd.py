"""Bjontegaard-delta metrics: analytic ground truths + CLI schema checks.

Test strategy mirrors SURVEY.md section 4 (pure-function units get exact
oracles): BD math is checked against curves whose BD values are known in
closed form, and the CLI is run on the reference's published CSV schema.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from crdr_tpu.metrics.bd import bd_quality, bd_rate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _curve(n=8, lo=0.1, hi=2.0):
    rate = np.geomspace(lo, hi, n)
    # PSNR-like: affine in log-rate (exactly representable by both backends)
    psnr = 30.0 + 5.0 * np.log2(rate / lo)
    return rate, psnr


@pytest.mark.parametrize("method", ["akima", "poly3"])
def test_identical_curves_are_zero(method):
    r, m = _curve()
    assert bd_rate(r, m, r, m, method=method) == pytest.approx(0.0, abs=1e-9)
    assert bd_quality(r, m, r, m, method=method) == pytest.approx(
        0.0, abs=1e-9)


@pytest.mark.parametrize("method", ["akima", "poly3"])
def test_exact_rate_scaling(method):
    """test = anchor with rates uniformly scaled by 0.9 -> BD-rate -10%."""
    r, m = _curve()
    got = bd_rate(r, m, r * 0.9, m, method=method)
    assert got == pytest.approx(-10.0, abs=0.05)
    # and the rate axis the other way: +25% bits
    got = bd_rate(r, m, r * 1.25, m, method=method)
    assert got == pytest.approx(25.0, abs=0.1)


@pytest.mark.parametrize("method", ["akima", "poly3"])
def test_exact_quality_offset(method):
    """test = anchor + 1.5 dB at every rate -> BD-quality +1.5 dB, and the
    implied BD-rate from the 5 dB/octave slope: 1.5 dB = 0.3 octaves less
    rate -> 2^-0.3 - 1 = -18.77%."""
    r, m = _curve()
    assert bd_quality(r, m, r, m + 1.5, method=method) == pytest.approx(
        1.5, abs=1e-6)
    assert bd_rate(r, m, r, m + 1.5, method=method) == pytest.approx(
        (2 ** -0.3 - 1) * 100, abs=0.1)


def test_lower_better_metric_orientation():
    """For LPIPS-like metrics, an everywhere-lower test curve must read as
    a win: negative BD-rate, positive BD-quality."""
    r, m = _curve()
    lp = 0.3 / (1.0 + m / 30.0)  # decreasing in quality
    assert bd_rate(r, lp, r * 0.9, lp, higher_better=False) < -5
    assert bd_quality(r, lp, r, lp - 0.01, higher_better=False) == \
        pytest.approx(0.01, abs=1e-6)


def test_unsorted_and_duplicate_points():
    r, m = _curve()
    perm = np.random.default_rng(0).permutation(len(r))
    r2 = np.concatenate([r[perm], r[:1]])   # shuffled + duplicated point
    m2 = np.concatenate([m[perm], m[:1]])
    assert bd_rate(r, m, r2 * 0.9, m2) == pytest.approx(-10.0, abs=0.05)


def test_validation_errors():
    r, m = _curve()
    with pytest.raises(ValueError):
        bd_rate(r[:3], m[:3], r, m)          # too few points
    with pytest.raises(ValueError):
        bd_rate(r, m, -r, m)                 # non-positive rates
    with pytest.raises(ValueError):
        bd_rate(r, m, r, m + 100.0)          # disjoint quality ranges
    with pytest.raises(ValueError):
        bd_rate(r, m, r, m, method="spline9")


def test_cli_on_reference_schema(tmp_path):
    """The CLI must digest the reference rd_results schema (upper-case PSNR,
    beta column, extra columns) and our rd_sweep schema side by side."""
    anchor = tmp_path / "anchor.csv"
    test = tmp_path / "test.csv"
    r, m = _curve()
    with open(anchor, "w") as f:
        f.write("dataset,quality,beta,bpp,PSNR,LPIPS\n")
        for i, (rr, mm) in enumerate(zip(r, m)):
            f.write(f"kodak,{i},3.84,{rr},{mm},0.1\n")
            f.write(f"kodak,{i},0.0,{rr * 5},{mm},0.2\n")  # decoy beta
    with open(test, "w") as f:
        f.write("quality,beta,bpp,psnr,ms_ssim\n")
        for i, (rr, mm) in enumerate(zip(r, m)):
            f.write(f"{i},3.84,{rr * 0.9},{mm},0.99\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bd_rate.py"),
         str(anchor), str(test), "--beta", "3.84"],
        capture_output=True, text=True, check=True)
    res = json.loads(out.stdout)
    assert res["anchor_points"] == len(r)
    assert res["bd_rate_pct"] == pytest.approx(-10.0, abs=0.1)
    # -10% rate at 5 dB/octave -> +5*log2(1/0.9) = +0.76 dB at equal rate
    assert res["bd_quality"] == pytest.approx(5 * np.log2(1 / 0.9), abs=0.01)
