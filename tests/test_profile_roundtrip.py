"""profile_roundtrip smoke (CRDR_BENCH_TINY, CPU backend): the per-program
roofline profiler must stay runnable between TPU windows — its first real-TPU
run is queued behind training jobs, so a crash there wastes a relay slot.
Asserts the table contract: every dispatched program is costed (FLOPs/bytes),
totals are positive, and --wire forces the requested wire format."""

from __future__ import annotations

import re

import pytest

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("wire", ["device", "compressai"])
def test_profile_roundtrip_tiny(monkeypatch, capsys, wire):
    monkeypatch.setenv("CRDR_BENCH_TINY", "1")
    import importlib

    mod = importlib.import_module("scripts.profile_roundtrip")
    mod.main(["--batch", "2", "--wire", wire])
    out = capsys.readouterr().out
    head = re.search(r"# roundtrip profile\s+wire=(\w+)\s+batch=2", out)
    assert head and head.group(1) == wire
    m = re.search(r"# totals: ([\d.]+) GFLOP, ([\d.]+) MB", out)
    assert m and float(m.group(1)) > 0 and float(m.group(2)) > 0
    # every program row parses: name, count, GFLOP, MB, mxu_ms, hbm_ms, share
    rows = [ln for ln in out.splitlines()
            if re.match(r"\S+\s+\d+\s+[\d.]+\s+[\d.]+\s", ln)]
    assert len(rows) >= 4, out
    assert any(ln.startswith("charm_uniform") for ln in rows)
