import os

import numpy as np
import pytest

from crdr_tpu.utils.codec_utils import (HeaderHandler, MultiRateHeaderHandler,
                                        load_byte_strings, save_byte_strings)
from crdr_tpu.utils.config import Config, ConfigDict, merge_dict
from crdr_tpu.utils.img_utils import calc_psnr, crop_image, pad_image
from crdr_tpu.utils.registry import Registry


def test_configdict_attribute_access():
    c = ConfigDict({"a": {"b": 1}, "lst": [{"x": 2}]})
    assert c.a.b == 1
    assert c.lst[0].x == 2
    c.a.c = 3
    assert c["a"]["c"] == 3
    assert c.get("missing") is None


def test_merge_dict_delete_key():
    base = {"m": {"x": 1, "y": 2}, "k": 0}
    new = {"m": {"_delete_": True, "z": 3}}
    out = merge_dict(new, base)
    assert out["m"] == {"z": 3}
    assert out["k"] == 0


def test_merge_dict_recursive():
    base = {"m": {"x": 1, "y": 2}}
    out = merge_dict({"m": {"y": 5}}, base)
    assert out["m"] == {"x": 1, "y": 5}


def test_config_base_inheritance(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nsub: {x: 1, y: 2}\n")
    (tmp_path / "child.yaml").write_text(
        "_base_: [./base.yaml]\nsub: {y: 9}\nb: 2\n"
    )
    cfg = Config.from_file(str(tmp_path / "child.yaml"))
    assert cfg.a == 1 and cfg.b == 2
    assert cfg.sub.x == 1 and cfg.sub.y == 9
    assert cfg.exp == "child"


def test_config_duplicate_base_keys_raise(tmp_path):
    """Two _base_ files defining the same key is an authoring error
    (reference options.py:96-105)."""
    (tmp_path / "b1.yaml").write_text("a: 1\nshared: {x: 1}\n")
    (tmp_path / "b2.yaml").write_text("b: 2\nshared: {x: 2}\n")
    (tmp_path / "child.yaml").write_text(
        "_base_: [./b1.yaml, ./b2.yaml]\nc: 3\n")
    with pytest.raises(KeyError, match="duplicate keys"):
        Config.from_file(str(tmp_path / "child.yaml"))
    # disjoint bases still compose
    (tmp_path / "b3.yaml").write_text("d: 4\n")
    (tmp_path / "child2.yaml").write_text(
        "_base_: [./b1.yaml, ./b3.yaml]\nc: 3\n")
    cfg = Config.from_file(str(tmp_path / "child2.yaml"))
    assert cfg.a == 1 and cfg.d == 4 and cfg.c == 3


def test_reference_crdr_config_composes():
    ref = "/root/repo/config/crdr.yaml"
    if not os.path.exists(ref):
        pytest.skip("crdr.yaml not present yet")
    cfg = Config.from_file(ref)
    assert cfg.model_type == "BetaCondInterpCaHyperpriorCharmModel"
    assert cfg.subnet.encoder.out_ch == 320
    assert cfg.subnet.context_model.num_slices == 10
    assert cfg.subnet.decoder.max_beta == 5.12


def test_train_cli_reference_short_flags():
    # the reference's short option spellings (options.py:219-228) must parse
    from crdr_tpu.utils.config import get_train_config

    cfg = get_train_config([
        "/root/repo/config/crdr_stage_1.yaml",
        "-si", "100", "-ti", "2000", "-b", "4", "-e", "500", "-l", "50",
        "-s", "1000", "-nw", "2", "-wb"])
    assert cfg.start_iter == 100 and cfg.total_iter == 2000
    assert cfg.dataset.batch_size == 4
    assert cfg.eval_step == 500 and cfg.log_step == 50 and cfg.save_step == 1000
    assert cfg.num_workers == 2 and cfg.use_wandb is True


def test_compress_cli_config_path_flag(tmp_path):
    # reference spelling --config_path (compress.py:37) and our positional
    # must resolve to the same thing; neither given is an error
    import scripts.compress as sc

    common = ["--img_dir", "a", "--save_dir", "b"]
    a1 = sc.parse_args(["config/crdr.yaml"] + common)
    a2 = sc.parse_args(["--config_path", "config/crdr.yaml"] + common)
    assert a1.config_path == a2.config_path == "config/crdr.yaml"
    with pytest.raises(SystemExit):
        sc.parse_args(common)


def test_registry():
    reg = Registry("test")

    @reg.register()
    class Foo:
        pass

    assert reg.get("Foo") is Foo
    assert "Foo" in reg
    with pytest.raises(KeyError):
        reg.get("Bar")
    with pytest.raises(KeyError):
        reg.register(Foo)


def test_header_roundtrip():
    y_hat = np.random.randn(1, 16, 16, 320) * 3
    h = HeaderHandler()
    enc = h.encode((768, 512), y_hat)
    dec = h.decode(enc)
    assert dec["img_size"] == (768, 512)
    assert dec["max_sample"] == int(np.max(np.abs(y_hat)))
    assert len(enc) == 5


def test_multirate_header_roundtrip():
    y_hat = np.zeros((1, 4, 4, 8))
    h = MultiRateHeaderHandler()
    for q in [0.0, 0.25, 2.75, 4.0]:
        dec = h.decode(h.encode((100, 200), y_hat, rate_ind=q))
        assert dec["img_size"] == (100, 200)
        assert dec["rate_ind"] == q
    assert len(h.encode((1, 1), y_hat, rate_ind=0.0)) == 6


def test_byte_strings_roundtrip(tmp_path):
    strings = [b"header", b"\x00\x01\x02", b"", b"y" * 1000]
    p = str(tmp_path / "test.bin")
    save_byte_strings(p, strings)
    assert load_byte_strings(p) == strings
    # container overhead: 4 bytes per string
    assert os.path.getsize(p) == sum(len(s) for s in strings) + 4 * len(strings)


def test_pad_crop_roundtrip():
    x = np.random.randn(1, 100, 130, 3).astype(np.float32)
    p = pad_image(x, 64)
    assert p.shape == (1, 128, 192, 3)
    back = crop_image(p, 100, 130)
    np.testing.assert_array_equal(back, x)
    # reflect padding mirrors the edge
    np.testing.assert_allclose(p[0, 100, :130], x[0, 98, :], rtol=0, atol=0)


def test_psnr_uint8_semantics():
    a = np.zeros((8, 8, 3), dtype=np.float32)
    b = np.full((8, 8, 3), 2.0 / 255.0 * 2, dtype=np.float32) - 0.0  # ~2 steps
    val = calc_psnr(a, a)
    assert val == float("inf")
    assert calc_psnr(a, b) < 60


def test_aux_convergence_guard(tmp_path):
    """check_aux_convergence: converged chase passes, still-climbing fails,
    warm-started small-absolute passes, resume-overlap rows are deduped."""
    import csv as _csv

    from scripts.check_aux_convergence import check_aux_convergence

    def write(name, rows):
        p = tmp_path / name
        with open(p, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["iter", "aux"])
            w.writerows(rows)
        return str(p)

    # chase then collapse (stage-1 shape), with a resume-overlap duplicate
    rows = [(i, 100 + i) for i in range(0, 5000, 100)]          # climb
    rows += [(i, 5100 - (i - 5000)) for i in range(5000, 9900, 100)]  # fall
    rows += [(9900, 30.0), (9900, 31.0)]                        # dup iter
    ok, diag = check_aux_convergence(write("good.csv", rows))
    assert ok, diag

    # still climbing at the end -> fail
    rows = [(i, 10 + i) for i in range(0, 10000, 100)]
    ok, diag = check_aux_convergence(write("bad.csv", rows))
    assert not ok, diag

    # warm start: flat and small in absolute terms -> pass
    rows = [(i, 20.0 + 0.01 * ((i // 100) % 3)) for i in range(0, 10000, 100)]
    ok, diag = check_aux_convergence(write("warm.csv", rows))
    assert ok, diag

    # the committed stage-1 endurance artifact passes
    art = os.path.join(os.path.dirname(__file__), "..", "docs", "artifacts",
                       "endurance_stage1_loss.csv")
    if os.path.exists(art):
        ok, diag = check_aux_convergence(art)
        assert ok, diag
