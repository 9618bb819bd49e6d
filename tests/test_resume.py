"""Resume hardening: a topology change between save and resume must be loud
(reference loads optimizer state strictly — rate_distortion_trainer.py:115-163)."""

import numpy as np
import pytest

from crdr_tpu.trainer.rd_trainer import _restore_like


def _tree():
    return {"mu": np.ones((3, 2), np.float32), "nu": np.zeros((3, 2), np.float32),
            "count": np.zeros((), np.int32)}


def test_restore_like_roundtrip():
    saved = {"mu": np.full((3, 2), 7.0, np.float32),
             "nu": np.full((3, 2), 2.0, np.float32),
             "count": np.asarray(5, np.int32)}
    out = _restore_like(_tree(), saved)
    np.testing.assert_array_equal(np.asarray(out["mu"]), saved["mu"])
    assert int(out["count"]) == 5


def test_restore_like_leaf_count_mismatch_warns():
    saved = {"mu": np.ones((3, 2), np.float32)}  # missing leaves
    with pytest.warns(UserWarning, match="parameter topology"):
        out = _restore_like(_tree(), saved)
    # falls back to the fresh template
    np.testing.assert_array_equal(np.asarray(out["nu"]), np.zeros((3, 2)))


def test_restore_like_shape_mismatch_warns():
    saved = _tree()
    saved["mu"] = np.ones((4, 2), np.float32)  # resized layer
    with pytest.warns(UserWarning, match="shape"):
        out = _restore_like(_tree(), saved)
    assert np.asarray(out["mu"]).shape == (3, 2)


def test_restore_like_strict_raises():
    saved = {"mu": np.ones((3, 2), np.float32)}
    with pytest.raises(ValueError, match="strict_resume"):
        _restore_like(_tree(), saved, strict=True)


def test_restore_like_strict_shape_raises():
    saved = _tree()
    saved["nu"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="strict_resume"):
        _restore_like(_tree(), saved, strict=True)


def test_restore_like_logger_used():
    class Rec:
        msgs = []

        def warning(self, m):
            self.msgs.append(m)

    rec = Rec()
    _restore_like(_tree(), {"mu": np.ones((3, 2), np.float32)},
                  name="opt_state", logger=rec)
    assert rec.msgs and "opt_state" in rec.msgs[0]
