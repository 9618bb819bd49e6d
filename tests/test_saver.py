"""Saver rolling-deletion and pytree round-trip tests."""

import os

import numpy as np

import jax.numpy as jnp

from crdr_tpu.utils.saver import Saver, load_pytree, save_pytree


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5, dtype=jnp.float32),
            "b": {"c": np.ones((2, 3), np.int32)}}
    p = str(tmp_path / "t.ckpt")
    save_pytree(tree, p)
    back = load_pytree(p)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(5))
    np.testing.assert_array_equal(back["b"]["c"], np.ones((2, 3)))


def test_saver_rolling_delete(tmp_path):
    saver = Saver(str(tmp_path), "exp", save_step=5, keep_step=[10])
    model_dir = os.path.join(str(tmp_path), "exp", "model")

    def ckpts():
        return sorted(os.listdir(model_dir))

    state = {"params": {"w": np.zeros(3)}}
    saver.save(state, "comp_model", 5)
    saver.save(state, "comp_model", 10)   # deletes iter 5
    assert ckpts() == ["comp_model_iter10.ckpt"]
    saver.save(state, "comp_model", 15)   # iter 10 kept (keep_step)
    assert ckpts() == ["comp_model_iter10.ckpt", "comp_model_iter15.ckpt"]
    saver.save(state, "comp_model", 20)   # deletes iter 15
    assert ckpts() == ["comp_model_iter10.ckpt", "comp_model_iter20.ckpt"]
    # keep=False labels are always rolled regardless of keep_step
    saver.save(state, "training_state", 10)
    saver.save(state, "training_state", 15, keep=False)
    names = ckpts()
    assert "training_state_iter10.ckpt" not in names
    assert "training_state_iter15.ckpt" in names
