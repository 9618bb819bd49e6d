"""Every shipped model config must build and trace at full size.

Uses jax.eval_shape so the full 320-channel architectures are validated
structurally (shapes, wiring, registry resolution) without any FLOPs.
"""

import os
from glob import glob

import pytest

import jax
import jax.numpy as jnp

from crdr_tpu.models import build_comp_model
from crdr_tpu.utils.config import Config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "config")

MODEL_CONFIGS = sorted(glob(os.path.join(CONFIG_DIR, "_base_", "model",
                                         "*.yaml")))


@pytest.mark.parametrize("cfg_path", MODEL_CONFIGS,
                         ids=[os.path.basename(p) for p in MODEL_CONFIGS])
def test_model_config_traces(cfg_path):
    cfg = Config.from_file(cfg_path)
    model = build_comp_model(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    kw = {}
    if model.use_rate:
        kw["rate_ind"] = jnp.zeros((1,), jnp.float32)
    if model.use_beta:
        kw["beta"] = jnp.zeros((1,), jnp.float32)

    variables = jax.eval_shape(
        lambda: model.net.init({"params": jax.random.PRNGKey(0)}, x,
                               is_train=False, **kw))
    n_params = sum(int(jnp.prod(jnp.asarray(s.shape)))
                   for s in jax.tree.leaves(variables["params"]))
    assert n_params > 1e6  # full-size architectures

    out = jax.eval_shape(
        lambda v: model.net.apply(v, x, is_train=False, **kw), variables)
    assert out["fake_images"].shape == (1, 64, 64, 3)
    assert out["likelihoods"]["y"].shape[1:3] == (4, 4)


def test_training_configs_compose():
    for stage in (1, 2, 3):
        cfg = Config.from_file(os.path.join(CONFIG_DIR,
                                            f"crdr_stage_{stage}.yaml"))
        assert cfg.total_iter >= 500000
        assert cfg.loss.rate_loss.type.startswith("Hific")
        assert cfg.optim.clip_max_norm == 1.0
    assert Config.from_file(
        os.path.join(CONFIG_DIR, "crdr.yaml")).model_type \
        == "BetaCondInterpCaHyperpriorCharmModel"


def test_example_configs_compose():
    for p in glob(os.path.join(CONFIG_DIR, "examples", "*.yaml")):
        cfg = Config.from_file(p)
        assert "trainer" in cfg and "subnet" in cfg


def test_reference_discriminator_name_resolves():
    """A reference config naming the original class
    (multirate_clic21_gvae_discriminator.py:252) must build here."""
    import jax
    import jax.numpy as jnp

    from crdr_tpu.subnet.discriminator import build_discriminator

    disc = build_discriminator(
        {"type": "MultirateSharedRateCondClic21GvaeDiscriminator",
         "rate_level": 5, "main_ch": 8})
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    var = disc.init(jax.random.PRNGKey(0), x, 2, train=False)
    out = disc.apply(var, x, 2, train=False)
    assert out.shape[0] == 1 and jnp.all(jnp.isfinite(out))
