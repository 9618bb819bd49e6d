"""Weight-converter tests: synthetic torch state dicts with the real key
names/shapes run through scripts/convert_weights.py and load back through the
runtime's flax loaders (the same validation path a real checkpoint takes)."""

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scripts.convert_weights import main as convert_main  # noqa: E402


def _t(*shape):
    return torch.zeros(*shape) + 0.01


def _alexnet_state():
    # torchvision AlexNet.features conv layers (indices 0,3,6,8,10)
    shapes = {
        "features.0": (64, 3, 11, 11), "features.3": (192, 64, 5, 5),
        "features.6": (384, 192, 3, 3), "features.8": (256, 384, 3, 3),
        "features.10": (256, 256, 3, 3),
    }
    state = {}
    for name, s in shapes.items():
        state[f"{name}.weight"] = _t(*s)
        state[f"{name}.bias"] = _t(s[0])
    return state


def _lpips_state():
    chans = (64, 192, 384, 256, 256)
    return {f"lin{i}.model.1.weight": _t(1, c, 1, 1)
            for i, c in enumerate(chans)}


def test_convert_lpips_roundtrip(tmp_path):
    alex_p = tmp_path / "alexnet.pth"
    lpips_p = tmp_path / "alex.pth"
    torch.save(_alexnet_state(), str(alex_p))
    torch.save(_lpips_state(), str(lpips_p))
    out = tmp_path / "lpips.pkl"
    convert_main(["lpips", "--alexnet", str(alex_p), "--lpips", str(lpips_p),
                  "-o", str(out)])
    with open(out, "rb") as f:
        blob = pickle.load(f)
    assert isinstance(blob["alexnet"]["features.0.weight"], np.ndarray)

    # the loss consumes the pickle end to end
    import os

    from crdr_tpu.losses.perceptual_loss import LPIPSLoss

    loss = LPIPSLoss(loss_weight=1.0, weights_path=str(out))
    import jax.numpy as jnp

    val = loss(jnp.zeros((1, 64, 64, 3)), jnp.ones((1, 64, 64, 3)) * 0.3)
    assert np.isfinite(float(val))


def test_convert_dists_roundtrip(tmp_path):
    # DISTS: stage{1..5} VGG16 slices + alpha/beta
    state = {}
    # official DISTS keys carry the GLOBAL torchvision VGG16 feature indices
    vgg_shapes = {
        "stage1.0": (64, 3, 3, 3), "stage1.2": (64, 64, 3, 3),
        "stage2.5": (128, 64, 3, 3), "stage2.7": (128, 128, 3, 3),
        "stage3.10": (256, 128, 3, 3), "stage3.12": (256, 256, 3, 3),
        "stage3.14": (256, 256, 3, 3),
        "stage4.17": (512, 256, 3, 3), "stage4.19": (512, 512, 3, 3),
        "stage4.21": (512, 512, 3, 3),
        "stage5.24": (512, 512, 3, 3), "stage5.26": (512, 512, 3, 3),
        "stage5.28": (512, 512, 3, 3),
    }
    for name, s in vgg_shapes.items():
        state[f"{name}.weight"] = _t(*s)
        state[f"{name}.bias"] = _t(s[0])
    n_feat = 3 + 64 + 128 + 256 + 512 + 512
    state["alpha"] = _t(1, n_feat, 1, 1)
    state["beta"] = _t(1, n_feat, 1, 1)
    src = tmp_path / "weights.pt"
    torch.save(state, str(src))
    out = tmp_path / "dists.pkl"
    convert_main(["dists", str(src), "-o", str(out)])
    assert out.exists()


def test_lpips_refuses_random_weights(tmp_path, monkeypatch):
    """Without weights and without the smoke-test escape, LPIPSLoss raises
    (VERDICT: never silently train against random features)."""
    monkeypatch.delenv("CRDR_ALLOW_RANDOM_LPIPS", raising=False)
    monkeypatch.delenv("CRDR_LPIPS_WEIGHTS", raising=False)
    from crdr_tpu.losses.perceptual_loss import LPIPSLoss

    with pytest.raises(FileNotFoundError, match="pretrained"):
        LPIPSLoss(loss_weight=1.0)
    # explicit opt-in still works
    loss = LPIPSLoss(loss_weight=1.0, allow_random=True)
    assert loss.variables is not None
