"""Convert torch feature-backbone checkpoints into the pickle formats the
crdr_tpu loaders consume (no network access assumed — you supply the files).

    python scripts/convert_weights.py lpips --alexnet alexnet-owt.pth \
        --lpips alex.pth -o lpips_alex.pkl           # -> CRDR_LPIPS_WEIGHTS
    python scripts/convert_weights.py inception pt_inception.pth \
        -o inception.pkl                             # -> CRDR_INCEPTION_WEIGHTS
    python scripts/convert_weights.py dists weights.pt -o dists.pkl
                                                     # -> CRDR_DISTS_WEIGHTS

Source checkpoints (reference calc_metrics uses the pip packages that bundle
them — reference scripts/calc_metrics.py):

* lpips:     torchvision ``alexnet-owt-7be5be79.pth`` (AlexNet.features convs)
             + the lpips package's ``lpips/weights/v0.1/alex.pth`` (1x1 heads)
* inception: pytorch-fid ``pt_inception-2015-12-05-6726825d.pth``
* dists:     the DISTS_pytorch package's ``weights.pt`` (alpha/beta + VGG16)

Each converter validates the result by building the flax variables through the
same loader the runtime uses and running a forward pass.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_numpy_state(state) -> dict:
    """torch state dict (possibly nested under a wrapper key) -> numpy dict."""
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    for wrapper in ("state_dict", "model", "params"):
        if isinstance(state, dict) and wrapper in state and \
                isinstance(state[wrapper], dict) and len(state) <= 2:
            state = state[wrapper]
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _torch_load(path: str) -> dict:
    import torch

    return _to_numpy_state(torch.load(path, map_location="cpu",
                                      weights_only=False))


def convert_lpips(alexnet_path: str, lpips_path: str, out_path: str) -> None:
    alexnet = _torch_load(alexnet_path)
    lpips = _torch_load(lpips_path)
    # the lpips package prefixes heads with "lin"/"lins."; strip any
    # "net."-style backbone duplicates it may carry
    blob = {"alexnet": alexnet, "lpips": lpips}
    _validate_lpips(blob)
    with open(out_path, "wb") as f:
        pickle.dump(blob, f)
    print(f"wrote {out_path} (set CRDR_LPIPS_WEIGHTS={out_path})")


def _validate_lpips(blob: dict) -> None:
    import jax.numpy as jnp

    from crdr_tpu.metrics.lpips import LPIPSAlex, load_lpips_params

    variables = load_lpips_params(blob["alexnet"], blob["lpips"])
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    y = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    val = LPIPSAlex().apply(variables, x, y)
    assert np.isfinite(np.asarray(val)).all(), "LPIPS forward produced NaN"
    print(f"validated: lpips(0, 0.5) = {float(np.asarray(val)[0]):.4f}")


def convert_inception(src_path: str, out_path: str) -> None:
    state = _torch_load(src_path)
    _validate_inception(state)
    with open(out_path, "wb") as f:
        pickle.dump(state, f)
    print(f"wrote {out_path} (set CRDR_INCEPTION_WEIGHTS={out_path})")


def _validate_inception(state: dict) -> None:
    import jax.numpy as jnp

    from crdr_tpu.metrics.inception import (InceptionV3Features,
                                            load_inception_params)

    variables = load_inception_params(state)
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    feats = InceptionV3Features().apply(variables, x)
    assert feats.shape[-1] == 2048, feats.shape
    assert np.isfinite(np.asarray(feats)).all()
    print("validated: inception pool3 features [1, 2048], finite")


def convert_dists(src_path: str, out_path: str) -> None:
    state = _torch_load(src_path)
    _validate_dists(state)
    with open(out_path, "wb") as f:
        pickle.dump(state, f)
    print(f"wrote {out_path} (set CRDR_DISTS_WEIGHTS={out_path})")


def _validate_dists(state: dict) -> None:
    import jax.numpy as jnp

    from crdr_tpu.metrics.dists import DISTS, load_dists_params

    variables = load_dists_params(state)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    val = DISTS().apply(variables, x, x)
    assert np.isfinite(np.asarray(val)).all()
    print(f"validated: dists(x, x) = {float(np.asarray(val)[0]):.4f}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="which", required=True)

    p = sub.add_parser("lpips")
    p.add_argument("--alexnet", required=True,
                   help="torchvision alexnet-owt .pth")
    p.add_argument("--lpips", required=True,
                   help="lpips package v0.1 alex.pth (linear heads)")
    p.add_argument("-o", "--out", default="lpips_alex.pkl")

    p = sub.add_parser("inception")
    p.add_argument("src", help="pytorch-fid pt_inception .pth")
    p.add_argument("-o", "--out", default="inception.pkl")

    p = sub.add_parser("dists")
    p.add_argument("src", help="DISTS weights.pt")
    p.add_argument("-o", "--out", default="dists.pkl")

    args = parser.parse_args(argv)
    if args.which == "lpips":
        convert_lpips(args.alexnet, args.lpips, args.out)
    elif args.which == "inception":
        convert_inception(args.src, args.out)
    elif args.which == "dists":
        convert_dists(args.src, args.out)


if __name__ == "__main__":
    main()
