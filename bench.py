"""Throughput benchmark: encode+decode transform Mpixel/s on the flagship model.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol: the full neural codec pipeline on one chip at 768x512 (Kodak size):
analysis transform + hyper + Charm entropy-parameter pass (encode side), and
hyper-decode + Charm parameter pass + synthesis transform (decode side), plus
the host rANS encode/decode of the actual bitstream.  This is the end-to-end
per-image compute a user pays (minus disk I/O).

``vs_baseline``: ratio against the CPU reference figure recorded in
``BASELINE_CPU.json`` (measured once by running this same pipeline with
JAX_PLATFORMS=cpu; the torch reference cannot run here — compressai is not
installed — so the CPU-JAX figure stands in as the conservative baseline).
The reference publishes no speed numbers (SURVEY.md section 6).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_CPU.json")


def run_pipeline(model, img):
    enc = model.compress(img, rate_ind=2.0)
    fake, _, _ = model.decompress(enc["string_list"], beta=2.56)
    return enc, fake


def main():
    from __graft_entry__ import _flagship_model

    H, W = 512, 768  # Kodak landscape
    print("bench: building model...", file=sys.stderr, flush=True)
    model = _flagship_model(tiny=False)
    model.codec_setup()
    rng = np.random.default_rng(0)
    # uint8 pixels: the real codec input (decoded PNG), and the dtype the
    # uint8-wire fast path ships to the device
    img = rng.integers(0, 256, (1, H, W, 3), dtype=np.uint8)

    print("bench: warmup/compile...", file=sys.stderr, flush=True)
    run_pipeline(model, img)
    print("bench: timing...", file=sys.stderr, flush=True)

    profile_dir = os.environ.get("CRDR_PROFILE_DIR")
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)

    iters = 5
    t_enc = t_dec = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        enc = model.compress(img, rate_ind=2.0)
        t_enc += time.perf_counter() - t0
        t0 = time.perf_counter()
        model.decompress(enc["string_list"], beta=2.56)
        t_dec += time.perf_counter() - t0
    if profile_dir:
        import jax

        jax.profiler.stop_trace()
        print(f"bench: perfetto trace -> {profile_dir}", file=sys.stderr)

    t_enc /= iters
    t_dec /= iters
    dt = t_enc + t_dec
    print(f"bench: encode {t_enc:.3f}s decode {t_dec:.3f}s "
          f"stage timing {enc['timing']}", file=sys.stderr, flush=True)

    mpix_s = (H * W) / dt / 1e6

    vs_baseline = 0.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("mpixel_s"):
            vs_baseline = mpix_s / base["mpixel_s"]

    print(json.dumps({
        "metric": "encode+decode Mpixel/s (768x512, flagship CRDR, 1 chip)",
        "value": round(mpix_s, 4),
        "unit": "Mpixel/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
