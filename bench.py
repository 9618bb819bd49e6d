"""Throughput benchmark: encode+decode transform Mpixel/s on the flagship model.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol (metric_version 3): the full neural codec pipeline on one chip at
768x512 (Kodak size) on PHOTOGRAPHIC content (the reference's demo_images
tiled to the batch): analysis transform + hyper + Charm entropy-parameter
pass (encode side), hyper-decode + Charm parameter pass + synthesis transform
(decode side), plus the host/device rANS coding of the actual bitstream.
Four serving configurations (wire format x schedule) are each timed as the
MEDIAN of N trials (IQR kept alongside); the headline is the best config's
median.  Max-of-single-shots is not used anywhere — the TPU relay's run-to-run
variance (~30% day-to-day) made that upward-biased (ADVICE r3).

``vs_baseline``: ratio against the CPU figure in ``BASELINE_CPU.json``
(this same pipeline under JAX_PLATFORMS=cpu).  ``vs_torch_cpu``: ratio
against ``BASELINE_TORCH.json`` — the ACTUAL reference source executing on
torch-CPU (scripts/measure_torch_baseline.py, via tests/ref_shims).  The
reference publishes no speed numbers (SURVEY.md section 6), so both
denominators are measured here.

FLOPs/MFU: every device program dispatch is counted during one serial
roundtrip of the winning wire (runtime/aot.py ExeDispatch recorder hook) and
costed with XLA's ``cost_analysis``; ``mfu_pct`` divides achieved FLOP/s at
the headline throughput by the chip's assumed peak.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(_HERE, "BASELINE_CPU.json")
BASELINE_TORCH_FILE = os.path.join(_HERE, "BASELINE_TORCH.json")
BASELINE_TORCH_TRAIN_FILE = os.path.join(_HERE, "BASELINE_TORCH_TRAIN.json")
TRAIN_BENCH_FILE = os.path.join(_HERE, "docs", "artifacts",
                                "train_bench_latest.json")
DEMO_DIR = "/root/reference/demo_images"
METRIC_VERSION = 3

# assumed dense peak FLOP/s by device kind substring (used only for mfu_pct;
# the assumption is echoed in the JSON so it can never mislead silently)
_PEAK_FLOPS = (
    ("v5 lite", 197e12, "bf16"),   # TPU v5e MXU peak
    ("v5litepod", 197e12, "bf16"),
    ("v4", 275e12, "bf16"),
    ("v6", 918e12, "bf16"),
)


def _metric_string(W: int, H: int, batch: int) -> str:
    return (f"encode+decode Mpixel/s ({W}x{H} batch={batch} best serving "
            "config, flagship CRDR, 1 chip)")


def _honor_platform_env() -> None:
    """The axon sitecustomize force-sets ``jax_platforms="axon,cpu"``,
    silently overriding the JAX_PLATFORMS env var.  Re-apply the env var via
    jax.config (the conftest trick) so ``JAX_PLATFORMS=cpu bench.py`` really
    runs on CPU — required for the CRDR_BENCH_TINY CPU smoke leg."""
    want = os.environ.get("JAX_PLATFORMS")
    if want and want != "axon":
        import jax

        jax.config.update("jax_platforms", want)


def _require_backend(timeout_s: float, metric: str) -> None:
    """Bound JAX backend init: the TPU relay, when unhealthy, can hang
    ``jax.devices()`` forever (observed 2026-08-18 — 20+ min).  Probe it in
    a daemon thread; on timeout print an honest zero-valued JSON line (so
    the driver records an explainable failure, not a stall) and hard-exit.
    Nothing else is in flight at this point, so ``os._exit`` is safe."""
    import threading

    res = {}

    def probe():
        import jax

        res["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in res:
        print(f"bench: backend init exceeded {timeout_s:.0f}s — relay "
              "unresponsive", file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": "Mpixel/s",
            "vs_baseline": 0.0,
            "error": f"jax backend init timed out after {timeout_s:.0f}s "
                     "(TPU relay unresponsive)",
        }), flush=True)
        os._exit(1)
    print(f"bench: devices {res['devices']}", file=sys.stderr, flush=True)


def _probe_relay_link(timeout_s: float = 90.0) -> dict:
    """Measure host<->device link bandwidth with a 4 MB buffer each way.

    The TPU here sits behind a network relay whose d2h path has been observed
    to collapse independently of h2d (2026-08-19/20: h2d ~230 MB/s while d2h
    <0.5 MB/s for hours).  A throughput number taken in such a window is
    honest but unexplainable without this context, so the probe's bandwidths
    ride along in the JSON; ``relay_degraded`` flags either direction below
    20 MB/s.  On CPU backends the copies are host-local and the flag stays
    False.

    Robustness (ADVICE r4): the measurement runs in a daemon thread with a
    bounded join — in the documented collapse mode a single d2h pull can
    take minutes or hang, and an unbounded probe would reintroduce the stall
    ``_require_backend`` exists to prevent.  A small warmup roundtrip first
    absorbs the one-time stream/allocator setup of a fresh process (measured
    2026-08-20: first d2h ~80s, second 0.16s), the payload is random bytes
    (a compressing relay would overstate bandwidth on zeros), and each
    direction is the median of 2 transfers."""
    import threading

    res = {}

    def probe():
        import jax

        warm = jax.device_put(np.ones((64, 1024), np.float32))
        warm.block_until_ready()
        np.asarray(warm)  # absorb cold-pull setup cost
        mb = 4.0
        buf = np.random.default_rng(0).integers(
            0, 256, (int(mb * 1024 * 1024),), np.uint8).view(np.float32)
        h2d_t, d2h_t = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            dev = jax.device_put(buf)
            dev.block_until_ready()
            h2d_t.append(time.perf_counter() - t0)
            t1 = time.perf_counter()
            np.asarray(dev)
            d2h_t.append(time.perf_counter() - t1)
        res["h2d"] = mb / max(float(np.median(h2d_t)), 1e-9)
        res["d2h"] = mb / max(float(np.median(d2h_t)), 1e-9)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "d2h" not in res:
        print(f"bench: link probe exceeded {timeout_s:.0f}s — relay "
              "treated as degraded", file=sys.stderr, flush=True)
        return {"relay_h2d_mb_s": round(res.get("h2d", 0.0), 1),
                "relay_d2h_mb_s": 0.0, "relay_degraded": True}
    return {
        "relay_h2d_mb_s": round(res["h2d"], 1),
        "relay_d2h_mb_s": round(res["d2h"], 1),
        "relay_degraded": bool(min(res["h2d"], res["d2h"]) < 20.0),
    }


def load_bench_images(batch: int, h: int, w: int) -> np.ndarray:
    """Photographic uint8 batch: the 3 reference demo images (Kodak), rotated
    landscape and cropped to (h, w), tiled over the batch.  Falls back to
    noise if the reference tree is absent (standalone checkouts)."""
    try:
        from PIL import Image

        paths = sorted(os.listdir(DEMO_DIR))
        tiles = []
        for p in paths:
            if not p.lower().endswith((".png", ".jpg")):
                continue
            arr = np.asarray(Image.open(os.path.join(DEMO_DIR, p))
                             .convert("RGB"))
            if arr.shape[0] > arr.shape[1]:  # portrait -> landscape
                arr = np.rot90(arr)
            if arr.shape[0] < h or arr.shape[1] < w:
                continue
            tiles.append(arr[:h, :w])
        assert tiles
    except Exception as e:  # noqa: BLE001 — any miss falls back to noise
        print(f"bench: demo images unavailable ({e}); using noise",
              file=sys.stderr, flush=True)
        rng = np.random.default_rng(0)
        return rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8)
    return np.stack([tiles[i % len(tiles)] for i in range(batch)])


def run_pipeline(model, imgs):
    encs = model.compress_batch(imgs, rate_ind=2.0)
    fake, _, _ = model.decompress_batch([e["string_list"] for e in encs],
                                        beta=2.56)
    return encs, fake


def _median_iqr(xs):
    xs = np.asarray(xs, np.float64)
    q1, med, q3 = np.percentile(xs, [25, 50, 75])
    return float(med), float(q3 - q1)


def _serial_trials(model, imgs, trials: int):
    """Per-trial seconds for one serial batch roundtrip."""
    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        run_pipeline(model, imgs)
        out.append(time.perf_counter() - t0)
    return out


def _pipelined_trials(model, imgs, trials: int, k: int = 3):
    """Per-trial seconds/batch under the overlap schedule: encode of batch
    j+1 overlaps the decode of batch j (the Charm decode loop is
    RTT-floor-bound behind a remote-attached chip — the device is mostly
    idle between its serial round trips, so the next batch's encode compute
    hides under it)."""
    from concurrent.futures import ThreadPoolExecutor

    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(model.compress_batch, imgs, 2.0)
            for j in range(k):
                encs = fut.result()
                if j + 1 < k:
                    fut = ex.submit(model.compress_batch, imgs, 2.0)
                model.decompress_batch([e["string_list"] for e in encs],
                                       beta=2.56)
        out.append((time.perf_counter() - t0) / k)
    return out


def _latency_trials(model, img1, trials: int):
    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        enc1 = model.compress(img1, rate_ind=2.0)
        model.decompress(enc1["string_list"], beta=2.56)
        out.append(time.perf_counter() - t0)
    return out


class _FlopsCounter:
    """AotRecorder-shaped hook that counts every device-program dispatch and
    keeps one exemplar (jit_fn, args) per program+signature for costing."""

    def __init__(self):
        self.counts = {}
        self.exemplars = {}

    def record(self, name, jit_fn, args):
        from crdr_tpu.runtime.aot import _key_str

        key = _key_str(name, args)
        self.counts[key] = self.counts.get(key, 0) + 1
        if key not in self.exemplars:
            self.exemplars[key] = (jit_fn, args)

    def total_flops(self):
        """Sum of per-call XLA cost_analysis flops; None when unavailable."""
        total = 0.0
        for key, (jit_fn, args) in self.exemplars.items():
            try:
                lowered = jit_fn.lower(*args)
                try:
                    cost = lowered.cost_analysis()
                except Exception:
                    cost = None
                if cost is None:  # TPU backend: compiled-only cost analysis
                    cost = lowered.compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                total += float(cost.get("flops", 0.0)) * self.counts[key]
            except Exception as e:  # noqa: BLE001
                print(f"bench: cost_analysis failed for {key[:60]}: {e}",
                      file=sys.stderr, flush=True)
                return None
        return total


def measure_flops(model, imgs) -> float | None:
    """FLOPs of one serial batch roundtrip under the model's CURRENT wire
    format, via the ExeDispatch recorder hook."""
    prev = model._aot_recorder
    counter = _FlopsCounter()
    model._aot_recorder = counter
    try:
        run_pipeline(model, imgs)
    finally:
        model._aot_recorder = prev
    return counter.total_flops()


def analytic_pallas_flops(model, batch: int, H: int, W: int) -> float:
    """FLOPs the Pallas SliceTransform kernel executes per batch roundtrip.

    XLA's ``cost_analysis`` cannot see inside Mosaic custom-calls, so when
    the fused kernel carries the Charm conv math the recorder undercounts by
    exactly these convolutions (VERDICT r4 weak #7: 812G vs 1418G per image
    made ``mfu_pct`` incomparable across pallas/non-pallas configs).  Count
    them analytically from the packed uniform weight shapes: per direction
    (encode replays the decode chain, so both run it) each of the S slices
    applies the mean, scale, and LRP transforms once at the UNIFORM padded
    widths the hardware actually executes.  Returns 0.0 when the kernel
    would not dispatch (CRDR_PALLAS/config off, CPU backend, latent too big
    for VMEM)."""
    if getattr(model, "_charm_packed", None) is None:
        return 0.0
    import jax

    from crdr_tpu.ops.charm_uniform import _fused_mode

    h, w = H // 16, W // 16  # flagship latent grid (4 stride-2 stages)
    probe = jax.ShapeDtypeStruct((batch, h, w, 1), np.float32)
    if _fused_mode(probe) != "1":
        return 0.0
    per_call = 0.0
    for kind in ("mean", "scale", "lrp"):
        cins = [int(model._charm_packed[f"{kind}{t}_w"].shape[-2])
                for t in ("0", "2", "4")]
        couts = [int(model._charm_packed[f"{kind}{t}_w"].shape[-1])
                 for t in ("0", "2", "4")]
        ks = (5, 5, 3)
        per_call += sum(2.0 * h * w * k * k * ci * co
                        for k, ci, co in zip(ks, cins, couts))
    S = int(model.num_slices)
    return float(batch * 2 * S * per_call)  # 2 = encode replay + decode


def main():
    from __graft_entry__ import _flagship_model

    H, W = 512, 768  # Kodak landscape
    BATCH = int(os.environ.get("CRDR_BENCH_BATCH", "8"))
    TRIALS = int(os.environ.get("CRDR_BENCH_TRIALS", "5"))
    cfg_name = os.environ.get("CRDR_BENCH_CONFIG", "crdr_throughput.yaml")
    # CRDR_BENCH_TINY=1: shrunken model + image — NOT a valid measurement,
    # just a CPU-runnable smoke of the full bench code path (all legs), so
    # bench regressions are catchable without TPU access
    tiny = os.environ.get("CRDR_BENCH_TINY", "0") == "1"
    if tiny:
        H, W, BATCH, TRIALS = 128, 192, min(BATCH, 2), 2
    metric = _metric_string(W, H, BATCH)
    _honor_platform_env()
    _require_backend(float(os.environ.get("CRDR_BENCH_INIT_TIMEOUT", "600")),
                     metric)
    link = _probe_relay_link()
    print(f"bench: link probe {link}", file=sys.stderr, flush=True)
    print(f"bench: building model ({cfg_name}, tiny={tiny})...",
          file=sys.stderr, flush=True)
    model = _flagship_model(tiny=tiny, config_name=cfg_name)
    model.codec_setup()
    # photographic uint8 pixels (decoded PNG — the real codec input, and the
    # dtype the uint8-wire fast path ships to the device).  Throughput
    # protocol: a serving batch moves through compress_batch /
    # decompress_batch — ONE set of device dispatches per batch (the Charm
    # decode loop's serial round trips amortize across the batch; per-image
    # rANS streams stay independent and bit-identical to batch-1 coding).
    imgs = load_bench_images(BATCH, H, W)
    img1 = imgs[:1]
    npix_batch = BATCH * H * W

    print("bench: warmup/compile...", file=sys.stderr, flush=True)
    run_pipeline(model, imgs)

    profile_dir = os.environ.get("CRDR_PROFILE_DIR")
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)

    legs = {}          # (wire, schedule) -> (median_s_per_batch, iqr)
    extras = {}

    def leg(wire, sched, times):
        med, iqr = _median_iqr(times)
        legs[(wire, sched)] = (med, iqr)
        print(f"bench: {wire}/{sched} median {med:.3f}s/batch "
              f"(iqr {iqr:.3f}, n={len(times)}) "
              f"{npix_batch / med / 1e6:.3f} Mpix/s",
              file=sys.stderr, flush=True)

    print("bench: host-wire legs...", file=sys.stderr, flush=True)
    leg("compressai", "serial", _serial_trials(model, imgs, TRIALS))
    leg("compressai", "pipelined",
        _pipelined_trials(model, imgs, max(2, TRIALS - 2)))
    lat_host = _latency_trials(model, img1, TRIALS)[1:]  # drop compile iter
    extras["batch1_latency_ms"] = round(np.median(lat_host) * 1e3, 1)
    extras["batch1_mpix_s"] = round(
        H * W / float(np.median(lat_host)) / 1e6, 4)
    # predicted-vs-real stream size on photographic content (noise was the
    # r3 headline input — max-entropy symbols, unrepresentative streams)
    encs = model.compress_batch(imgs, rate_ind=2.0)
    extras["real_bpp"] = round(sum(
        sum(len(bytes(s)) for s in e["string_list"]) * 8
        for e in encs) / npix_batch, 4)
    print(f"bench: stage timing enc={encs[0]['timing']} "
          f"dec={model.last_decode_timing}", file=sys.stderr, flush=True)

    flops_batch = None
    if os.environ.get("CRDR_BENCH_DEVICE_WIRE", "1") == "1":
        print("bench: device-wire legs...", file=sys.stderr, flush=True)
        model.wire_format = "device"
        try:
            run_pipeline(model, imgs)  # compile rans_round/decode variants
            leg("device", "serial", _serial_trials(model, imgs, TRIALS))
            leg("device", "pipelined",
                _pipelined_trials(model, imgs, max(2, TRIALS - 2)))
            latd = _latency_trials(model, img1, TRIALS)[1:]
            extras["device_wire_batch1_latency_ms"] = round(
                np.median(latd) * 1e3, 1)
            print("bench: counting FLOPs (device wire)...",
                  file=sys.stderr, flush=True)
            flops_batch = measure_flops(model, imgs)
        finally:
            model.wire_format = "compressai"
    if flops_batch is None:
        print("bench: counting FLOPs (host wire)...",
              file=sys.stderr, flush=True)
        flops_batch = measure_flops(model, imgs)

    # noise secondary leg: keeps the r1-r3 input distribution visible so the
    # protocol change to real images cannot hide a regression
    noise = np.random.default_rng(0).integers(
        0, 256, imgs.shape, dtype=np.uint8)
    t_noise = _serial_trials(model, noise, 1)[0]
    extras["noise_serial_mpix_s"] = round(npix_batch / t_noise / 1e6, 4)
    encs_n = model.compress_batch(noise, rate_ind=2.0)
    extras["noise_bpp"] = round(sum(
        sum(len(bytes(s)) for s in e["string_list"]) * 8
        for e in encs_n) / npix_batch, 4)

    if profile_dir:
        import jax

        jax.profiler.stop_trace()
        print(f"bench: perfetto trace -> {profile_dir}", file=sys.stderr)

    # Headline = median throughput of the best serving configuration (wire
    # format x schedule).  Both axes are static config switches a deployment
    # picks once (--wire, pipelining on/off in the CLI/daemon); which one
    # wins flips with relay RTT conditions.  Every candidate stays visible
    # below so none can regress invisibly.
    (best_wire, best_sched), (best_s, best_iqr) = min(
        legs.items(), key=lambda kv: kv[1][0])
    mpix_s = npix_batch / best_s / 1e6

    out = {
        "metric": metric,
        "value": round(mpix_s, 4),
        "unit": "Mpixel/s",
        "metric_version": METRIC_VERSION,
        "protocol": f"median of N trials per config (IQR alongside), "
                    f"photographic input ({DEMO_DIR})",
        "wire": best_wire,
        "schedule": best_sched,
        "iqr_mpix_s": round(npix_batch / (best_s - best_iqr / 2) / 1e6
                            - npix_batch / (best_s + best_iqr / 2) / 1e6, 4)
        if best_s > best_iqr else None,
    }
    for (wire, sched), (med, iqr) in sorted(legs.items()):
        pfx = "" if wire == "compressai" else "device_wire_"
        out[f"{pfx}{sched}_mpix_s"] = round(npix_batch / med / 1e6, 4)
        out[f"{pfx}{sched}_iqr_s"] = round(iqr, 4)
    out.update(extras)
    out.update(link)
    # relay conditions drift over a multi-minute bench; a second probe at
    # the end bounds the window the legs actually ran under, and a collapse
    # in EITHER probe demotes the headline (ADVICE r4: a mid-bench collapse
    # must not leave relay_degraded: false)
    link_end = _probe_relay_link()
    out["relay_d2h_mb_s_end"] = link_end["relay_d2h_mb_s"]
    out["relay_degraded_end"] = link_end["relay_degraded"]
    out["relay_degraded"] = bool(out["relay_degraded"]
                                 or link_end["relay_degraded"])

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("mpixel_s"):
            out["vs_baseline"] = round(mpix_s / base["mpixel_s"], 3)
    out.setdefault("vs_baseline", 0.0)
    if os.path.exists(BASELINE_TORCH_FILE):
        with open(BASELINE_TORCH_FILE) as f:
            tbase = json.load(f)
        if tbase.get("mpixel_s"):
            out["vs_torch_cpu"] = round(mpix_s / tbase["mpixel_s"], 3)
    # training axis (VERDICT r4 item 7): our measured TPU train-step rate
    # (scripts/bench_train.py writes docs/artifacts/train_bench_latest.json
    # when run on the chip — a committed measurement, so it is labeled with
    # its own provenance fields rather than presented as taken this run)
    # over the reference source's optimize_parameters on torch-CPU
    # (scripts/measure_torch_train_baseline.py -> BASELINE_TORCH_TRAIN.json)
    if (os.path.exists(TRAIN_BENCH_FILE)
            and os.path.exists(BASELINE_TORCH_TRAIN_FILE)):
        with open(TRAIN_BENCH_FILE) as f:
            tb = json.load(f)
        with open(BASELINE_TORCH_TRAIN_FILE) as f:
            tt = json.load(f)
        if tb.get("steps_per_s") and tt.get("steps_per_s"):
            out["train_steps_s_committed"] = tb["steps_per_s"]
            out["train_bench_provenance"] = \
                f"{tb.get('stage', '?')}@{tb.get('hardware', '?')}, " \
                f"{tb.get('date', '?')}"
            out["vs_torch_cpu_train"] = round(
                tb["steps_per_s"] / tt["steps_per_s"], 3)

    if flops_batch:
        import jax

        pallas_fl = analytic_pallas_flops(model, BATCH, H, W)
        if pallas_fl:
            flops_batch += pallas_fl
            out["pallas_analytic_flops_per_image"] = round(pallas_fl / BATCH)
        out["flops_per_image"] = round(flops_batch / BATCH)
        kind = jax.devices()[0].device_kind.lower()
        for sub, peak, prec in _PEAK_FLOPS:
            if sub in kind:
                out["mfu_pct"] = round(
                    flops_batch / best_s / peak * 100, 3)
                out["mfu_peak_assumption"] = f"{peak / 1e12:.0f}T {prec} " \
                                             f"({kind})"
                break

    if out["relay_degraded"]:
        # VERDICT r4 item 6: a driver-of-record headline taken while the
        # link probe fails its own threshold is luck, not protocol — demote
        # it (and the ratios derived from it).  `value` stays for healthy
        # windows only.
        out["degraded"] = True
        out["degraded_value"] = out["value"]
        out["value"] = 0.0
        for k in ("vs_baseline", "vs_torch_cpu"):
            if k in out:
                out[f"degraded_{k}"] = out[k]
                out[k] = 0.0

    print(json.dumps(out))


if __name__ == "__main__":
    main()
