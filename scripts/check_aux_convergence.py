"""Aux (quantile) loss convergence guard for endurance training runs.

The entropy-bottleneck aux loss gates codec-table quality: it measures how far
the learned quantiles sit from the true tail quantiles of z, and
``EntropyBottleneckCodec.update()`` builds the rANS CDF tables from those
quantiles.  A run whose aux loss is still climbing at the end produces tables
whose tail mass is wrong — streams still decode, but the real bitrate
diverges from the predicted bitrate.

Observed behavior (round-2 stage-1 endurance run, 20k steps): aux is NOT
monotone — it chases the rate schedule.  While HificRateLoss pushed qbpp from
1.0 to the 1.5 target (iters 7.5k-15k), the z distribution widened faster
than the lr=1e-3 quantile optimizer could track, so aux climbed to ~19.6k.
Once the rate plateaued (~iter 15k), the quantiles caught up and aux
collapsed 19.6k -> 17 over the final 5k steps.  (The apparent double-peak at
15-16.5k in the raw CSV is the OOM-resume overlap re-logging the same
segment, not a second excursion.)  The guard therefore checks the SHAPE —
final-quartile aux must trend down and finish well below the run peak — not
a monotone decrease.

Usage:  python scripts/check_aux_convergence.py <log_loss.csv> [...]
Exit 0 when every run passes; prints a diagnosis per file.
"""

from __future__ import annotations

import csv
import sys

import numpy as np


def check_aux_convergence(csv_path: str, final_frac: float = 0.25,
                          peak_ratio: float = 0.2, abs_ok: float = 50.0):
    """Returns (ok, diagnosis) for one training-loss CSV.

    Criteria over the final ``final_frac`` of iterations:
      1. linear-fit slope of aux is non-positive (still-climbing quantiles
         mean the tables will be built from an unconverged fit);
      2. the final logged aux either resolved the chase (below
         ``peak_ratio`` * run peak) or is simply small in absolute terms
         (< ``abs_ok`` — warm-started stage-2/3 runs inherit converged
         quantiles, never spike, and hover at ~20 throughout).
    """
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    if not rows or "aux" not in rows[0]:
        return False, "no aux column logged"
    iters = np.array([float(r["iter"]) for r in rows])
    aux = np.array([float(r["aux"]) for r in rows])
    # de-duplicate resume overlaps: keep the LAST logged value per iter
    order = np.argsort(iters, kind="stable")
    iters, aux = iters[order], aux[order]
    keep = np.concatenate([iters[1:] != iters[:-1], [True]])
    iters, aux = iters[keep], aux[keep]

    cut = iters.min() + (1.0 - final_frac) * (iters.max() - iters.min())
    tail = iters >= cut
    if tail.sum() < 3:
        return False, f"only {int(tail.sum())} samples in the final window"
    slope = np.polyfit(iters[tail], aux[tail], 1)[0]
    peak = float(aux.max())
    final = float(aux[-1])
    # slope tolerance: a flat-but-oscillating tail fits to an epsilon-positive
    # slope; only a genuine climb (>1e-3 aux/iter) should fail
    ok = slope <= 1e-3 and (final <= peak_ratio * peak or final <= abs_ok)
    diag = (f"final-{final_frac:.0%} slope={slope:.3f}/iter, "
            f"final={final:.1f} vs peak={peak:.1f} "
            f"({final / max(peak, 1e-9):.1%})")
    return ok, diag


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 2
    bad = 0
    for path in argv[1:]:
        ok, diag = check_aux_convergence(path)
        print(f"{'PASS' if ok else 'FAIL'} {path}: {diag}")
        bad += 0 if ok else 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
