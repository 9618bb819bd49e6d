"""Format one endurance leg's evidence as markdown for endurance_r5.md.

Reads the leg's ``log_loss.csv`` (trainer CSVLogger schema) and the
``validation iterN: ...`` lines from its train log, and prints:

  * a loss table sampled at ~8 evenly spaced iterations,
  * the eval table (every validation line),
  * the check_aux_convergence verdict.

    python scripts/endurance_tables.py checkpoint/endurance_r4_stage1
"""

from __future__ import annotations

import csv
import glob
import re
import subprocess
import sys


def main(argv=None):
    d = (argv or sys.argv[1:])[0].rstrip("/")
    with open(f"{d}/log_loss.csv") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        print("(empty loss csv)")
        return
    cols = [c for c in ("iter", "total", "distortion", "rate", "bpp",
                        "qbpp", "aux", "perceptual", "g_loss", "d_loss")
            if c in rows[0]]
    picks = sorted({0, len(rows) - 1}
                   | {round(i * (len(rows) - 1) / 7) for i in range(8)})
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for i in picks:
        r = rows[i]
        out = []
        for c in cols:
            v = float(r[c])
            out.append(f"{v:.0f}" if c == "iter"
                       else f"{v:.4g}")
        print("| " + " | ".join(out) + " |")
    print()
    evals = []
    for log in sorted(glob.glob(f"{d}/train_*.log")):
        for line in open(log, errors="replace"):
            m = re.search(r"validation iter(\d+): (.*)", line)
            if m:
                evals.append((int(m.group(1)), m.group(2).strip()))
    if evals:
        print("| iter | held-out eval (27 tiles / 8 sources) |")
        print("|---|---|")
        for it, s in sorted(dict(evals).items()):
            print(f"| {it} | {s} |")
    print()
    try:
        out = subprocess.run(
            [sys.executable, "scripts/check_aux_convergence.py",
             f"{d}/log_loss.csv"], capture_output=True, text=True,
            timeout=120)
        print("```\n" + (out.stdout or out.stderr).strip() + "\n```")
    except Exception as e:  # noqa: BLE001 — artifact helper, best effort
        print(f"(aux check unavailable: {e})")


if __name__ == "__main__":
    main()
