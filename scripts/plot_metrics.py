"""Plot the experiment figures from metrics JSONs (reference
scripts/draw/figure.py:82-636, figures 12-15).

Each panel: x = sweep variable (qps / dp / slo / distribution), y = the four
report metrics, one line per policy.

Usage:
    python scripts/plot_metrics.py outputs/e2e --x qps --out fig_e2e.png

Expects files named metrics_{model}_{policy}_{x}.json as written by
scripts/e2e.sh and friends, or sim_{model}_{policy}_{x}.json from
scripts/sim_policy_matrix.py (simulator artifacts add the machine-true
SLO panels; --machine plots those instead of the H100-table ones).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
from collections import defaultdict

METRICS = ["slo_attainment", "avg_latency_s", "goodput_rps", "throughput_rps"]
# machine-true variants (simulator / probe artifacts): deadlines from THIS
# machine's profiled standalone latencies, the axis the policy schedules to
MACHINE_METRICS = ["slo_attainment_machine", "p99_latency_s",
                   "goodput_machine_rps", "throughput_rps"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--x", default="qps", help="sweep variable name (label only)")
    ap.add_argument("--out", default="figure.png")
    ap.add_argument("--machine", action="store_true",
                    help="plot machine-true SLO/goodput panels")
    ap.add_argument("--model", default=None,
                    help="only plot series for this model (e.g. sdxl)")
    args = ap.parse_args()
    metrics = MACHINE_METRICS if args.machine else METRICS

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # metrics_{model}_{policy}_{x}.json | sim_{model}_{policy}_{x}.json
    pat = re.compile(
        r"(?:metrics|sim)_(?P<model>[^_]+)_(?P<policy>.+)_(?P<x>[0-9.]+)\.json$")
    series = defaultdict(list)  # (model, policy) -> [(x, metrics)]
    for path in sorted(glob.glob(os.path.join(args.dir, "metrics_*.json"))
                       + glob.glob(os.path.join(args.dir, "sim_*.json"))):
        m = pat.search(os.path.basename(path))
        if not m:
            continue
        if args.model and m.group("model") != args.model:
            continue
        with open(path) as f:
            data = json.load(f)
        try:
            xv = float(m.group("x").lstrip("dp").lstrip("slo"))
        except ValueError:
            xv = m.group("x")
        series[(m.group("model"), m.group("policy"))].append((xv, data))

    if not series:
        raise SystemExit(f"no metrics_*.json / sim_*.json under {args.dir}")

    fig, axes = plt.subplots(1, len(metrics), figsize=(5 * len(metrics), 4))
    has_modeled = False
    for (model, policy), rows in sorted(series.items()):
        rows.sort(key=lambda r: (isinstance(r[0], str), r[0]))
        xs = [r[0] for r in rows]
        # The distrifusion arm is simulator-only (cost model from the
        # reference's per-res batch caps + warmup sync steps; its value is
        # multi-GPU, unmeasurable on one chip) — label it as modeled so the
        # figure never reads as a hardware measurement.
        name = f"{model}/{policy}"
        style = {}
        if policy == "distrifusion":
            name += " (modeled)"
            style = {"linestyle": "--"}
            has_modeled = True
        for ax, metric in zip(axes, metrics):
            ys = [r[1].get(metric) for r in rows]
            ax.plot(xs, ys, marker="o", label=name, **style)
    for ax, metric in zip(axes, metrics):
        ax.set_xlabel(args.x)
        ax.set_ylabel(metric)
        ax.grid(alpha=0.3)
    axes[0].legend(fontsize=8)
    if has_modeled:
        fig.suptitle(
            "dashed = modeled arm (DistriFuser cost model: reference per-res "
            "batch caps + 4 warmup sync steps; not a chip measurement)",
            fontsize=8, y=1.02)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
