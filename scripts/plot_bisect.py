#!/usr/bin/env python
"""Render the app_k bisect validation-PSNR figure for docs/CONVERGENCE.md.

Reads mid-training val_psnr rows from the round-4 bisect arms' committed
evidence logs and writes docs/bisect_val_r4.png.

    python scripts/plot_bisect.py
"""
from __future__ import annotations

import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EV = os.path.join(REPO, "docs", "evidence", "synthetic")

# categorical palette slots (same family as plot_convergence.py)
ARMS = [
    ("convergence_20k_r4_appk64", "app_k = 64 (static cap)", "#eb6834"),
    ("convergence_20k_r4_appk128", "app_k = 128", "#b58900"),
    ("convergence_20k_r4_appknone", "dense appearance (no cap)", "#2a78d6"),
    ("convergence_20k_r4_appk64_blurmask",
     "app_k = 64 + blur-mask culling", "#8a5cc9"),
    ("convergence_20k_r5_default",
     "shipped defaults (auto-raise 64→128→192)", "#2e9e62"),
]
INK, INK2, GRID = "#1a1a19", "#6b6a63", "#e5e4dd"


def read_val(path):
    its, vals = [], []
    for line in open(path):
        d = json.loads(line)
        if "val_psnr" in d:
            if its and d["it"] <= its[-1]:   # re-run: keep the last run
                its, vals = [], []
            its.append(d["it"])
            vals.append(d["val_psnr"])
    return its, vals


def main():
    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=150)
    plotted = 0
    for name, label, color in ARMS:
        p = os.path.join(EV, name, "log.jsonl")
        if not os.path.exists(p):
            continue
        its, vals = read_val(p)
        if not its:
            continue
        ax.plot(its, vals, color=color, lw=1.8, label=label)
        ax.annotate(f"{vals[-1]:.1f}", (its[-1], vals[-1]),
                    textcoords="offset points", xytext=(4, -2),
                    fontsize=8, color=color)
        plotted += 1
    if not plotted:
        raise SystemExit("no arm logs with val rows found")
    ax.set_xlabel("iteration", color=INK)
    ax.set_ylabel("validation PSNR (dB, sim3-aligned, no test-time optim)",
                  color=INK)
    ax.set_title("app_k bisect: training-time appearance cap vs quality "
                 "(round 4, identical seed/protocol)", color=INK, fontsize=10)
    ax.grid(color=GRID, lw=0.6)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK2)
    ax.tick_params(colors=INK2)
    ax.legend(frameon=False, fontsize=8, loc="lower right")
    out = os.path.join(REPO, "docs", "bisect_val_r4.png")
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out} ({plotted} arms)")


if __name__ == "__main__":
    main()
