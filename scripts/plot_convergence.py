#!/usr/bin/env python
"""Render the blur-vs-noblur pose-convergence figure for docs/CONVERGENCE.md.

Reads rot_deg trajectories from the two 20k runs' log.jsonl and writes
docs/convergence_rot.png.

    python scripts/plot_convergence.py \
        [--blur output/synthetic/convergence_20k/log.jsonl] \
        [--noblur output/synthetic/convergence_20k_noblur/log.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# categorical slots 1 (blue) / 2 (orange) of the validated default palette
C_BLUR, C_NOBLUR = "#2a78d6", "#eb6834"
INK, INK2, GRID = "#1a1a19", "#6b6a63", "#e5e4dd"


def read_rot(path):
    """rot_deg trajectory of the LAST run in the file (log.jsonl appends
    across re-runs; an iteration counter reset marks a new run)."""
    its, rots = [], []
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if "rot_deg" not in d:
                continue
            if its and d["it"] < its[-1]:
                its, rots = [], []      # new run started — drop the old one
            its.append(d["it"])
            rots.append(d["rot_deg"])
    return its, rots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blur",
                    default="output/synthetic/convergence_20k/log.jsonl")
    ap.add_argument("--noblur",
                    default="output/synthetic/convergence_20k_noblur/log.jsonl")
    ap.add_argument("--out", default="docs/convergence_rot.png")
    ap.add_argument("--title",
                    default="Joint pose+field optimization: pose recovery "
                            "from se(3) σ=0.15 noise (solids, 100 views)")
    args = ap.parse_args()

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=150)
    fig.patch.set_facecolor("white")
    ax.set_facecolor("white")

    series = []
    if os.path.exists(args.blur):
        series.append(("With c2f blur (full BAT)", C_BLUR, *read_rot(args.blur)))
    if os.path.exists(args.noblur):
        series.append(("No blur (naive joint)", C_NOBLUR,
                       *read_rot(args.noblur)))

    for label, color, its, rots in series:
        ax.plot(its, rots, color=color, linewidth=2, label=label,
                solid_capstyle="round")
        # selective direct label: terminal value only
        ax.annotate(f"{rots[-1]:.3f}°", (its[-1], rots[-1]),
                    textcoords="offset points", xytext=(6, 0),
                    color=INK2, fontsize=9, va="center")

    ax.set_yscale("log")
    ax.set_xlabel("iteration", color=INK2, fontsize=10)
    ax.set_ylabel("mean rotation error (deg, sim3-aligned)", color=INK2,
                  fontsize=10)
    ax.set_title(args.title, color=INK, fontsize=11, loc="left")
    ax.grid(True, which="major", color=GRID, linewidth=0.8)
    ax.tick_params(colors=INK2, labelsize=9)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    if len(series) > 1:
        ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    ax.margins(x=0.08)

    fig.tight_layout()
    fig.savefig(args.out, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
