#!/usr/bin/env python
"""Pose-error trajectory figure for the round-3 LLFF/NDC runs:
reference-faithful budget (llff_ref_r3) vs the round-2 drifting run.

    python scripts/plot_llff_r3.py
"""
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
C_NEW, C_OLD = "#2a78d6", "#eb6834"
INK, INK2, GRID = "#1a1a19", "#6b6a63", "#e5e4dd"


def read_rot(path):
    """rot_deg trajectory of the LAST run appended into log.jsonl."""
    its, rots = [], []
    last_it = None
    for line in open(path):
        r = json.loads(line)
        if "rot_deg" not in r:
            continue
        if last_it is not None and r["it"] <= last_it and r["it"] == 0:
            its, rots = [], []          # run restarted; keep the new one
        last_it = r["it"]
        its.append(r["it"])
        rots.append(r["rot_deg"])
    return its, rots


def main():
    new = os.path.join(ROOT, "output/synthetic/llff_ref_r3/log.jsonl")
    old = os.path.join(ROOT,
                       "docs/evidence/synthetic/llff_ndc_r2b/log.jsonl")
    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=130)
    for path, color, label in [
        (old, C_OLD, "round-2 protocol (4k rays, no anchor) — drifts"),
        (new, C_NEW,
         "round-3: reference budget (18.3k rays ×8 accum) + pose anchor"),
    ]:
        if not os.path.exists(path):
            continue
        its, rots = read_rot(path)
        ax.plot(its, rots, color=color, lw=1.8, label=label)
    ax.set_xlabel("iteration", color=INK)
    ax.set_ylabel("rotation error after sim(3) alignment (deg)", color=INK)
    ax.set_title("LLFF/NDC joint optimization: pose error vs iteration",
                 color=INK, loc="left")
    ax.grid(color=GRID, lw=0.8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK2)
    ax.tick_params(colors=INK2)
    ax.legend(frameon=False, loc="upper left", fontsize=9)
    out = os.path.join(ROOT, "docs", "llff_ndc_r3.png")
    fig.tight_layout()
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
