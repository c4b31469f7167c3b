#!/usr/bin/env python
"""Copy curated convergence artifacts from output/ into docs/evidence/.

output/ is gitignored (run artifacts are large and transient); the files
CONVERGENCE.md cites must live in-repo (VERDICT round-1 missing #6), so
this collects the small evidentiary subset: log.jsonl, options.json,
quant files, pose plots.

    python scripts/collect_evidence.py synthetic/llff_ndc_r2b synthetic/...
"""
import os
import shutil
import sys

KEEP = ("log.jsonl", "options.json", "quant.json", "quant.txt",
        "quant_eval.json", "quant_pose.txt", "poses.png")


def main(runs):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for run in runs:
        src = os.path.join(root, "output", run)
        dst = os.path.join(root, "docs", "evidence", run)
        if not os.path.isdir(src):
            print(f"[skip] {src} missing")
            continue
        os.makedirs(dst, exist_ok=True)
        for f in KEEP:
            p = os.path.join(src, f)
            if os.path.exists(p):
                shutil.copyfile(p, os.path.join(dst, f))
                print(f"[ok] {run}/{f}")


if __name__ == "__main__":
    main(sys.argv[1:])
