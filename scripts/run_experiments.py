#!/usr/bin/env python
"""Multi-experiment scheduler (the reference's gpu_scheduler, SURVEY §2.6).

Runs a list of (train and/or eval) configurations as subprocesses over a
set of accelerator slots.  On a single-chip TPU host there is one slot;
with multiple hosts/slots, set --slots and per-slot env (the reference polls
free GPUs every 3 s, scripts/gpu_scheduler.py:73-108 — same loop here).

Usage:
    python scripts/run_experiments.py --mode=both --scenes lego chair ... \
        --yaml configs/bat_blender_VM.yaml --slots 1 [-- extra --k=v args]
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time


def build_commands(args, extra):
    cmds = []
    for scene in args.scenes:
        name = f"{args.prefix}{scene}"
        common = [f"--yaml={args.yaml}", f"--data.scene={scene}",
                  f"--name={name}", f"--group={args.group}"] + extra
        if args.mode in ("train", "both"):
            cmds.append([sys.executable, "train.py"] + common)
        if args.mode in ("eval", "both"):
            cmds.append([sys.executable, "evaluate.py"] + common)
    return cmds


def run_scheduler(cmds, n_slots: int, poll_s: float = 3.0):
    running: dict[int, subprocess.Popen] = {}
    queue = list(cmds)
    results = []
    while queue or running:
        for slot in list(running):
            proc = running[slot]
            if proc.poll() is not None:
                results.append((proc.args, proc.returncode))
                print(f"[sched] slot {slot} finished rc={proc.returncode}")
                del running[slot]
        while queue and len(running) < n_slots:
            slot = next(s for s in range(n_slots) if s not in running)
            cmd = queue.pop(0)
            print(f"[sched] slot {slot} <- {' '.join(cmd[:4])} ...")
            env = None
            running[slot] = subprocess.Popen(cmd, env=env)
        time.sleep(poll_s)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--yaml", required=True)
    ap.add_argument("--scenes", nargs="+", required=True)
    ap.add_argument("--mode", choices=["train", "eval", "both"],
                    default="both")
    ap.add_argument("--slots", type=int, default=1)
    ap.add_argument("--group", default="experiments")
    ap.add_argument("--prefix", default="")
    args, extra = ap.parse_known_args()
    if extra and extra[0] == "--":
        extra = extra[1:]
    cmds = build_commands(args, extra)
    results = run_scheduler(cmds, args.slots)
    failed = [(c, rc) for c, rc in results if rc != 0]
    print(f"[sched] done: {len(results) - len(failed)} ok, {len(failed)} failed")
    for c, rc in failed:
        print(f"  rc={rc}: {' '.join(map(str, c))}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
