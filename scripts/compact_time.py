#!/usr/bin/env python
"""Quick pipelined timing of the compacted train step only (bench.py's
cfg_c protocol) — for fast perf iteration between profile runs."""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax


def main():
    from scripts.compact_profile import build
    state, it = build()
    st = state
    for i in range(3):
        st, m = it(st, i)
        float(m["loss"])
    batch = []
    for r in range(5):
        t0 = time.perf_counter()
        for i in range(10):
            st, m = it(st, 100 + r * 10 + i)
        float(m["loss"])
        batch.append((time.perf_counter() - t0) / 10)
    batch.sort()
    print(f"compacted step (ms): {[round(b*1000,1) for b in batch]} "
          f"-> median {batch[len(batch)//2]*1000:.1f}")


if __name__ == "__main__":
    main()
