#!/usr/bin/env python
"""Is the compaction top_k a hidden cost of the compacted step?

The compaction score is BINARY (valid 0/1, renderer.py "sample
compaction"): top_k + sort can be replaced by cumsum + k-th-valid index
search, which needs no sort at all and comes out in march order.  Three
candidates at the production shape [2048, 1000] -> K=256:

  topk      lax.top_k(score, K) + sort(topi)              (current)
  searchso  vmap(searchsorted)(cumsum(valid), 1..K)       (binary search)
  countmat  topi[k] = sum_s (csum[s] < k+1)               (compare-matrix)

All three must agree on indices where k <= n_valid.
"""
import sys
import time

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n, S, K = 2048, 1000, 256
    rng = np.random.default_rng(0)
    # realistic validity: contiguous-ish alive runs, ~15% alive
    valid = (rng.random((n, S)) < 0.15)
    valid = jnp.asarray(valid)

    @jax.jit
    def f_topk(v):
        score = v.astype(jnp.float32)
        _, topi = jax.lax.top_k(score, K)
        return jnp.sort(topi, axis=-1)

    @jax.jit
    def f_search(v):
        csum = jnp.cumsum(v.astype(jnp.int32), axis=-1)
        ks = jnp.arange(1, K + 1)
        topi = jax.vmap(lambda c: jnp.searchsorted(c, ks, side="left"))(csum)
        return jnp.minimum(topi, S - 1)

    @jax.jit
    def f_count(v):
        csum = jnp.cumsum(v.astype(jnp.int32), axis=-1)
        ks = jnp.arange(1, K + 1, dtype=jnp.int32)
        # topi[n,k] = #\{s : csum[s] < k\}  (first index with csum >= k)
        topi = jnp.sum((csum[:, :, None] < ks[None, None, :])
                       .astype(jnp.int32), axis=1)
        return jnp.minimum(topi, S - 1)

    # correctness: only the genuinely-VALID selections are contract-relevant.
    # With binary scores and n_valid < K, lax.top_k's zero-score picks
    # tie-break toward LOW indices, so after the march-order sort those
    # invalid padding indices interleave BEFORE the valid ones — an
    # elementwise prefix compare would print match=False for equivalent
    # implementations.  Compare the valid subsequence of the top_k result
    # against the first min(K, n_valid) searchsorted/countmat entries
    # (which are valid by construction).
    a, b, c = np.asarray(f_topk(valid)), np.asarray(f_search(valid)), \
        np.asarray(f_count(valid))
    v_np = np.asarray(valid)
    nv = v_np.sum(-1)
    ok_sb = ok_cb = True
    for i in range(n):
        m = min(K, int(nv[i]))
        a_valid = a[i][v_np[i, a[i]]][:m]
        ok_sb &= bool((a_valid == b[i, :m]).all())
        ok_cb &= bool((a_valid == c[i, :m]).all())
    print(f"match searchsorted={ok_sb} countmat={ok_cb}")

    for name, f in [("topk", f_topk), ("searchso", f_search),
                    ("countmat", f_count)]:
        r = f(valid)
        r.block_until_ready()
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(20):
                r = f(valid)
            float(jnp.sum(r))   # host sync through the tunnel
            reps.append((time.perf_counter() - t0) / 20)
        reps.sort()
        print(f"{name:10s}: {reps[2]*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
