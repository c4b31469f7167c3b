#!/usr/bin/env python
"""Training-throughput benchmark (single chip).

Times the full jitted BAT training step (render + joint VJP + both Adam
updates) at the Blender headline configuration's phases and reports a
schedule-weighted rays/sec.

Prints ONE JSON line:
  {"metric": "rays_per_sec_train", "value": N, "unit": "rays/s",
   "vs_baseline": N / BASELINE_RAYS_PER_SEC}

BASELINE_RAYS_PER_SEC is the estimated CUDA-reference throughput of the
same workload (see BENCH_NOTES.md for the derivation; the reference repo
publishes no numbers, BASELINE.md "Quality numbers").

Capture protocol (round 5, un-voidable by construction — VERDICT round-4
#2; the round-4 capture was killed mid-run and recorded `parsed: null`
despite three finished phase measurements):
  * phases are measured MOST-IMPORTANT-FIRST: compacted (70% of the
    schedule) -> early (22.5%) -> dense variants (7.5%);
  * after EVERY phase median, a complete, parseable partial record is
    written to docs/bench/last_bench.json (missing phases carried from
    the previous record, marked as such) — killing this process at any
    point after the first phase leaves honest evidence;
  * the backend-down retry budget is capped (~2 min of sleeps, not 13);
  * JTF_BENCH_SMALL (CPU smoke mode) NEVER writes the last-good file.

Headline shapes (round 5): the shipped-defaults trajectory of
bat_blender_VM.yaml.  The reference never shrinks its bbox at this config
(its alpha-mask updates at it 12k/20k are skipped by the <256^3 gate,
reference tensorf.py:482), so the final grid is the full 400^3 — earlier
rounds modeled a "post-shrink 300^3" that the headline schedule cannot
reach.  Masks are built at the trainer's capped resolution
(models/alpha_mask.capped_mask_res; ADVICE round-4 high).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Estimated reference (1x RTX3090-class GPU) training throughput for
# bat_blender_VM: 2048 rays/iter; see BENCH_NOTES.md.
BASELINE_RAYS_PER_SEC = 12000.0

# v5e peak rates for the roofline anchors reported in `detail` (public
# chip specs): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_SEC = 819e9

_REPO = os.path.dirname(os.path.abspath(__file__))
_LAST_GOOD = os.path.join(_REPO, "docs", "bench", "last_bench.json")
_SMALL = os.environ.get("JTF_BENCH_SMALL") == "1"


def _probe_backend(timeout_s: float = 120.0) -> bool:
    """True if the accelerator answers a trivial op within timeout.

    The axon TPU tunnel can die mid-session (its relay's stdio peer is
    external); when it does, device ops hang or raise UNAVAILABLE.  Probe in
    a daemon thread so a hung backend can't wedge the whole benchmark.

    NOTE a subprocess probe does NOT work here: the axon sitecustomize
    registers a relay session in EVERY python interpreter (including this
    one), and a nested python child hangs at backend init behind its
    parent's registration (measured: bash->python probes answer in ~15 s,
    python->python probes hang past 180 s).  Retries therefore re-exec this
    process instead (see _retry_or_emit_stale)."""
    import threading

    ok = [False]

    def _try():
        try:
            import jax.numpy as jnp
            ok[0] = float(jnp.ones((8, 8)).sum()) == 64.0
        except Exception:
            pass

    t = threading.Thread(target=_try, daemon=True)
    t.start()
    t.join(timeout_s)
    return ok[0]


# Retry-with-backoff, CAPPED: the round-4 bench burned ~12.5 min re-exec'ing
# through backend flaps and was killed by the driver before measuring the
# phase that matters.  Total sleep budget here is ~105 s (+ probe timeouts);
# if the tunnel stays down that long, emit the last-good record and exit —
# the driver's wall clock is the scarcer resource.
_RETRY_DELAYS = [15, 30, 60]


def _retry_or_emit_stale():
    attempt = int(os.environ.get("JTF_BENCH_ATTEMPT", "0"))
    if attempt < len(_RETRY_DELAYS):
        d = _RETRY_DELAYS[attempt]
        print(f"[bench] backend down; retry {attempt + 1}/"
              f"{len(_RETRY_DELAYS)} in {d}s (re-exec)", file=sys.stderr)
        time.sleep(d)
        env = dict(os.environ, JTF_BENCH_ATTEMPT=str(attempt + 1))
        sys.stderr.flush()
        sys.stdout.flush()
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)], env)
    _emit_unavailable()


def _emit_unavailable():
    """Tunnel stayed down: emit the last persisted measurement, marked
    stale, instead of a zero that erases the round's perf evidence."""
    try:
        with open(_LAST_GOOD) as f:
            last = json.load(f)
        last["stale"] = True
        last["note"] = ("accelerator backend unavailable after retries "
                        "(tunnel down); value is the most recent successful "
                        "measurement, captured at "
                        f"{last.get('captured_at', 'unknown')}")
        print(json.dumps(last))
    except Exception:
        print(json.dumps({
            "metric": "rays_per_sec_train", "value": 0, "unit": "rays/s",
            "vs_baseline": 0.0,
            "note": "accelerator backend unavailable (tunnel down?) and no "
                    "recorded last-good measurement; see BENCH_NOTES.md"}))
    os._exit(0)


def simulate_schedule_weights(max_iter: int = 40000, seed: int = 0):
    """Derive the phase weights by simulating the ACTUAL per-iteration
    schedule of the headline config (bat_blender_VM.yaml) instead of
    hand-assigning them (VERDICT round-3 #8).

    Classification replicates trainer.train_iteration exactly:
      * blur_active = max(c2f_density * random_scale, c2f_color) >= 1e-3
        (trainer._blur_spec / _c2f_params; reference tensorf.py:205-220
        kernel-drop eps — note the random scale pool multiplies the DENSITY
        parameter only, both here and in the reference tensorf.py:193-199,
        so color blur keeps the kernel alive whenever its schedule is
        >= eps regardless of the density draw).
      * the alpha mask exists from update_alphamask_iters[0]; compaction
        runs only when the mask exists AND blur is off (the reference
        disables culling while blur is active, batBase.py:76-82).
      * "early" = before the last upsample (growing resolution).

    With the headline schedules ([0.3, 0.15, 0.07, 0, ...] over 11 points,
    i.e. 0 from progress 0.3 = it 12,000) blur is FULLY annealed exactly
    when the mask arrives, so the post-12k regime is sharp+compacted for
    every iteration.  The round-3 BENCH_NOTES "alternative weighting"
    (blur active on 5/6 of post-12k iterations) assumed the density draw
    kept re-activating blur after annealing; the schedule values refute
    that — it can only happen while the schedule itself is >= eps.
    """
    sched_d = [0.3, 0.15, 0.07, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    sched_c = list(sched_d)
    scale_pool = [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]
    upsample_iters = [2000, 6000, 7500, 9000]
    first_mask_iter = 12000
    eps = 1e-3
    rng = np.random.default_rng(seed)

    def interp(x, sched):
        xs = np.linspace(0.0, 1.0, len(sched))
        return float(np.interp(x, xs, sched))

    counts = {"early": 0, "dense_blur": 0, "dense_sharp": 0, "compacted": 0}
    for it in range(max_iter):
        progress = it / max_iter
        d = interp(progress, sched_d) * float(rng.choice(scale_pool))
        c = interp(progress, sched_c)
        blur = max(d, c) >= eps
        if it < upsample_iters[-1]:
            counts["early"] += 1
        elif it >= first_mask_iter and not blur:
            counts["compacted"] += 1
        elif blur:
            counts["dense_blur"] += 1
        else:
            # final resolution, blur annealed, mask not built yet
            counts["dense_sharp"] += 1
    return {k: v / max_iter for k, v in counts.items()}


class _Capture:
    """Incremental result assembly + per-phase persistence.

    ``phases`` maps phase name -> measurement dict (fresh this session).
    Missing phases are carried from the previous last-good record so a
    partial capture still yields a complete, honest headline (carried
    entries are listed in ``carried_phases``).
    """

    PHASE_KEYS = {"compacted": "ms_compacted", "early": "ms_early",
                  "dense": "ms_dense"}

    def __init__(self, n_rays, shape_sig=None):
        self.n_rays = n_rays
        self.shape_sig = shape_sig
        self.fresh = {}
        self.extras = {}
        self.carried = {}
        if not _SMALL:
            try:
                with open(_LAST_GOOD) as f:
                    prev = json.load(f)
                det = prev.get("detail", {})
                # only carry phases measured at the SAME workload shapes —
                # mixing e.g. a 300^3 dense time into a 400^3 headline
                # would publish a rays/s of no real workload
                prev_sig = [det.get("res"), det.get("n_rays"),
                            det.get("n_samples")]
                if shape_sig is None or prev_sig == list(shape_sig):
                    for ph, key in self.PHASE_KEYS.items():
                        if det.get(key) is not None:
                            self.carried[ph] = {
                                "median_s": det[key] / 1000.0,
                                "captured_at": prev.get("captured_at",
                                                        "unknown")}
            except Exception:
                pass

    def phase_time(self, ph):
        if ph in self.fresh:
            return self.fresh[ph]["median_s"], False
        if ph in self.carried:
            return self.carried[ph]["median_s"], True
        return None, None

    def record(self, ph, measurement):
        self.fresh[ph] = measurement
        self.persist(partial=True)

    def result(self, partial):
        w = simulate_schedule_weights()
        times, carried_phases = {}, []
        # a phase with neither a fresh nor carried value is billed at the
        # SLOWEST known phase time (conservative: understates throughput)
        known = [self.phase_time(p)[0] for p in self.PHASE_KEYS
                 if self.phase_time(p)[0] is not None]
        worst = max(known) if known else None
        for ph in self.PHASE_KEYS:
            t, was_carried = self.phase_time(ph)
            if t is None:
                t, was_carried = worst, True
            times[ph] = t
            if was_carried:
                carried_phases.append(ph)
        if any(t is None for t in times.values()):
            return None
        t_mix = (w["early"] * times["early"]
                 + (w["dense_blur"] + w["dense_sharp"]) * times["dense"]
                 + w["compacted"] * times["compacted"])
        rays_per_sec = self.n_rays / t_mix
        detail = {self.PHASE_KEYS[ph]: round(times[ph] * 1000, 1)
                  for ph in self.PHASE_KEYS}
        detail["spread_ms"] = {
            ph: [round(m["min_s"] * 1000, 1), round(m["max_s"] * 1000, 1)]
            for ph, m in self.fresh.items()}
        detail["phase_weights_simulated"] = {k: round(v, 4)
                                             for k, v in w.items()}
        detail.update(self.extras)
        result = {
            "metric": "rays_per_sec_train",
            "value": round(rays_per_sec, 1),
            "unit": "rays/s",
            "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            "detail": detail,
        }
        if partial or carried_phases:
            result["partial"] = bool(partial)
            result["carried_phases"] = carried_phases
            if carried_phases:
                result["note"] = (
                    "phases " + ",".join(carried_phases) + " carried from "
                    "a previous capture (this run was interrupted before "
                    "measuring them); fresh phases: "
                    + ",".join(sorted(self.fresh)))
        return result

    def persist(self, partial):
        if _SMALL:
            return  # smoke numbers must NEVER become the stale fallback
        result = self.result(partial)
        if result is None:
            return
        try:
            os.makedirs(os.path.dirname(_LAST_GOOD), exist_ok=True)
            tmp = _LAST_GOOD + ".tmp"
            with open(tmp, "w") as f:
                json.dump(dict(result, captured_at=time.strftime(
                    "%Y-%m-%dT%H:%M:%S%z")), f, indent=1)
            os.replace(tmp, _LAST_GOOD)
        except Exception as e:
            print(f"[bench] could not persist last-good: {e}",
                  file=sys.stderr)
        return result


def main():
    from joint_tensorf_tpu.utils import setup_jax
    setup_jax()

    if not _probe_backend():
        _retry_or_emit_stale()

    import jax
    import jax.numpy as jnp

    from joint_tensorf_tpu.models import vm as vm_lib
    from joint_tensorf_tpu.train.step import (StepConfig, StepScalars,
                                              init_train_state,
                                              make_train_step)

    # Headline-config shapes (bat_blender_VM.yaml): 100 views at 400x400,
    # density ranks [16]*3, color [48]*3, MLP_Fea h=64, 2048 rays.  The
    # final grid is the schedule's full 400^3 (the reference never shrinks
    # at this config — see module docstring); n_samples = min(1000,
    # |res|/step_ratio) = 1000.
    n_views, H, W = 100, 400, 400
    res = (400, 400, 400)
    n_rays_total = 2048
    n_samples = 1000
    reps, iters_per_rep = 5, 10
    if _SMALL:
        # CPU smoke mode: exercises the FULL bench code path (probes, mask
        # construction, step builds, roofline, JSON emit) at toy shapes so
        # bench edits can be validated without claiming the TPU.  The
        # numbers it prints are NOT measurements and are NEVER persisted.
        n_views, H, W = 8, 64, 64
        res = (48, 48, 48)
        n_rays_total = 256
        n_samples = 256
        reps, iters_per_rep = 2, 2

    vm_cfg = vm_lib.VMConfig()  # defaults match the Blender config
    head = vm_cfg.shading_head()
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    state = init_train_state(jax.random.PRNGKey(0), vm_cfg, res, aabb, n_views)

    rays_per_view = max(1, n_rays_total // n_views)
    n_rays = rays_per_view * n_views
    cap = _Capture(n_rays, shape_sig=(list(res), n_rays, n_samples))

    # per-phase hot-path config matches train/trainer.py _ensure_step:
    # dense/early phases use the dense-grid density expansion + two-stage
    # appearance; the compacted phase drops densify (its O(XYZ) grid build
    # outweighs the savings at compacted sample counts)
    app_k = 64

    from joint_tensorf_tpu.models.alpha_mask import (AlphaMask,
                                                     capped_mask_res,
                                                     dilate_mask,
                                                     pack_neighborhoods)

    def probe_bbox_k(res_p, S, stride=4, mask=None, pad=1.0):
        from joint_tensorf_tpu.data.synthetic import sphere_poses
        from joint_tensorf_tpu.geometry.rays import get_center_and_ray
        from joint_tensorf_tpu.render.renderer import sample_ray
        prng = np.random.default_rng(7)
        poses = jnp.asarray(sphere_poses(n_views))
        focal_p = 0.5 * 800 / np.tan(0.5 * 0.6911) * (W / 800)
        intr_p = jnp.asarray(np.broadcast_to(
            np.array([[focal_p, 0, W / 2], [0, focal_p, H / 2], [0, 0, 1]],
                     dtype=np.float32), (n_views, 3, 3)))
        idx = jnp.asarray(prng.permutation(H * W)[:64])
        c, d = get_center_and_ray(H, W, poses, jnp.linalg.inv(intr_p),
                                  ray_idx=idx)
        c, d = c.reshape(-1, 3), d.reshape(-1, 3)
        ab = jnp.asarray(np.array(aabb, np.float32).reshape(2, 3))
        units = (ab[1] - ab[0]) / (jnp.asarray(res_p, jnp.float32) - 1)
        step_sz = jnp.mean(units) * vm_cfg.step_ratio
        g = stride if S % stride == 0 else 1
        pts, _, inb = sample_ray(ab, step_sz, S, c, d, jax.random.PRNGKey(0),
                                 2.0, 6.0, stratified=False)
        galive = jnp.any(inb.reshape(inb.shape[0], S // g, g), axis=-1)
        if mask is not None:
            # the renderer's exact group gate: first-of-group alpha probe
            # AND any-in-bbox (trainer._probe_compact_k semantics)
            from joint_tensorf_tpu.models.alpha_mask import sample_alpha
            a = sample_alpha(mask, pts[:, ::g].reshape(-1, 3)
                             ).reshape(inb.shape[0], S // g)
            galive = galive & (a > 0)
        mx = int(jnp.max(jnp.sum(galive, axis=-1))) * g
        # bbox: pad 1.0 (geometry-static); mask: pad 1.25 (trainer matches)
        k = min(S, max(128, int(-(-int(mx * pad) // 128) * 128)))
        return None if k >= S else k

    rng = np.random.default_rng(0)
    from joint_tensorf_tpu.data.synthetic import sphere_poses
    pose_base = jnp.asarray(sphere_poses(n_views))
    focal = 0.5 * 800 / np.tan(0.5 * 0.6911) * (W / 800)
    intr = jnp.asarray(np.broadcast_to(
        np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 dtype=np.float32), (n_views, 3, 3)))
    intr_inv = jnp.linalg.inv(intr)
    images = jnp.asarray(rng.random((n_views, H * W, 3)), jnp.float32)
    edges = jnp.zeros((n_views, H * W), jnp.float32)
    view_sel = jnp.arange(n_views)

    # mid-schedule blur widths (sigma_world ~0.05 at the dense phase);
    # the banded matrices are built from traced sigma, cost is
    # sigma-independent.  The compacted phase step ignores these (no blur
    # in its StepConfig).
    s = StepScalars(
        lr_index=jnp.float32(1e-2), lr_basis=jnp.float32(5e-4),
        lr_pose=jnp.float32(1e-3), c2f_density=jnp.float32(0.05),
        c2f_color=jnp.float32(0.05), near_far=jnp.array([2.0, 6.0]),
        l1_weight=jnp.float32(4e-5), tv_density_weight=jnp.float32(0.0),
        tv_color_weight=jnp.float32(0.0), use_edge=jnp.float32(0.0),
        edge_factor=jnp.float32(1.5), non_edge_factor=jnp.float32(0.5),
        view_pe_progress=jnp.float32(1.0), fea_pe_progress=jnp.float32(1.0),
        pose_do_step=jnp.float32(1.0), tv_depth_weight=jnp.float32(0.0))

    def run_iter(st, i, fn, mask):
        idx = jnp.asarray(rng.permutation(H * W)[:rays_per_view]
                          .astype(np.int64))
        key = jax.random.PRNGKey(i)
        return fn(st, pose_base, intr, intr_inv, images, edges, view_sel,
                  idx, key, s, mask)

    def measure(fn, mask, iters=iters_per_rep, reps=reps, st=None):
        """Median-of-``reps`` pipelined batches (+ batch spread).

        Each batch chains ``iters`` steps through the state dependency with
        ONE final sync — what a real dispatch-ahead training loop pays per
        iteration.  The axon-tunnel backend swings ±25% across sessions
        (BENCH_NOTES.md), so the JSON carries median AND min/max batch
        means rather than a single draw.
        """
        st = state if st is None else st
        for i in range(3):
            st, metrics = run_iter(st, i, fn, mask)
            float(metrics["loss"])  # sync each warmup iter
            print(f"[bench] warmup {i} ok", file=sys.stderr)
        batch_means = []
        for r in range(reps):
            t0 = time.perf_counter()
            for i in range(iters):
                st, metrics = run_iter(st, 100 + r * iters + i, fn, mask)
            float(metrics["loss"])
            batch_means.append((time.perf_counter() - t0) / iters)
        batch_means.sort()
        med = batch_means[len(batch_means) // 2]
        print(f"[bench] pipelined batches (ms): "
              f"{[round(b*1000,1) for b in batch_means]} -> median "
              f"{med*1000:.1f}", file=sys.stderr)
        return {"median_s": med, "min_s": batch_means[0],
                "max_s": batch_means[-1], "reps": reps, "iters": iters}

    import dataclasses

    # ---------------- phase 1 (70% weight): compacted — MEASURE FIRST ----
    # alpha mask at the trainer's capped build resolution (ADVICE round-4
    # high: the trainer now builds at capped_mask_res once the grid passes
    # 256^3, so the compacted phase is REAL at the 400^3 headline)
    mres = capped_mask_res(res) if not _SMALL else [32, 32, 32]
    occ = (rng.random(tuple(mres)) < 0.001).astype(np.float32)
    try:
        from scipy import ndimage

        occ = ndimage.binary_dilation(occ > 0, iterations=8).astype(np.float32)
    except Exception:
        pass
    occ_grid = jnp.asarray(occ)
    alpha_mask = AlphaMask(grid=occ_grid, aabb=state.params.field.aabb,
                           packed=pack_neighborhoods(occ_grid))
    compact_k = min(256, n_samples // 2)
    bbox_k = probe_bbox_k(res, n_samples)
    cfg = StepConfig(H=H, W=W, n_views=n_views, rays_per_view=rays_per_view,
                     n_samples=n_samples, pose_opt=True, use_pose_noise=True,
                     densify_density=True, densify_impl="lane", app_k=app_k,
                     blur=None, compact_k=bbox_k)
    print(f"[bench] mask res {mres}, dense bbox compact_k = {bbox_k}",
          file=sys.stderr)
    # the compacted phase spans it 12k-40k, AFTER the alpha-mask updates
    # where the shipped default `app_k_auto` raises the appearance cap to
    # the measured 98th-quantile gate count — 192 on the synthetic 20k
    # protocol (convergence_20k_r5_default: 64 -> 128 -> 192; the fixed-64
    # cap is the bisected -6 dB quality bug).  Bill the headline at the
    # measured auto-raised cap; the 64 variant is carried in detail for
    # round-3/4 comparability.
    app_k_raised = 192 if not _SMALL else app_k
    cfg_c64 = dataclasses.replace(cfg, use_alpha_mask=True,
                                  compact_k=compact_k, blur=None,
                                  densify_density=False, app_k=app_k)
    m_compact64 = measure(make_train_step(cfg_c64, vm_cfg, head), alpha_mask)
    print(f"[bench] compact(app_k=64) {m_compact64['median_s']*1000:.1f} ms",
          file=sys.stderr)
    cap.extras.update({"median_of": m_compact64["reps"],
                       "compact_k": compact_k, "n_rays": n_rays,
                       "n_samples": n_samples, "res": list(res),
                       "mask_res": list(mres),
                       "ms_compacted_appk64": round(
                           m_compact64["median_s"] * 1000, 1)})
    cap.record("compacted", m_compact64)   # partial record ASAP
    if app_k_raised != app_k:
        cfg_c = dataclasses.replace(cfg_c64, app_k=app_k_raised)
        m_compact = measure(make_train_step(cfg_c, vm_cfg, head), alpha_mask)
        cap.extras["app_k_compacted"] = app_k_raised
        cap.record("compacted", m_compact)
        # candidate config (tpu.app_k_dense_only): NO cap at compacted
        # phases — dense fused appearance over the compacted K (exact,
        # zero clipping; rides C=256 fused rows instead of separate
        # C=192 two-stage rows).  Carried in detail; becomes the headline
        # if the default flips after measurement.
        cfg_cn = dataclasses.replace(cfg_c64, app_k=None)
        m_cn = measure(make_train_step(cfg_cn, vm_cfg, head), alpha_mask)
        cap.extras["ms_compacted_appknone_fused"] = round(
            m_cn["median_s"] * 1000, 1)
        # bill the headline at the SHIPPED default (configs/base.yaml
        # tpu.app_k_dense_only); JTF_BENCH_APPK_DENSE_ONLY overrides for
        # experiments
        try:
            import yaml
            with open(os.path.join(_REPO, "configs", "base.yaml")) as f:
                _shipped = bool(yaml.safe_load(f)["tpu"]
                                .get("app_k_dense_only", False))
        except Exception:
            _shipped = False
        if bool(int(os.environ.get("JTF_BENCH_APPK_DENSE_ONLY",
                                   str(int(_shipped))))):
            m_compact = m_cn
            cap.extras["app_k_compacted"] = None
            cap.record("compacted", m_cn)
        cap.persist(partial=True)
    else:
        m_compact = m_compact64
    t_compact = m_compact["median_s"]
    print(f"[bench] compact {t_compact*1000:.1f} ms "
          f"(app_k={cap.extras.get('app_k_compacted', app_k)})",
          file=sys.stderr)

    # Roofline: analytic multi-resource bound for the compacted step (the
    # binding phase): the step is ROW-OP LATENCY bound, not bandwidth
    # bound — its streamed HBM traffic is a few GB/step (~ms at peak)
    # while row ops (gathers / scatter-adds / mask probes, measured
    # ~23 ns/row gather and ~45 ns/row scatter emit on v5e,
    # docs/DESIGN_NOTES.md) bound it far tighter.  Each resource bound is
    # computed from the KNOWN shapes; bound_fraction = composite/measured
    # says how far from speed-of-light the step is.  Class times validated
    # against the device trace (scripts/phase_profile.py), see BENCH_NOTES.
    # roofline row census must match the step variant the headline bills
    # (two-stage K2=192, or all-K fused appearance under the rebill)
    K2 = (compact_k if cap.extras.get("app_k_compacted", app_k_raised)
          is None else app_k_raised)
    K = compact_k
    n = n_rays
    Rd, Ra = 16, 48
    res_xyz = res[0]
    rows_gather = 3 * n * K + 3 * n * K2   # density + appearance factored
    rows_probe = n * (n_samples // 4)      # alpha probe at stride 4
    rows_scatter = 3 * n * K + 3 * n * K2  # factor-grad scatter-adds
    rows_total = rows_gather + rows_probe + rows_scatter
    row_bytes = (3 * n * K * (4 * Rd) * 4          # density packed rows
                 + 3 * n * K2 * (4 * Ra) * 4) * 2  # appearance, fwd+bwd
    params = 3 * res_xyz * res_xyz * (Rd + Ra) + 3 * res_xyz * (Rd + Ra)
    bytes_streamed = (params * 4 * 6 + 2 * params * 4
                      + n * n_samples * 4 * 6 + row_bytes)
    t_hbm_floor = bytes_streamed / V5E_HBM_BYTES_PER_SEC
    flops_mm = (2 * n * K2 * (150 * 64 + 64 * 64 + 64 * 3) * 3
                + 2 * n * K2 * (3 * Ra) * 27 * 3)
    t_mxu = flops_mm / (V5E_PEAK_BF16_FLOPS / 4)
    t_row_effective = max(t_compact - t_hbm_floor - t_mxu, 0.0)
    roofline = {
        "model": "analytic floors + measured row-op residual",
        "streamed_bytes_per_step": bytes_streamed,
        "t_hbm_floor_ms": round(t_hbm_floor * 1e3, 2),
        "t_mxu_floor_ms": round(t_mxu * 1e3, 3),
        "hbm_util": round(t_hbm_floor / t_compact, 4),
        "rows_per_step": rows_total,
        "effective_ns_per_row": round(t_row_effective / rows_total * 1e9, 1),
        "note": "hbm_util <= 1 by construction (floor time / measured). "
                "The step is row-op serialization bound, not bandwidth "
                "bound: at pure-bandwidth speed of light it would take "
                "t_hbm_floor_ms; the residual divided by the row census "
                "gives the effective per-row emit cost to compare against "
                "scatter_probe.py calibration.",
    }
    cap.extras["roofline_compacted"] = roofline
    cap.persist(partial=True)
    print(f"[bench] compacted roofline: {roofline}", file=sys.stderr)

    # ---------------- phase 2 (22.5%): early (growing grid) --------------
    # the voxel schedule spends iterations 0-9000 at 64^3..400^3 with
    # proportionally fewer samples; model it at 128^3/443
    res_e = (128, 128, 128) if not _SMALL else res
    state_e = init_train_state(jax.random.PRNGKey(0), vm_cfg, res_e,
                               aabb, n_views)
    S_e = 443 if not _SMALL else n_samples
    bbox_k_e = probe_bbox_k(res_e, S_e)
    from joint_tensorf_tpu.render.renderer import BlurSpec
    blur_spec = BlurSpec(mode="uniform-gaussian", kernel_size=64)
    cfg_e = StepConfig(H=H, W=W, n_views=n_views, rays_per_view=rays_per_view,
                       n_samples=S_e, pose_opt=True, use_pose_noise=True,
                       densify_density=True, densify_impl="lane", app_k=app_k,
                       blur=blur_spec, compact_k=bbox_k_e)
    step_e = make_train_step(cfg_e, vm_cfg, head)
    m_early = measure(step_e, None, st=state_e)
    t_early = m_early["median_s"]
    cap.record("early", m_early)
    print(f"[bench] early {t_early*1000:.1f} ms", file=sys.stderr)

    # ---------------- phase 3 (7.5%): dense blur-active ------------------
    # blur-active steps pay the banded-matmul blur of all 12 factor grids
    # + its backward transposes; culling per refresh window via the
    # trainer's dilated capped-res mask (bbox-gated where the window's
    # probe declines).  Windows: it 9000-12000 with refreshes at
    # 9000/10000/11000; worst-case sigma_world per window = schedule value
    # at window start x max(scale_pool) = 0.0525 / 0.035 / 0.0175.
    cfg_d = dataclasses.replace(cfg, blur=blur_spec)
    step_d = make_train_step(cfg_d, vm_cfg, head)
    m_dense_bbox = measure(step_d, None)
    # bill the dense phase at the bbox rate until the windows are measured
    cap.record("dense", m_dense_bbox)
    print(f"[bench] dense (bbox-only) {m_dense_bbox['median_s']*1000:.1f} ms",
          file=sys.stderr)

    window_sigmas = [0.0525, 0.035, 0.0175]
    if _SMALL:
        window_sigmas = [sig / 10 for sig in window_sigmas]
    # radius in MASK cells (trainer._blur_dilate_radius semantics: sigma
    # converted at the capped mask resolution, capped by the kernel
    # half-width converted from factor-grid to mask cells)
    grid_scale = float(np.mean(np.asarray(res, np.float64) / 3.0))
    mask_scale = float(np.mean(np.asarray(mres, np.float64) / 3.0))
    ball_rng = np.random.default_rng(11)
    ax0 = np.linspace(-1.5, 1.5, mres[0], dtype=np.float32)
    ax1 = np.linspace(-1.5, 1.5, mres[1], dtype=np.float32)
    ax2 = np.linspace(-1.5, 1.5, mres[2], dtype=np.float32)
    BX, BY, BZ = np.meshgrid(ax0, ax1, ax2, indexing="ij")
    sharp = np.zeros(tuple(mres), np.float32)
    for _ in range(6):
        cx, cy, cz = ball_rng.uniform(-0.9, 0.9, 3)
        rad = ball_rng.uniform(0.25, 0.45)
        sharp[(BX - cx) ** 2 + (BY - cy) ** 2 + (BZ - cz) ** 2
              < rad * rad] = 1.0
    sharp_mask = AlphaMask(grid=jnp.asarray(sharp),
                           aabb=state.params.field.aabb)
    halfw_mask = max(1, int(np.ceil((64 // 2) * mask_scale / grid_scale)))
    win_rows, k_times = [], {}
    for sig_w in window_sigmas:
        r_blur = max(1, min(halfw_mask,
                            int(np.ceil(5.0 * sig_w * mask_scale)) + 1))
        bm = dilate_mask(sharp_mask, r_blur)
        bk = probe_bbox_k(res, n_samples, mask=bm, pad=1.25)
        if bbox_k is not None and bk is not None:
            bk = min(bk, bbox_k)
        if bk is not None and bbox_k is not None and bk >= bbox_k:
            bk = None   # no win over the bbox budget for this window
        print(f"[bench] dense blur-mask window sigma={sig_w}: dilated(r="
              f"{r_blur}) occ {float(bm.grid.mean()):.3f}, K = {bk}",
              file=sys.stderr)
        if bk is None:
            t_w = m_dense_bbox["median_s"]
        else:
            if bk not in k_times:
                cfg_w = dataclasses.replace(
                    cfg_d, use_alpha_mask=True, mask_with_blur=True,
                    compact_k=bk)
                k_times[bk] = measure(make_train_step(cfg_w, vm_cfg, head),
                                      bm)["median_s"]
            t_w = k_times[bk]
        win_rows.append({"sigma_world": sig_w, "radius_cells": r_blur,
                         "compact_k_blur": bk, "ms": round(t_w * 1000, 1)})
        # refresh the dense phase estimate as each window lands
        t_dense = float(np.mean(
            [w_["ms"] for w_ in win_rows]
            + [m_dense_bbox["median_s"] * 1000.0] * (len(window_sigmas)
                                                     - len(win_rows))
        )) / 1000.0
        cap.extras["dense_blur_mask"] = {
            "enabled": any(w_["compact_k_blur"] is not None
                           for w_ in win_rows),
            "windows": win_rows, "compact_k_bbox": bbox_k,
            "ms_dense_bbox_only": round(m_dense_bbox["median_s"] * 1000, 1)}
        cap.fresh["dense"] = dict(m_dense_bbox, median_s=t_dense)
        cap.persist(partial=True)
    t_dense = cap.fresh["dense"]["median_s"]
    print(f"[bench] dense {t_dense*1000:.1f} ms (window mean; bbox-only "
          f"{m_dense_bbox['median_s']*1000:.1f} ms; windows {win_rows})",
          file=sys.stderr)

    result = cap.result(partial=False)
    cap.persist(partial=False)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
