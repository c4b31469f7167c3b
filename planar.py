#!/usr/bin/env python
"""2D planar alignment CLI (the reference's train_2d.py).

Usage:
    python planar.py --yaml=configs/planar_bat.yaml [--k=v ...]
"""
from __future__ import annotations

import json
import os
import sys


def main(argv):
    yaml_path, rest = None, []
    for a in argv:
        if a.startswith("--yaml="):
            yaml_path = a.split("=", 1)[1]
        else:
            rest.append(a)
    assert yaml_path, "usage: python planar.py --yaml=configs/planar_*.yaml"

    from joint_tensorf_tpu.config import set_options
    from joint_tensorf_tpu.utils import setup_jax
    setup_jax()
    opt = set_options(yaml_path, rest)

    # The PREF-style Fourier image stores complex64 factors; complex ifft is
    # unimplemented on the TPU backend, and the planar pipeline is the CPU
    # sanity loop anyway (SURVEY.md §4) — pin CPU unless the user explicitly
    # chose cpu themselves (note the environment presets JAX_PLATFORMS to the
    # TPU plugin, so "set at all" does not mean "user chose").
    if opt.model == "planar_fft" and os.environ.get("JAX_PLATFORMS") != "cpu":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
            print("[planar] planar_fft uses complex FFTs (unimplemented on "
                  "the TPU backend) — pinned jax to cpu")
        except Exception:
            pass

    out_dir = os.path.join(opt.get("output_root", "output"),
                           str(opt.get("group", "default")),
                           str(opt.get("name", "planar")))
    os.makedirs(out_dir, exist_ok=True)

    from joint_tensorf_tpu.train.planar_trainer import PlanarTrainer

    tr = PlanarTrainer(opt)
    print(f"[planar] model={opt.model} patches={tr.B} dof={tr.dof} "
          f"max_iter={tr.max_iter}")

    log_path = os.path.join(out_dir, "log.jsonl")

    def on_log(t, m):
        with open(log_path, "a") as f:
            f.write(json.dumps(m) + "\n")
        print(f"it {t.it:6d} | loss {m['loss']:.5f} | psnr {m['psnr']:.2f} "
              f"| warp_err {m['warp_error']:.4f} | sigma {m['sigma']:.1f}",
              flush=True)

    tr.run(log_every=int(opt.freq.get("scalar", 20)), callback=on_log)

    result = {"iters": tr.it, "warp_error": tr.warp_error(),
              "psnr": tr.metrics_history[-1]["psnr"] if tr.metrics_history
              else None}
    with open(os.path.join(out_dir, "quant.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("[done]", json.dumps(result))

    try:
        import imageio.v2 as imageio
        import numpy as np

        img = tr.predict_entire_image()
        imageio.imwrite(os.path.join(out_dir, "reconstruction.png"),
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))
    except Exception as e:
        print(f"[vis] skipped: {e}")


if __name__ == "__main__":
    from joint_tensorf_tpu.utils import run_cli

    run_cli(main, sys.argv[1:])
