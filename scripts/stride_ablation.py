#!/usr/bin/env python
"""mask_stride conservativeness check (ADVICE round-3, configs/base.yaml).

Renders the validation views of a trained checkpoint at alpha-probe
strides {1, 2, 4} and reports the PSNR deltas.  Stride-1 probes every
sample against the alpha mask (the reference's per-sample culling,
tensorBase.py:750-755); larger strides probe once per group and rely on
the mask build's maxpool(5) dilation for conservativeness (renderer.py
strided-lookup comment).  Identical PSNR across strides = the dilation
argument holds on a real converged field.

Usage: python scripts/stride_ablation.py [--yaml=...] [--name=...]
(defaults to the round-4 appk64 bisect arm's checkpoint)
"""
import json
import os
import sys

sys.path.insert(0, ".")

from joint_tensorf_tpu.utils import setup_jax
setup_jax()


def main(argv):
    yaml_path = "configs/bat_synthetic_convergence_20k.yaml"
    name = "convergence_20k_r4_appk64"
    extra = []
    for a in argv:
        if a.startswith("--yaml="):
            yaml_path = a.split("=", 1)[1]
        elif a.startswith("--name="):
            name = a.split("=", 1)[1]
        else:
            extra.append(a)

    import jax.numpy as jnp

    from joint_tensorf_tpu.config import set_options
    from joint_tensorf_tpu.data import load_dataset
    from joint_tensorf_tpu.train import checkpoint as ckpt_lib
    from joint_tensorf_tpu.train.trainer import Trainer

    opt = set_options(yaml_path, [f"--name={name}"] + extra)
    ckpt = os.path.join(opt.get("output_root", "output"),
                        str(opt.get("group", "default")), name,
                        "model.ckpt.npz")
    train_data = load_dataset(opt, "train")
    try:
        val_data = load_dataset(opt, "val", subset=opt.data.get("val_sub"))
    except FileNotFoundError:
        val_data = train_data
    tr = Trainer(opt, train_data, val_data)
    ckpt_lib.restore_checkpoint(ckpt, tr)
    print(f"[stride] restored {ckpt} at it={tr.it}")
    if tr.alpha_mask is None:
        print("[stride] checkpoint has no alpha mask; strides are a no-op")
        return

    results = {}
    for stride in (1, 2, 4):
        tr.opt.tpu.mask_stride = stride
        v = tr.validate(val_data, align=tr.is_bat)
        results[stride] = float(v["psnr"])
        print(f"[stride] mask_stride={stride}: val PSNR {v['psnr']:.4f}",
              flush=True)
    base = results[1]
    deltas = {s: round(results[s] - base, 4) for s in results}
    print(json.dumps({"psnr": results, "delta_vs_stride1": deltas}))


if __name__ == "__main__":
    main(sys.argv[1:])
