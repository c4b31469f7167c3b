"""Hunt the appknone NaN: run the bisect arm's exact config with the
appearance cap disabled and latch the FIRST iteration where any state leaf
goes non-finite, printing the leaf paths.  (The arm crashed at the it-1000
upsample with a NaN aabb; the train metrics were finite through it 750.)"""
import os
import sys

# NOT via PYTHONPATH: the env var is inherited by the axon tunnel client
# subprocess and breaks its imports -> 'axon' never registers as a backend
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from joint_tensorf_tpu.utils import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from joint_tensorf_tpu.config import set_options  # noqa: E402
from joint_tensorf_tpu.data import load_dataset  # noqa: E402
from joint_tensorf_tpu.train.trainer import Trainer  # noqa: E402

opt = set_options("configs/bat_synthetic_convergence_20k.yaml",
                  ["--tpu.app_k!", "--name=debug_appknone"])
train_data = load_dataset(opt, "train")
try:
    val_data = load_dataset(opt, "val")
except FileNotFoundError:
    val_data = train_data
tr = Trainer(opt, train_data, val_data)


@jax.jit
def count_bad(params):
    return jax.tree.map(
        lambda x: ((~jnp.isfinite(x)).sum()
                   if jnp.issubdtype(x.dtype, jnp.floating)
                   else jnp.zeros((), jnp.int32)), params)


check_from = int(os.environ.get("CHECK_FROM", 0))
capture_from = int(os.environ.get("CAPTURE_FROM", 770))

# wrap the step builder so every call's inputs are snapshotted (copied —
# donate_state invalidates the input buffers) before the step runs
_orig_make = tr._make_step


def _make_wrapped(cfg):
    fn = _orig_make(cfg)

    def wrapped(*args):
        if tr.it >= capture_from:
            tr._last_args = jax.tree.map(jnp.array, args)
        return fn(*args)
    return wrapped


tr._make_step = _make_wrapped
tr._step_cfg = None


def replay_unjitted():
    """Re-run the captured failing iteration op-by-op with NaN checking:
    eager dispatch + jax_debug_nans raises at the exact primitive."""
    from joint_tensorf_tpu.train.step import make_train_step
    print("replaying the captured iteration UN-JITTED with jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    raw = tr._make_raw_step(tr._step_cfg, jit=False)
    try:
        raw(*tr._last_args)
        print("replay produced no NaN error (??)")
    except FloatingPointError as e:
        import traceback
        traceback.print_exc()
        print("NaN primitive located above.")


for i in range(1000):
    m = tr.train_iteration()
    if i >= check_from or i % 100 == 0:
        bad = count_bad(tr.state.params)
        flat = jax.tree_util.tree_flatten_with_path(bad)[0]
        bad_paths = [(jax.tree_util.keystr(p), int(v))
                     for p, v in flat if int(v) > 0]
        if bad_paths:
            print(f"it {tr.it}: NON-FINITE leaves:")
            for p, v in bad_paths:
                print(f"   {p}: {v} bad")
            print("   metrics:", {k: float(v) for k, v in m.items()})
            replay_unjitted()
            break
        if i % 100 == 0:
            print(f"it {tr.it}: all finite, loss {float(m['loss']):.6f}")
    tr.it += 1
    # no _update_schedule: isolate the NaN from the it-1000 upsample crash
else:
    print("no NaN found in 1000 iterations (without schedule updates)")
