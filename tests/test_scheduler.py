"""Tests for the multi-experiment scheduler (the reference's gpu_scheduler
analogue, scripts/run_experiments.py; reference scripts/gpu_scheduler.py:73-108).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_experiments import build_commands, run_scheduler  # noqa: E402


class _Args:
    yaml = "configs/x.yaml"
    scenes = ["lego", "chair"]
    mode = "both"
    prefix = "p_"
    group = "g"


def test_build_commands_train_and_eval():
    cmds = build_commands(_Args(), ["--seed=3"])
    assert len(cmds) == 4                      # 2 scenes x (train + eval)
    assert cmds[0][1].endswith("train.py")
    assert cmds[1][1].endswith("evaluate.py")
    assert "--data.scene=lego" in cmds[0]
    assert "--name=p_lego" in cmds[0]
    assert "--seed=3" in cmds[0]


def test_scheduler_respects_slot_limit_and_runs_all(tmp_path):
    marker = tmp_path / "out"
    cmds = [[sys.executable, "-c",
             f"import pathlib; pathlib.Path(r'{marker}_{i}').write_text('x')"]
            for i in range(5)]
    results = run_scheduler(cmds, n_slots=2, poll_s=0.05)
    assert len(results) == 5
    assert all(rc == 0 for _, rc in results)
    for i in range(5):
        assert os.path.exists(f"{marker}_{i}")


def test_scheduler_reports_failures(tmp_path):
    cmds = [[sys.executable, "-c", "import sys; sys.exit(7)"],
            [sys.executable, "-c", "pass"]]
    results = run_scheduler(cmds, n_slots=1, poll_s=0.05)
    rcs = sorted(rc for _, rc in results)
    assert rcs == [0, 7]


def test_bench_schedule_weights_simulation():
    """bench.simulate_schedule_weights: derived weights must sum to 1,
    reproduce the analytic phase boundaries (blur fully annealed at
    progress 0.3 = first alpha-mask iteration), and confirm the round-1
    protocol weights."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    w = bench.simulate_schedule_weights()
    assert abs(sum(w.values()) - 1.0) < 1e-9
    assert abs(w["early"] - 0.225) < 1e-9          # last upsample at 9k/40k
    assert abs(w["compacted"] - 0.700) < 1e-9      # mask at 12k, blur gone
    # pre-12k final-res iterations are blur-active on ~every iteration
    # (color schedule >= eps until ~it 11973)
    assert w["dense_blur"] > 0.07
    assert w["dense_sharp"] < 0.002
