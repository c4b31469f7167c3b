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
