import os
import textwrap

import pytest

from joint_tensorf_tpu.config import load_options, parse_arguments, override_options, set_options
from joint_tensorf_tpu.sched import interp_schedule, voxel_schedule, find_resolution, find_n_samples


def write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_parent_inheritance(tmp_path):
    base = write(tmp_path, "base.yaml", """
        a: 1
        group:
          x: 1
          y: 2
    """)
    child = write(tmp_path, "child.yaml", f"""
        _parent_: {base}
        group:
          y: 3
        b: 4
    """)
    opt = load_options(child)
    assert opt.a == 1
    assert opt.group.x == 1
    assert opt.group.y == 3
    assert opt.b == 4


def test_cli_overrides(tmp_path):
    base = write(tmp_path, "base.yaml", """
        optim:
          lr: 0.001
        flag: false
        other: true
    """)
    opt = set_options(base, ["--optim.lr=5.e-4", "--flag", "--other!"])
    assert opt.optim.lr == 5e-4
    assert opt.flag is True
    assert opt.other is False


def test_unknown_key_rejected(tmp_path):
    base = write(tmp_path, "base.yaml", "a: 1\n")
    with pytest.raises(KeyError):
        set_options(base, ["--nonexistent=2"])
    # + prefix allows creating new keys
    opt = set_options(base, ["--+new.key=2"])
    assert opt.new.key == 2


def test_yaml_typed_values(tmp_path):
    base = write(tmp_path, "base.yaml", "v: 0\nl: []\n")
    opt = set_options(base, ["--v=1.5", "--l=[1,2,3]"])
    assert opt.v == 1.5
    assert opt.l == [1, 2, 3]


def test_interp_schedule():
    sched = [0.3, 0.15, 0.0]
    assert interp_schedule(0.0, sched) == pytest.approx(0.3)
    assert interp_schedule(0.25, sched) == pytest.approx(0.225)
    assert interp_schedule(0.5, sched) == pytest.approx(0.15)
    assert interp_schedule(1.0, sched) == pytest.approx(0.0)


def test_voxel_schedule_blender():
    # reference: 64^3 -> 400^3 over 4 upsamples, log-linear (tensorf.py:304)
    sched = voxel_schedule(64**3, 400**3, 4)
    assert len(sched) == 4
    assert sched[-1] == 400**3
    # monotonically increasing, log-spaced
    assert all(b > a for a, b in zip(sched, sched[1:]))


def test_find_resolution_cube():
    res = find_resolution([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], 128**3)
    assert res == [128, 128, 128]


def test_find_n_samples():
    # norm((128,)*3)/0.5 = 443; capped by sample_intvs
    assert find_n_samples([128, 128, 128], 0.5, 1000) == 443
    assert find_n_samples([400, 400, 400], 0.5, 1000) == 1000
