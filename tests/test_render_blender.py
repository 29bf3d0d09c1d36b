"""Tests for the Blender render modes' command construction (render.py
render_blender) — the blender binary itself is absent here, so run_cmd is
intercepted and the bpy scripts are only checked to parse.
"""

import ast
from pathlib import Path

import pytest

import render as render_mod
from pixie_tpu.config import compose
from pixie_tpu.utils.paths import get_output_paths, resolve_paths

REPO = Path(__file__).parent.parent


@pytest.fixture()
def cfg_paths(tmp_path):
    cfg = compose(overrides=[
        "obj_id=test_obj", f"paths.base_path={tmp_path}",
    ])
    cfg = resolve_paths(cfg)
    paths = get_output_paths(cfg, cfg.obj_id)
    return cfg, paths


def _capture_run_cmd(monkeypatch):
    calls = []
    monkeypatch.setattr(
        "pixie_tpu.utils.proc.run_cmd",
        lambda cmd, **kw: calls.append(list(map(str, cmd))) or 0,
    )
    return calls


def test_blender_gs_command(cfg_paths, monkeypatch):
    cfg, paths = cfg_paths
    calls = _capture_run_cmd(monkeypatch)
    render_mod.render_blender(cfg, paths, "blender_gs")
    (cmd,) = calls
    assert cmd[1:3] == ["-b", "-P"]
    assert cmd[3].endswith("pixie_tpu/blender/render_gs.py")
    assert "--ply_dir" in cmd
    ply_dir = cmd[cmd.index("--ply_dir") + 1]
    assert f"sample_{cfg.physics.sample_id}" in ply_dir
    assert ply_dir.endswith("ply_files")
    # defaults from conf/output_rendering/default.yaml flow through
    assert "--place_on_ground" in cmd
    assert cmd[cmd.index("--rotate_around") + 1] == "30"
    assert cmd[cmd.index("--cycles_samples") + 1] == "16"
    assert cmd[cmd.index("--init_xyz") + 1:cmd.index("--init_xyz") + 4] == \
        ["0.0", "0.0", "0.0"]


def test_blender_glb_command(cfg_paths, monkeypatch):
    cfg, paths = cfg_paths
    calls = _capture_run_cmd(monkeypatch)
    render_mod.render_blender(cfg, paths, "blender_glb")
    (cmd,) = calls
    assert cmd[3].endswith("pixie_tpu/blender/render_glb.py")
    assert "--obj" in cmd and "--output_folder" in cmd
    assert cmd[cmd.index("--views") + 1] == "25"
    assert cmd[cmd.index("--camera_id") + 1] == "4"


@pytest.mark.parametrize("script", ["render_gs.py", "render_glb.py"])
def test_bpy_scripts_parse(script):
    src = (REPO / "pixie_tpu" / "blender" / script).read_text()
    tree = ast.parse(src)
    names = {n.name for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)}
    assert "main" in names and "parse_args" in names
