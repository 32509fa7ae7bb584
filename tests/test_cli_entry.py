"""Installed console entry points (yolov3_tpu/apps/cli.py): argparse
surfaces exist and map to the same app callables the root CLIs use."""

import pytest

from yolov3_tpu.apps import cli


@pytest.mark.parametrize("main", [cli.train_main, cli.inference_main,
                                  cli.evaluate_main, cli.convert_main])
def test_help_exits_zero(main, capsys):
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    assert "--" in capsys.readouterr().out


def test_entry_points_declared(repo_root):
    import os
    import tomllib

    with open(os.path.join(repo_root, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)
    scripts = proj["project"]["scripts"]
    assert set(scripts) == {"yolov3-tpu-train", "yolov3-tpu-infer",
                            "yolov3-tpu-evaluate", "yolov3-tpu-convert",
                            "yolov3-tpu-serve", "yolov3-tpu-export"}
    for target in scripts.values():
        mod, fn = target.split(":")
        assert mod == "yolov3_tpu.apps.cli" and hasattr(cli, fn)


def test_load_expands_env_defaults(tmp_path, monkeypatch):
    """Configs may use ${VAR:-default} (the bundled pets config does);
    the installed entry points and every root CLI must load through
    config.load_yaml, not bare yaml.safe_load, or those paths reach the
    apps unexpanded."""
    import os

    cfg = tmp_path / "c.yaml"
    cfg.write_text("p: ${PETS_TEST_VAR:-fallback}/x\nq: $PETS_TEST_VAR2\n")
    monkeypatch.delenv("PETS_TEST_VAR", raising=False)
    monkeypatch.setenv("PETS_TEST_VAR2", "v2")
    from yolov3_tpu.apps.cli import _load

    loaded = _load(str(cfg))
    assert loaded == {"p": "fallback/x", "q": "v2"}

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for script in ("train.py", "inference.py", "evaluate_yolov3.py",
                   "serve.py", "convert.py",
                   "utilities/create_yolov3_anchors.py",
                   "utilities/export_serving_artifact.py"):
        src = open(os.path.join(repo, script)).read()
        assert "load_yaml" in src and "yaml.safe_load" not in src, script
