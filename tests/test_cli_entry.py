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
