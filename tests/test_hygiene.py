"""Repo-hygiene guards (VERDICT r3 weak #4 / ADVICE r3).

Round 3's convergence tools, driven from the repo root, overwrote the
tracked flagship `model_summary.txt` with a toy-run dump because the
train app wrote the summary to cwd unconditionally. The app now writes
it NEXT TO the run's checkpoints; these tests pin both the new behavior
and the tracked artifact's identity so tooling can never silently dirty
it again.
"""

import os
import subprocess

import yaml

from .conftest import REPO, absolutize_run_config


def test_train_writes_summary_next_to_checkpoints(tmp_path, toy_dataset):
    """Running the train app from the repo root (as tools/*.py do) must
    leave the summary in the run's checkpoint dir and keep the repo's
    tracked model_summary.txt byte-identical."""
    from yolov3_tpu.apps.train_app import Train

    tracked = os.path.join(REPO, "model_summary.txt")
    before = open(tracked, "rb").read()

    cfg = yaml.safe_load(open(os.path.join(REPO, "config/train_config.yaml")))
    run_dir = tmp_path / "run"
    cfg.update(image_size=96, epochs=1, batch_size=8, training_mode="fit",
               output_checkpoints_path=str(run_dir / "ckpt.tf"))
    absolutize_run_config(cfg)

    cwd = os.getcwd()
    os.chdir(REPO)  # exactly how tools/train_convergence.py runs
    try:
        Train()(**cfg)
    finally:
        os.chdir(cwd)

    assert (run_dir / "model_summary.txt").exists(), \
        "summary must land next to the checkpoints"
    assert open(tracked, "rb").read() == before, \
        "train run dirtied the tracked model_summary.txt"


def test_tracked_model_summary_is_flagship():
    """The committed model_summary.txt is the flagship full-yolov3 dump
    (7 sub-models / 61,949,149 params at COCO's 80 classes — the
    reference convert.py:155-160 flagship build), regenerated here from
    the spec — fails if any tool overwrites it with a toy run."""
    import jax

    from yolov3_tpu.apps.train_app import model_summary
    from yolov3_tpu.models import init_model, parse_model_config

    tracked = open(os.path.join(REPO, "model_summary.txt")).read()
    assert "7 sub-models" in tracked.splitlines()[0]
    assert "Total params: 61,949,149" in tracked

    spec = parse_model_config(
        os.path.join(REPO, "config/models/yolov3/model.yaml"), nclasses=80)
    params, _ = init_model(jax.random.PRNGKey(0), spec)
    regenerated = model_summary(spec, params, 416)
    assert tracked.strip() == regenerated.strip(), \
        "tracked model_summary.txt diverged from the flagship spec dump"


def test_no_tracked_file_listed_in_gitignore():
    """A tracked file matched by .gitignore is a trap: the ignore has no
    effect, and edits land in commits unnoticed (that is exactly how the
    round-3 regression shipped)."""
    tracked = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
        check=True).stdout.splitlines()
    ignored = subprocess.run(
        ["git", "check-ignore", "--no-index", "--stdin"], cwd=REPO,
        input="\n".join(tracked), capture_output=True, text=True).stdout
    offenders = [f for f in ignored.splitlines() if f]
    assert not offenders, f"tracked files matched by .gitignore: {offenders}"
