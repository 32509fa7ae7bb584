"""Test config: run JAX on a virtual 8-device CPU mesh (the multi-chip
substitute for a TPU pod — SURVEY §4), generate toy fixtures once."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["JAX_PLATFORMS"] = "cpu"

# Some environments pre-register an accelerator platform from a site hook
# that overrides jax_platforms after env parsing — force CPU in-process.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Persistent XLA compile cache for the suite: the full-model CPU compiles
# dominate suite wall time and are identical run-to-run (JAX keys entries
# on the program hash, so stale hits are impossible). Opt out with
# YOLOV3_TPU_TEST_COMPILE_CACHE=0.
SUITE_XLA_CACHE = os.path.join(REPO, ".pytest_xla_cache")
if os.environ.get("YOLOV3_TPU_TEST_COMPILE_CACHE", "1") != "0":
    from yolov3_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(SUITE_XLA_CACHE)


def absolutize_run_config(cfg, root=None):
    """Make a run config's repo-relative paths absolute so the app under
    test can run from a scratch cwd (the train app writes model_summary.txt
    cwd-relative — reference train.py:157-158 — and must not clobber the
    repo's tracked copy). Mutates and returns cfg."""
    root = root or REPO
    for key in ("model_config_file", "classes_name_file", "anchors_file"):
        if key in cfg:
            cfg[key] = os.path.join(root, cfg[key])  # join is a no-op on abs paths
    dc = cfg.get("dataset_config", {})
    tfr = dc.get("tfrecords") or {}
    for split in tfr:
        tfr[split] = os.path.join(root, tfr[split])
    for split in (dc.get("data_files") or {}).values():
        for k in ("images_dir", "annotations"):
            if k in split:
                split[k] = os.path.join(root, split[k])
    return cfg

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root():
    return REPO


@pytest.fixture(scope="session")
def toy_dataset(tmp_path_factory):
    """Session-scoped toy shapes dataset (generated if not present)."""
    root = os.path.join(REPO, "datasets", "shapes_toy")
    if not os.path.exists(os.path.join(root, "class.names")):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        import make_toy_dataset

        cwd = os.getcwd()
        os.chdir(REPO)
        try:
            make_toy_dataset.main()
        finally:
            os.chdir(cwd)
    return root


REFERENCE = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE)


def has_tf():
    try:
        import tensorflow  # noqa: F401

        return True
    except ImportError:
        return False
