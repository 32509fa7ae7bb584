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
