import jax.numpy as jnp
import numpy as np
import pytest

orbax = pytest.importorskip("orbax.checkpoint")

from yolov3_tpu.io.checkpoint import load_checkpoint_orbax, save_checkpoint_orbax


def test_orbax_roundtrip(tmp_path):
    tree = {
        "params": {"backbone": {"layer1": {"kernel": jnp.arange(12.0).reshape(1, 1, 3, 4)}}},
        "bn_state": {"backbone": {"layer1": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}},
    }
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint_orbax(path, tree)
    restored = load_checkpoint_orbax(path, like=tree)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["backbone"]["layer1"]["kernel"]),
        np.asarray(tree["params"]["backbone"]["layer1"]["kernel"]),
    )
