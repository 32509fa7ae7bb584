import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models import parse_model_config, init_model, apply_model
from yolov3_tpu.models.compact_spec import parse_compact_model_config


@pytest.fixture(scope="module")
def specs(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        multi = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    compact = parse_compact_model_config(
        os.path.join(repo_root, "config/models/yolov3_tiny/yolov3_tiny.yaml"), nclasses=3
    )
    return multi, compact


def test_same_conv_shapes(specs):
    """Compact and multi-file formats describe the same architecture —
    identical global conv kernel-shape sequence."""
    multi, compact = specs
    pm, _ = init_model(jax.random.PRNGKey(0), multi)
    pc, _ = init_model(jax.random.PRNGKey(0), compact)

    def conv_shapes(spec, params):
        shapes = []
        for sm in spec.sub_models:
            for i, layer in enumerate(sm.layers):
                if layer.kind == "convolutional":
                    shapes.append(tuple(params[sm.name][f"layer{i}"]["kernel"].shape))
        return shapes

    assert conv_shapes(multi, pm) == conv_shapes(compact, pc)


def test_compact_forward_shapes(specs):
    _, compact = specs
    params, state = init_model(jax.random.PRNGKey(0), compact)
    x = jnp.zeros((1, 416, 416, 3))
    outs, _ = apply_model(compact, params, state, x)
    assert [o.shape for o in outs] == [(1, 13, 13, 3, 8), (1, 26, 26, 3, 8)]


def test_compact_matches_multifile_outputs(specs):
    """Same weights (same init key walk) ⇒ same outputs."""
    multi, compact = specs
    pm, sm_ = init_model(jax.random.PRNGKey(7), multi)
    pc, sc = init_model(jax.random.PRNGKey(7), compact)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3))
    om, _ = apply_model(multi, pm, sm_, x)
    oc, _ = apply_model(compact, pc, sc, x)
    for a, b in zip(om, oc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
