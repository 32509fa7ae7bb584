"""Darknet .weights → native checkpoint converter (reference convert.py surface).

Config schema parity (utilities/convert_config.yaml): num_classes,
weights_file, output_weights_file, model_config_file. Loads the binary
weights in global conv order, sanity-checks a random 416×416 forward
(convert.py:166-168), and writes a native .npz checkpoint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..io.darknet import load_darknet_weights
from ..io.resolve import save_weights
from ..models import parse_model_config, apply_model


def convert(convert_config: dict):
    from ..utils.compile_cache import enable_from_env_or_config

    enable_from_env_or_config(convert_config.get("compilation_cache"))
    nclasses = convert_config["num_classes"]
    weights_file = convert_config["weights_file"]
    output_weights_file = convert_config["output_weights_file"]
    model_config_file = convert_config["model_config_file"]

    spec = parse_model_config(model_config_file, nclasses)
    params, state = load_darknet_weights(spec, weights_file)

    img = jnp.asarray(np.random.random((1, 416, 416, 3)), jnp.float32)
    outs, _ = jax.jit(lambda p, s, x: apply_model(spec, p, s, x))(params, state, img)
    for o in outs:
        if not bool(jnp.all(jnp.isfinite(o))):
            raise ValueError("sanity check failed: non-finite outputs after conversion")
    print("sanity check passed")

    save_weights(spec, params, state, output_weights_file)
    print(f"weights saved to {output_weights_file}")
    return spec, params, state
