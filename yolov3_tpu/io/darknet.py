"""Darknet ``.weights`` binary importer → (params, state) pytrees.

File layout parity with reference convert.py:36-137:
  * 5 little-endian int32 header (major, minor, revision, seen ×2);
  * per conv layer, in global conv creation order (sub-models in config
    order, layers in file order):
      - if followed by BN: 4×filters float32 stored [beta, gamma, mean, var]
        (reordered at convert.py:50-55);
      - else: filters float32 bias;
      - then the kernel as (out, in, kh, kw) float32, transposed to HWIO
        (convert.py:61-68).

The reference resolves ordering by walking Keras auto-generated
``conv2d_N`` names (convert.py:93-137); those names are assigned in
creation order, which equals config order — so a straight walk over the
spec is the same ordering without the name gymnastics.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.network import _infer_channels, init_model
from ..models.spec import ModelSpec


def load_darknet_weights(spec: ModelSpec, weights_file: str, dtype=jnp.float32):
    """Read a Darknet .weights file into freshly-built (params, state)."""
    import jax

    params, state = init_model(jax.random.PRNGKey(0), spec, dtype)
    per_layer = _infer_channels(spec)

    with open(weights_file, "rb") as f:
        header = np.fromfile(f, dtype=np.int32, count=5)
        if header.size != 5:
            raise ValueError(f"{weights_file}: truncated darknet header")

        for sm in spec.sub_models:
            for i, layer in enumerate(sm.layers):
                if layer.kind != "convolutional":
                    continue
                cin, cout = per_layer[(sm.name, i)]
                k = layer["size"]
                entry = params[sm.name][f"layer{i}"]
                if layer["batch_normalize"]:
                    bn_weights = np.fromfile(f, dtype=np.float32, count=4 * cout)
                    if bn_weights.size != 4 * cout:
                        raise ValueError(f"{weights_file}: truncated BN block at {sm.name}/layer{i}")
                    beta, gamma, mean, var = bn_weights.reshape(4, cout)
                    entry["bn"]["gamma"] = jnp.asarray(gamma, dtype)
                    entry["bn"]["beta"] = jnp.asarray(beta, dtype)
                    st = state[sm.name][f"layer{i}"]
                    st["mean"] = jnp.asarray(mean, jnp.float32)
                    st["var"] = jnp.asarray(var, jnp.float32)
                else:
                    bias = np.fromfile(f, dtype=np.float32, count=cout)
                    if bias.size != cout:
                        raise ValueError(f"{weights_file}: truncated bias at {sm.name}/layer{i}")
                    entry["bias"] = jnp.asarray(bias, dtype)

                count = cout * cin * k * k
                kernel = np.fromfile(f, dtype=np.float32, count=count)
                if kernel.size != count:
                    raise ValueError(f"{weights_file}: truncated kernel at {sm.name}/layer{i}")
                kernel = kernel.reshape(cout, cin, k, k).transpose(2, 3, 1, 0)  # OIHW→HWIO
                entry["kernel"] = jnp.asarray(kernel, dtype)

        remaining = np.fromfile(f, dtype=np.float32)
        if remaining.size:
            raise ValueError(
                f"{weights_file}: {remaining.size} floats left after loading all conv layers "
                "(model/weights mismatch)"
            )
    return params, state


def save_darknet_weights(spec: ModelSpec, params, state, weights_file: str):
    """Inverse of load_darknet_weights (useful for tests / interop)."""
    chunks = [np.array([0, 2, 0, 0, 0], np.int32).tobytes()]
    for sm in spec.sub_models:
        for i, layer in enumerate(sm.layers):
            if layer.kind != "convolutional":
                continue
            entry = params[sm.name][f"layer{i}"]
            if "bn" in entry:
                st = state[sm.name][f"layer{i}"]
                block = np.stack(
                    [
                        np.asarray(entry["bn"]["beta"], np.float32),
                        np.asarray(entry["bn"]["gamma"], np.float32),
                        np.asarray(st["mean"], np.float32),
                        np.asarray(st["var"], np.float32),
                    ]
                )
                chunks.append(block.tobytes())
            else:
                chunks.append(np.asarray(entry["bias"], np.float32).tobytes())
            kernel = np.asarray(entry["kernel"], np.float32).transpose(3, 2, 0, 1)  # HWIO→OIHW
            chunks.append(kernel.tobytes())
    with open(weights_file, "wb") as f:
        f.write(b"".join(chunks))
