"""Randomized DSL parity: generate random valid layer stacks over the full
vocabulary {convolutional, shortcut, route, upsample, maxpool, yolo}, build
each through the reference's Keras parser (core/parse_model.py) AND our
functional interpreter, copy the Keras weights across, and require the
forward outputs to agree. The bundled-model parity tests pin the three
shipped topologies; this pins the *parser/interpreter pair* on wiring the
bundled configs never exercise (random routes, shortcut placement,
bias-vs-BN mixes, stride/maxpool/upsample interleavings, multi-tap
sub-model wiring with entry_index)."""

import os
import sys

import numpy as np
import pytest
import yaml

from .conftest import REFERENCE, has_reference, has_tf

pytestmark = pytest.mark.skipif(
    not (has_reference() and has_tf()), reason="reference mount or TF unavailable"
)


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    sys.path.insert(0, REFERENCE)
    yield
    sys.path.remove(REFERENCE)


IMAGE = 64  # input resolution; scales stay powers of two


def _gen_body(rng, n_ops):
    """Random stack for a 'body' sub-model. Tracks (channels, scale) per
    emitted layer so routes/shortcuts/upsamples stay shape-valid."""
    layers = [{"type": "route", "source": {"inputs": [0]}}]
    meta = [(3, 1)]  # (channels, downsample scale) per layer output
    c, s = 3, 1
    for _ in range(n_ops):
        ops = ["conv", "conv", "conv"]  # convs weighted up
        if c in (8, 16, 24, 32):
            ops.append("resblock")
        if s <= 4:
            ops.append("maxpool")
        if s >= 2:
            ops.append("upsample")
        # a same-scale earlier tap (not the running layer) enables a concat
        concat_candidates = [i for i, (_, ms) in enumerate(meta[:-1]) if ms == s]
        if concat_candidates:
            ops.append("concat")
        op = ops[rng.randint(len(ops))]

        if op == "conv":
            f = int(rng.choice([8, 16, 24, 32]))
            k = int(rng.choice([1, 3]))
            stride = int(rng.choice([1, 1, 2])) if s <= 4 and k == 3 else 1
            d = {"type": "convolutional", "filters": f, "size": k,
                 "stride": stride, "pad": 1, "activation": "leaky"}
            if rng.rand() < 0.8:
                d["batch_normalize"] = 1
            layers.append(d)
            c, s = f, s * stride
            meta.append((c, s))
        elif op == "resblock":
            f1 = int(rng.choice([8, 16]))
            for d in ({"type": "convolutional", "filters": f1, "size": 1,
                       "stride": 1, "pad": 1, "activation": "leaky",
                       "batch_normalize": 1},
                      {"type": "convolutional", "filters": c, "size": 3,
                       "stride": 1, "pad": 1, "activation": "leaky",
                       "batch_normalize": 1},
                      {"type": "shortcut", "from": -3, "activation": "linear"}):
                layers.append(d)
            meta += [(f1, s), (c, s), (c, s)]
        elif op == "maxpool":
            k = int(rng.choice([2, 3]))
            stride = int(rng.choice([1, 2]))
            layers.append({"type": "maxpool", "size_xy": [k, k],
                           "stride_xy": [stride, stride], "padding": "same"})
            s = s * stride
            meta.append((c, s))
        elif op == "upsample":
            layers.append({"type": "upsample", "stride": 2})
            s = s // 2
            meta.append((c, s))
        else:  # concat with a random same-scale earlier tap
            j = int(concat_candidates[rng.randint(len(concat_candidates))])
            rel = j - len(meta)  # negative relative index into layers-so-far
            layers.append({"type": "route", "source": {"layers": [-1, rel]}})
            c = c + meta[j][0]
            meta.append((c, s))
    return layers, meta


def _head_layers(grid):
    return [
        {"type": "route", "source": {"inputs": [0]}},
        {"type": "convolutional", "filters": 16, "size": 3, "stride": 1,
         "pad": 1, "activation": "leaky", "batch_normalize": 1},
        {"type": "convolutional", "filters": "3*(2+2+1+nclasses)", "size": 1,
         "stride": 1, "pad": 1, "activation": "linear"},
        {"type": "yolo", "grid_size": grid, "jitter": 0.3},
    ]


def _gen_model(rng, tmp_path):
    """Random body with two output taps + two heads consuming them via
    entry_index — written as a two-tier config both parsers read."""
    layers, meta = _gen_body(rng, n_ops=int(rng.randint(8, 15)))
    # two distinct taps; the last layer must be one of them so Keras and the
    # interpreter agree on liveness (both just select outputs, but dangling
    # tails are pointless)
    tap1 = len(meta) - 1
    tap0 = int(rng.randint(1, tap1))
    taps = [tap0, tap1]
    grids = [IMAGE // meta[t][1] for t in taps]

    d = tmp_path
    files = {}
    files["body.yaml"] = {"layers_config": layers}
    files["head_a.yaml"] = {"layers_config": _head_layers(grids[0])}
    files["head_b.yaml"] = {"layers_config": _head_layers(grids[1])}
    for name, content in files.items():
        with open(os.path.join(d, name), "w") as f:
            yaml.safe_dump(content, f)

    model = {
        "decay_factor": 0.0005,
        "output_stage": "head",
        "grid_sizes": grids,
        "sub_models_configs": [
            {"name": "body",
             "layers_config_file": os.path.join(d, "body.yaml"),
             "outputs_layers": [tap0 - len(meta), -1]},
            {"name": "head_a",
             "layers_config_file": os.path.join(d, "head_a.yaml"),
             "inputs": {"source": [{"name": "body", "entry_index": 0}]},
             "outputs_layers": [-1]},
            {"name": "head_b",
             "layers_config_file": os.path.join(d, "head_b.yaml"),
             "inputs": {"source": [{"name": "body", "entry_index": 1}]},
             "outputs_layers": [-1]},
        ],
    }
    model_path = os.path.join(d, "model.yaml")
    with open(model_path, "w") as f:
        yaml.safe_dump(model, f)
    return model_path, model


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_spec_forward_parity(seed, tmp_path):
    import jax
    import jax.numpy as jnp
    from tensorflow.keras import Input
    from core.parse_model import ParseModel
    from yolov3_tpu.models import parse_model_config, init_model, apply_model

    from .test_reference_parity import _copy_ref_weights

    rng = np.random.RandomState(100 + seed)
    model_path, model = _gen_model(rng, str(tmp_path))
    nclasses = int(rng.randint(1, 9))

    ref = ParseModel().build_model(Input(shape=(IMAGE, IMAGE, 3)),
                                   nclasses=nclasses, **model)
    spec = parse_model_config(model_path, nclasses=nclasses)
    params, state = init_model(jax.random.PRNGKey(seed), spec)
    params, state = _copy_ref_weights(ref, spec, params, state)

    x = rng.rand(2, IMAGE, IMAGE, 3).astype(np.float32)
    def _flat(o):
        if isinstance(o, (list, tuple)):
            for e in o:
                yield from _flat(e)
        else:
            yield o

    # head sub-models emit 1-element output lists here, so the model output
    # is a nested list — flatten to the head tensors
    ref_outs = list(_flat(ref(x, training=False)))
    outs, _ = apply_model(spec, params, state, jnp.asarray(x))
    assert len(ref_outs) == len(outs)
    for ro, jo in zip(ref_outs, outs):
        ro, jo = np.asarray(ro), np.asarray(jo)
        assert ro.shape == jo.shape
        rel = np.abs(ro - jo).max() / (np.abs(ro).max() + 1e-9)
        assert rel <= 1e-3, f"seed {seed}: rel diff {rel:.2e}"
