"""Checkpointing: native npz pytree format + legacy Keras TF-checkpoint reader.

Native format: a single ``.npz`` holding flattened pytree leaves keyed by
'/'-joined paths plus a small JSON manifest — dependency-free, atomic
(write-to-temp + rename), and stores optimizer state for true resume
(the reference only ever saved model weights — train.py:76-78).

Legacy reader: maps a Keras ``save_weights`` TF-format checkpoint (the
reference's output, e.g. ``checkpoints/...yolov3_train.tf``) onto our
(params, state) trees. Keras object paths follow creation order —
``layer_with_weights-<i>`` = i-th weighted sub-model in config order,
nested ``layer_with_weights-<j>`` = j-th weighted layer (conv / BN) within
it — so the mapping is reconstructed from the ModelSpec without TF graph
tracing. Requires tensorflow for the checkpoint-bundle reader only
(gated import; everything else in this framework is TF-free).
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

_MANIFEST_KEY = "__manifest__"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(path: str, tree, step: int | None = None):
    """Save a pytree (e.g. {'params':…, 'state':…, 'opt_state':…}) atomically."""
    flat = _flatten(tree)
    manifest = {"step": step, "keys": sorted(flat)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat, **{_MANIFEST_KEY: json.dumps(manifest)})
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def checkpoint_keys(path: str):
    """Array key names in a native checkpoint WITHOUT loading the arrays
    (np.load on a zip is lazy until a key is indexed) — cheap presence
    checks on multi-hundred-MB train states."""
    with np.load(path, allow_pickle=False) as z:
        return [k for k in z.files if k != _MANIFEST_KEY]


def load_checkpoint(path: str, like=None, partial: bool = False):
    """Load a native checkpoint. With ``like`` (a template pytree), leaves are
    restored into the template's structure; otherwise a nested dict is built
    from the '/'-joined keys.

    ``partial``: leaves missing from the checkpoint keep their template
    values instead of raising — Keras ``expect_partial`` semantics, used by
    ``resolve.load_weights`` so native and TF-format checkpoints behave the
    same for sub-model/transfer loads. The strict default protects resume
    paths from silently dropping optimizer state."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files if k != _MANIFEST_KEY}
        step = None
        if _MANIFEST_KEY in z.files:
            step = json.loads(str(z[_MANIFEST_KEY])).get("step")

    if like is not None:
        like_flat = _flatten(like)
        missing = set(like_flat) - set(flat)
        if missing and not partial:
            raise ValueError(f"checkpoint {path} missing keys: {sorted(missing)[:5]}…")
        if missing and not (set(like_flat) & set(flat)):
            raise ValueError(f"checkpoint {path} matched no template keys")
        return _unflatten_like(like, flat), step
    return _nest(flat), step


def _unflatten_like(like, flat, prefix=""):
    if isinstance(like, dict):
        return {k: _unflatten_like(v, flat, f"{prefix}{k}/") for k, v in like.items()}
    if isinstance(like, (list, tuple)):
        seq = [_unflatten_like(v, flat, f"{prefix}{i}/") for i, v in enumerate(like)]
        if hasattr(like, "_fields"):  # namedtuple (e.g. optax states)
            return type(like)(*seq)
        return tuple(seq) if isinstance(like, tuple) else seq
    arr = flat.get(prefix[:-1])
    if arr is None:  # partial load: keep the template's value
        return like
    return jnp.asarray(arr, dtype=jnp.asarray(like).dtype)


def _nest(flat):
    root = {}
    for key, val in flat.items():
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return root


# ---------------------------------------------------------------------------
# Orbax interop (optional ecosystem backend)
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(path: str, tree):
    """Save via orbax (gated import) — for interop with orbax-based tooling.
    The native .npz format remains the primary, dependency-free format."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree)


def load_checkpoint_orbax(path: str, like=None):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), item=like)
        return ckptr.restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# Legacy Keras TF-format checkpoint reader
# ---------------------------------------------------------------------------


def _weighted_layer_paths(spec):
    """Keras object-graph paths for every weight, in spec order.

    Returns list of (keras_path, kind, sm_name, layer_key, leaf) where kind ∈
    {kernel, bias, gamma, beta, moving_mean, moving_variance}.
    """
    entries = []
    sm_widx = 0  # Keras numbers only sub-models that HOLD weights — a
    # conv-free sub-model (route/upsample-only) is skipped in its
    # layer_with_weights numbering, so track the weighted index separately
    for sm in spec.sub_models:
        if not any(l.kind == "convolutional" for l in sm.layers):
            continue
        sm_idx = sm_widx
        sm_widx += 1
        wl = 0  # layer_with_weights index within the sub-model
        for i, layer in enumerate(sm.layers):
            if layer.kind != "convolutional":
                continue
            base = f"layer_with_weights-{sm_idx}/layer_with_weights-{wl}"
            entries.append((f"{base}/kernel", "kernel", sm.name, f"layer{i}", "kernel"))
            if layer["batch_normalize"]:
                wl += 1
                bnbase = f"layer_with_weights-{sm_idx}/layer_with_weights-{wl}"
                entries.append((f"{bnbase}/gamma", "gamma", sm.name, f"layer{i}", "gamma"))
                entries.append((f"{bnbase}/beta", "beta", sm.name, f"layer{i}", "beta"))
                entries.append((f"{bnbase}/moving_mean", "moving_mean", sm.name, f"layer{i}", "mean"))
                entries.append((f"{bnbase}/moving_variance", "moving_variance", sm.name, f"layer{i}", "var"))
            else:
                entries.append((f"{base}/bias", "bias", sm.name, f"layer{i}", "bias"))
            wl += 1
    return entries


def load_tf_keras_checkpoint(spec, params, state, prefix: str):
    """Restore a Keras save_weights (TF format) checkpoint into (params, state).

    Partial restores are tolerated (expect_partial semantics — reference
    inference.py:102): missing variables are left at their current values.
    """
    try:
        from tensorflow.python.training import py_checkpoint_reader  # noqa
        reader = py_checkpoint_reader.NewCheckpointReader(prefix)
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "Reading legacy Keras TF-format checkpoints requires tensorflow; "
            "convert the checkpoint once with tools/convert_tf_checkpoint.py"
        ) from e

    var_map = reader.get_variable_to_shape_map()
    suffix = "/.ATTRIBUTES/VARIABLE_VALUE"
    loaded = 0
    for keras_path, kind, sm_name, layer_key, leaf in _weighted_layer_paths(spec):
        full = keras_path + suffix
        if full not in var_map:
            continue
        value = reader.get_tensor(full)
        if kind == "kernel":
            params[sm_name][layer_key]["kernel"] = jnp.asarray(value)
        elif kind == "bias":
            params[sm_name][layer_key]["bias"] = jnp.asarray(value)
        elif kind in ("gamma", "beta"):
            params[sm_name][layer_key]["bn"][kind] = jnp.asarray(value)
        else:
            state[sm_name][layer_key][leaf] = jnp.asarray(value, jnp.float32)
        loaded += 1
    return params, state, loaded
