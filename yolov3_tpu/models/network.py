"""Functional model interpreter: (spec, params, state, images) → head outputs.

Re-designs the reference's Keras functional-graph builder
(core/parse_model.py:216-314) as a pure interpreter over a static
``ModelSpec``. Params and BatchNorm running statistics are pytrees:

    params[sub_model][f"layer{i}"] = {"kernel", ("bias" | "bn": {gamma, beta})}
    state [sub_model][f"layer{i}"] = {"mean", "var"}          (BN layers only)

The interpreter is shape-polymorphic at trace time (grid sizes derive from
the actual feature-map dims, not the DSL's literal ``grid_size``) and
contains no Python control flow that depends on array values, so it jits
to a single fused XLA program. A conv layer applies BN iff its param dict
holds a "bn" entry — which makes inference-time BN folding
(``fold_batch_norm``) a pure params→params transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from . import layers as L
from .spec import LayerSpec, ModelSpec, SubModelSpec


def _deq(x, fp_dtype):
    """QAct → fp; fp arrays pass through."""
    return L.dequantize(x, fp_dtype) if isinstance(x, L.QAct) else x


def _route_sources(layer: LayerSpec, inputs_entry, layer_outs, fp_dtype):
    """Reference core/parse_model.py:102-140 route semantics.

    Quantized (QAct) sources are dequantized — a concat of int8 tensors
    with different scales has no single-scale representation; the dequant
    fuses into the concat's consumers.
    """
    source = dict(layer["source"])
    selected = []
    if "layers" in source:
        selected.extend(layer_outs[int(i)] for i in source["layers"])
    if "inputs" in source:
        if isinstance(inputs_entry, (list, tuple)):
            selected.extend(inputs_entry[int(i)] for i in source["inputs"])
        else:
            selected.append(inputs_entry)
    if len(selected) == 1:
        return selected[0]
    if len(selected) == 2:
        return jnp.concatenate([_deq(s, fp_dtype) for s in selected], axis=-1)
    raise ValueError(f"Invalid number of route sources: {len(selected)}")


def _apply_sub_model(
    sm: SubModelSpec,
    sm_params,
    sm_state,
    inputs_entry,
    nclasses: int,
    train: bool,
    bn_train: bool = True,
    conv_observer=None,
    out_observer=None,
    fp_dtype=None,
    conv_input_transform=None,
):
    """Run one sub-model's layer list; returns (selected outputs, new bn state).

    ``conv_observer(sm_name, layer_key, x)`` is called with each conv's
    input activation and ``out_observer(sm_name, layer_key, x)`` with each
    layer's output (traced values) — used by int8 calibration.

    Activations may flow as ``layers.QAct`` (int8 + scale) between quantized
    convs: a conv whose params carry ``out_scale`` emits QAct; shortcut adds
    two QActs with a fused dequant-add-requant when its param entry carries
    ``out_scale``; upsample/maxpool pass int8 through unchanged (both are
    scale-preserving / monotone); routes and unquantized convs dequantize.
    """
    # the running 'x' starts as the (single) input, like Keras chaining
    x = inputs_entry if not isinstance(inputs_entry, (list, tuple)) else inputs_entry[0]
    if fp_dtype is None:
        # a QAct input's fp identity is its scale's dtype (f32) — x.q.dtype
        # is int8, which would truncate every dequantized activation
        fp_dtype = x.scale.dtype if isinstance(x, L.QAct) else x.dtype
    layer_outs = []
    new_state = {}
    for i, layer in enumerate(sm.layers):
        key = f"layer{i}"
        # named scope = profiler attribution only (tools/mfu_table.py
        # joins trace op times to layers through HLO metadata op_name)
        with jax.named_scope(f"L|{sm.name}|{key}|{layer.kind}"):
            if layer.kind == "convolutional":
                p = sm_params[key]
                if conv_observer is not None:
                    conv_observer(sm.name, key, _deq(x, fp_dtype))
                if conv_input_transform is not None and "kernel_q" not in p:
                    # activation-QAT hook: returns a (possibly fake-quanted)
                    # replacement for this conv's input. fp path only — a
                    # quantized conv consumes the QAct directly, and _deq here
                    # would silently break the int8 chain, so the fp-only
                    # contract is structural, not a comment.
                    x = conv_input_transform(sm.name, key, _deq(x, fp_dtype))
                leaky = layer.get("activation") == "leaky"
                ep = layer.get("explicit_pad")
                if "kernel_q" in p:
                    x = L.conv2d_int8(x, p, layer["stride"], layer.get("pad", 1),
                                      leaky=leaky, fp_dtype=fp_dtype, explicit_pad=ep)
                else:
                    x = _deq(x, fp_dtype)
                    # s2d_phase layers (ops/s2d.py::s2d_stem_train) carry
                    # ORIGINAL 3×3 params; the phase-space kernel is built
                    # in-graph so gradients flow back to them
                    s2d = layer.get("s2d_phase")
                    if s2d == "conv0":
                        kernel = L.s2d_phase_kernel_conv0(p["kernel"])
                    elif s2d == "conv1":
                        kernel = L.s2d_phase_kernel_conv1(p["kernel"])
                    else:
                        kernel = p["kernel"]
                    x = L.conv2d(x, kernel, layer["stride"], layer.get("pad", 1),
                                 explicit_pad=ep)
                    # remat='conv' policy anchor: identity tag marking the
                    # raw conv output as the one tensor worth SAVING for
                    # the backward pass (everything cheaper — BN, leaky,
                    # pools, adds — recomputes from these). No-op unless
                    # apply_model wraps the sub-model in the named policy.
                    x = checkpoint_name(x, "conv_out")
                    if "bn" in p:
                        x, ns = L.batch_norm(x, p["bn"], sm_state[key], train and bn_train,
                                             phases=4 if s2d == "conv0" else 1)
                        new_state[key] = ns
                    elif "bias" in p:
                        x = x + p["bias"].astype(x.dtype)
                    if leaky:
                        x = L.leaky_relu(x)
            elif layer.kind == "shortcut":
                other = layer_outs[layer["from"]]
                qentry = sm_params.get(key)
                if (isinstance(x, L.QAct) and isinstance(other, L.QAct)
                        and qentry is not None and "out_scale" in qentry):
                    x = L.add_requant(other, x, qentry["out_scale"])
                else:
                    x = _deq(other, fp_dtype) + _deq(x, fp_dtype)
            elif layer.kind == "route":
                x = _route_sources(layer, inputs_entry, layer_outs, fp_dtype)
            elif layer.kind == "upsample":
                if isinstance(x, L.QAct):
                    x = L.QAct(L.upsample_nearest(x.q, layer["stride"]), x.scale)
                else:
                    x = L.upsample_nearest(x, layer["stride"])
            elif layer.kind == "maxpool":
                args = (list(layer["size_xy"]), list(layer["stride_xy"]), layer["padding"])
                if isinstance(x, L.QAct):
                    x = L.QAct(L.max_pool(x.q, *args), x.scale)
                else:
                    x = L.max_pool(x, *args)
            elif layer.kind == "yolo":
                x = _deq(x, fp_dtype)
                if L.layout() == "hwnc":
                    # leave the (H,W,B,C)-logical world at the head boundary —
                    # a head tensor is ≤52²·255 per image, so this transpose is
                    # noise next to the conv stack it buys layout freedom for
                    x = x.transpose(2, 0, 1, 3)
                b, h, w, c = x.shape
                # raw logits, no activation (reference parse_model.py:209-211)
                x = x.reshape(b, h, w, 3, 5 + nclasses)
            else:
                raise ValueError(f"unknown layer kind {layer.kind}")
        if out_observer is not None:
            out_observer(sm.name, key, _deq(x, fp_dtype))
        layer_outs.append(x)
    outputs = [layer_outs[i] for i in sm.outputs_layers]
    return outputs, new_state


def apply_model(spec: ModelSpec, params, state, images, train: bool = False,
                bn_frozen: tuple = (), remat: bool = False, conv_observer=None,
                out_observer=None, conv_input_transform=None):
    """Forward pass. Returns (list of head outputs [B,g,g,3,5+nc], new_state).

    ``images``: NHWC float batch. Output order = config order of sub-models
    whose name contains ``spec.output_stage`` (13-grid head first for yolov3).
    ``bn_frozen``: substrings of sub-model names whose BN layers run in
    inference mode during training (transfer-learning batch_norm_freeze_list,
    reference core/transfer_learning.py:33-37).
    ``remat``: True checkpoints each sub-model's forward — ALL activations
    inside a sub-model are recomputed in the backward pass (max HBM
    savings, costs ~one extra forward ≈ +25% step time). ``"conv"`` uses a
    save_only_these_names policy instead: raw conv outputs (the tensors
    that are expensive to recompute — they're the MXU work) are saved,
    and only the cheap VPU tail (BN normalize, LeakyReLU, pools, adds)
    recomputes — ~2-3× less activation HBM than no-remat at ~zero FLOP
    cost. False = no rematerialization.
    """
    produced = {}
    new_state = {}
    fp_dtype = images.dtype
    if L.layout() == "hwnc":
        # whole-model logical layout flip (layers.set_layout): every
        # activation flows as (H, W, B, C); heads transpose back at the
        # yolo layer, so callers see NHWC semantics unchanged
        images = images.transpose(1, 2, 0, 3)
    for sm in spec.sub_models:
        if sm.inputs is None:
            inputs_entry = images
        else:
            srcs = [produced[name][entry_index] for name, entry_index in sm.inputs]
            inputs_entry = srcs[0] if len(srcs) == 1 else srcs
        bn_train = not any(s and s in sm.name for s in bn_frozen)

        def run(sm_params, sm_state, inputs, _sm=sm, _bn=bn_train):
            return _apply_sub_model(_sm, sm_params, sm_state, inputs,
                                    spec.nclasses, train, _bn,
                                    conv_observer=conv_observer,
                                    out_observer=out_observer,
                                    fp_dtype=fp_dtype,
                                    conv_input_transform=conv_input_transform)

        if remat and train:
            if remat == "conv":
                run = jax.checkpoint(
                    run, policy=jax.checkpoint_policies.save_only_these_names(
                        "conv_out"))
            else:
                run = jax.checkpoint(run)
        outs, sm_new_state = run(
            params[sm.name], state.get(sm.name, {}), inputs_entry
        )
        produced[sm.name] = outs
        if sm_new_state:
            new_state[sm.name] = sm_new_state

    outputs = []
    for sm in spec.output_sub_models:
        outputs.extend(produced[sm.name])
    return outputs, new_state


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _infer_channels(spec: ModelSpec):
    """Static channel-count inference per layer, for param shapes."""
    produced = {}  # sub-model name -> list of output channel counts
    per_layer = {}  # (sm.name, layer idx) -> (cin, cout) for conv layers
    for sm in spec.sub_models:
        if sm.inputs is None:
            inputs_c = 3
        else:
            srcs = [produced[name][entry_index] for name, entry_index in sm.inputs]
            inputs_c = srcs[0] if len(srcs) == 1 else srcs
        c = inputs_c if not isinstance(inputs_c, list) else inputs_c[0]
        outs_c = []
        for i, layer in enumerate(sm.layers):
            if layer.kind == "convolutional":
                per_layer[(sm.name, i)] = (c, layer["filters"])
                c = layer["filters"]
            elif layer.kind == "route":
                source = dict(layer["source"])
                sel = []
                if "layers" in source:
                    sel.extend(outs_c[int(j)] for j in source["layers"])
                if "inputs" in source:
                    if isinstance(inputs_c, list):
                        sel.extend(inputs_c[int(j)] for j in source["inputs"])
                    else:
                        sel.append(inputs_c)
                c = sum(sel) if len(sel) > 1 else sel[0]
            # shortcut / upsample / maxpool / yolo keep channel count
            outs_c.append(c)
        produced[sm.name] = [outs_c[i] for i in sm.outputs_layers]
    return per_layer


def init_model(rng, spec: ModelSpec, dtype=jnp.float32):
    """Initialize (params, state) pytrees with Keras-default initializers."""
    per_layer = _infer_channels(spec)
    params, state = {}, {}
    for sm in spec.sub_models:
        sm_params, sm_state = {}, {}
        for i, layer in enumerate(sm.layers):
            if layer.kind != "convolutional":
                continue
            cin, cout = per_layer[(sm.name, i)]
            k = layer["size"]
            rng, sub = jax.random.split(rng)
            entry = {"kernel": L.glorot_uniform(sub, (k, k, cin, cout), dtype)}
            if layer["batch_normalize"]:
                entry["bn"] = {
                    "gamma": jnp.ones((cout,), dtype),
                    "beta": jnp.zeros((cout,), dtype),
                }
                sm_state[f"layer{i}"] = {
                    "mean": jnp.zeros((cout,), jnp.float32),
                    "var": jnp.ones((cout,), jnp.float32),
                }
            else:
                entry["bias"] = jnp.zeros((cout,), dtype)
            sm_params[f"layer{i}"] = entry
        params[sm.name] = sm_params
        if sm_state:
            state[sm.name] = sm_state
    return params, state


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------


def l2_regularization(params, decay: float):
    """Keras l2(decay) on every conv kernel: decay * Σ w² (train.py:49 adds
    tf.reduce_sum(model.losses))."""
    total = 0.0
    for sm_params in params.values():
        for entry in sm_params.values():
            k = entry["kernel"].astype(jnp.float32)
            total = total + jnp.sum(k * k)
    return decay * total


def fold_batch_norm(params, state, eps: float = L.BN_EPS):
    """Fold BN into conv kernel+bias for inference (pure params transform).

    y = gamma*(conv(x) - mean)/sqrt(var+eps) + beta
      = conv(x, kernel*s) + (beta - mean*s),  s = gamma/sqrt(var+eps)
    """
    folded = {}
    for sm_name, sm_params in params.items():
        sm_folded = {}
        for key, entry in sm_params.items():
            if "bn" in entry:
                bn = entry["bn"]
                st = state[sm_name][key]
                s = bn["gamma"] / jnp.sqrt(st["var"] + eps)
                sm_folded[key] = {
                    "kernel": entry["kernel"] * s.reshape(1, 1, 1, -1),
                    "bias": bn["beta"] - st["mean"] * s,
                }
            else:
                sm_folded[key] = dict(entry)
        folded[sm_name] = sm_folded
    return folded


def head_grid_sizes(spec: ModelSpec, image_size: int):
    """Grid size of each head output at a given input resolution.

    Derived from the actual graph via eval_shape (abstract, no FLOPs) —
    unlike the reference, which hardcodes grid sizes in the DSL and so only
    works at 416 (core/parse_model.py:209-211 reshape vs model.yaml grid_sizes).
    """
    params_shapes, state_shapes = jax.eval_shape(
        lambda rng: init_model(rng, spec), jax.random.PRNGKey(0)
    )
    outs, _ = jax.eval_shape(
        lambda p, s, im: apply_model(spec, p, s, im),
        params_shapes,
        state_shapes,
        jax.ShapeDtypeStruct((1, image_size, image_size, 3), jnp.float32),
    )
    return tuple(o.shape[1] for o in outs)


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def state_count(state) -> int:
    return sum(x.size for x in jax.tree.leaves(state))
