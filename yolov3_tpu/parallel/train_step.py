"""Jitted train/eval steps — assignment + forward + loss + update in ONE jit.

Everything the reference does per batch across tf.data maps and a Python
GradientTape loop (train.py:38-91, preprocess_dataset.py:122-144) compiles
here into a single XLA program per step: device-side grid-scatter target
assignment, forward pass, 4-term loss, L2 regularization, gradients, and
the Adam update. Under a batch-sharded mesh the same program runs SPMD
over all chips with XLA-inserted gradient all-reduce.

Loss bookkeeping parity (train.py:38-54): per-scale 4-term vectors divided
by batch size; totals/per-grid/per-source metrics returned for logging.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..models.network import apply_model, l2_regularization
from ..ops.assign import assign_targets
from ..ops.loss import yolo_loss_terms
from .mesh import batch_sharding, image_sharding, replicated_sharding


def _base_optimizer(learning_rate, optimizer=None):
    """The reference's Keras-default Adam (train.py:168), or — extension —
    SGD via ``optimizer: sgd`` / ``{type: sgd, momentum: 0.9, nesterov:
    true}`` (Darknet's actual training regime, which the reference swapped
    for Adam)."""
    conf = ({"type": optimizer} if isinstance(optimizer, str)
            else dict(optimizer) if optimizer else {"type": "adam"})
    if "type" not in conf:
        raise ValueError(
            f"optimizer config needs a 'type' key (adam | sgd), got {conf}")
    kind = str(conf.pop("type")).lower()
    if kind == "adam":
        allowed = set()
    elif kind == "sgd":
        allowed = {"momentum", "nesterov"}
    else:
        raise ValueError(f"unknown optimizer type {kind!r} (adam | sgd)")
    unknown = set(conf) - allowed
    if unknown:  # catch typos (e.g. 'momentun') instead of silent defaults
        raise ValueError(
            f"unknown {kind} optimizer keys {sorted(unknown)} "
            f"(allowed: {sorted(allowed)})")
    if kind == "adam":
        return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7)
    return optax.sgd(learning_rate,
                     momentum=float(conf.get("momentum", 0.9)),
                     nesterov=bool(conf.get("nesterov", False)))


def _adam_chain(learning_rate, grad_clip_norm=None, optimizer=None):
    base = _base_optimizer(learning_rate, optimizer)
    if not grad_clip_norm:  # None/0/false-y = off (0 would zero every update)
        return base  # bare optimizer — keeps pre-clip checkpoints' opt-state shape
    if float(grad_clip_norm) < 0:
        raise ValueError(f"grad_clip_norm must be positive, got {grad_clip_norm}")
    return optax.chain(optax.clip_by_global_norm(float(grad_clip_norm)), base)


def make_adam(learning_rate: float, grad_clip_norm=None,
              optimizer=None) -> optax.GradientTransformation:
    """Keras-default Adam (eps 1e-7, vs optax default 1e-8) — train.py:168.

    ``grad_clip_norm`` (extension; the reference never clips): clip the
    GLOBAL gradient norm before the update. ``optimizer`` (extension):
    "sgd" / {type, momentum, nesterov} swaps the base optimizer. Note
    toggling either changes the optimizer-state pytree, so flip them only
    between (not within) runs."""
    return _adam_chain(learning_rate, grad_clip_norm, optimizer)


def make_adam_scheduled(learning_rate: float, grad_clip_norm=None,
                        optimizer=None) -> optax.GradientTransformation:
    """Like ``make_adam`` but with the learning rate exposed as a mutable
    hyperparameter (``opt_state.hyperparams["learning_rate"]``) — the train
    app sets it per epoch from an epoch-keyed schedule, which needs no
    steps-per-epoch knowledge (tfrecords dataset sizes are unknown until
    the first epoch) and keeps ONE compiled step."""
    return optax.inject_hyperparams(
        lambda learning_rate: _adam_chain(learning_rate, grad_clip_norm, optimizer)
    )(learning_rate=learning_rate)


def epoch_learning_rate(base_lr: float, epoch: int, epochs: int,
                        schedule) -> float:
    """Epoch-keyed LR schedule (epoch is 1-based).

    ``schedule``: "cosine" or {type: cosine, warmup_epochs: W,
    min_lr_fraction: f}. Warmup ramps linearly over the first W epochs;
    cosine decays from base_lr to f·base_lr over the remainder.
    """
    conf = {"type": schedule} if isinstance(schedule, str) else dict(schedule)
    kind = conf.get("type", "cosine")
    if kind != "cosine":
        raise ValueError(f"unknown lr_schedule type {kind!r}")
    warmup = int(conf.get("warmup_epochs", 0))
    min_frac = float(conf.get("min_lr_fraction", 0.01))
    if warmup and epoch <= warmup:
        return base_lr * epoch / warmup
    # first post-warmup epoch at full LR, final epoch at the floor
    span = max(epochs - warmup - 1, 1)
    progress = min(max(epoch - warmup - 1, 0) / span, 1.0)
    cos = 0.5 * (1.0 + np.cos(np.pi * progress))
    return base_lr * (min_frac + (1.0 - min_frac) * cos)


def init_train_state(params, state, optimizer, ema: bool = False):
    # own fresh buffers: the jitted step donates the train state, which
    # would otherwise invalidate the caller's (params, state) arrays
    params = jax.tree.map(jnp.array, params)
    state = jax.tree.map(jnp.array, state)
    ts = {
        "params": params,
        "bn_state": state,
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    if ema:
        # EMA shadow of everything serving needs (params + BN statistics),
        # seeded at the initial weights
        ts["ema"] = {
            "params": jax.tree.map(jnp.array, params),
            "bn_state": jax.tree.map(jnp.array, state),
        }
    return ts


def ema_update(ema, new, decay, step, warmup: bool = True):
    """One exponential-moving-average step over a pytree.

    With ``warmup`` the effective decay is ``min(decay, (1+t)/(10+t))`` —
    tf.train.ExponentialMovingAverage's num_updates ramp — so early steps
    track the fast-moving young weights instead of the random init.
    ``step`` is the number of completed updates BEFORE this one (0-based).
    """
    d = jnp.asarray(decay, jnp.float32)
    if warmup:
        t = step.astype(jnp.float32)
        d = jnp.minimum(d, (1.0 + t) / (10.0 + t))
    return jax.tree.map(
        lambda e, n: (e + (1.0 - d) * (n.astype(e.dtype) - e)).astype(e.dtype),
        ema, new,
    )


def _loss_and_metrics(spec, params, bn_state, images, labels, anchors_table,
                      grid_sizes, batch_size, bn_frozen, train,
                      compute_dtype=None, remat=False, qat=False,
                      qat_min_k2cin=0):
    y_true = assign_targets(labels, anchors_table, grid_sizes)
    params_master = params  # L2 regularizes the real weights, QAT or not
    act_transform = None
    if qat:
        # QAT: forward sees the int8 weight lattice the serving tier will
        # realize; gradients flow straight-through to the fp32 masters
        # (ops/quantize.py::fake_quant_weights). Applied BEFORE the
        # mixed-precision cast so the rounding happens in fp32.
        # qat='full' additionally fake-quants every conv input on the
        # serving activation lattice (dynamic per-batch absmax; serving
        # recalibrates scales on the trained weights) — trains against the
        # int8_chain tier's activation rounding too; qat='activations'
        # applies only that, leaving the weights fp. qat_min_k2cin mirrors
        # the serving tier's mixed-precision threshold so the lattice
        # matches the actual deployment configuration.
        from ..ops.quantize import fake_quant_weights, make_activation_fake_quant

        if qat in ("weights", "full", True):
            params = fake_quant_weights(spec, params, min_k2cin=qat_min_k2cin)
        if qat in ("full", "activations"):
            act_transform = make_activation_fake_quant(spec, min_k2cin=qat_min_k2cin)
    if compute_dtype is not None:
        # mixed precision: bf16 compute against fp32 master weights — the
        # cast sits inside the differentiated graph, so gradients come back
        # fp32 at the masters; loss math is fp32 regardless (ops/loss.py)
        images = images.astype(compute_dtype)
        params_c = jax.tree.map(lambda x: x.astype(compute_dtype), params)
    else:
        params_c = params
    outputs, new_bn = apply_model(spec, params_c, bn_state, images,
                                  train=train, bn_frozen=bn_frozen, remat=remat,
                                  conv_input_transform=act_transform)
    terms = jnp.stack(
        [
            yolo_loss_terms(t, p, anchors_table[i], spec.nclasses) / batch_size
            for i, (t, p) in enumerate(zip(y_true, outputs))
        ]
    )  # (nscales, 4) — [xy, wh, obj, class] per grid
    reg = l2_regularization(params_master, spec.decay_factor)
    total = jnp.sum(terms) + reg
    metrics = {
        "total_loss": total,
        "regularization": reg,
        "per_grid": jnp.sum(terms, axis=1),     # (nscales,)
        "per_source": jnp.sum(terms, axis=0),   # (4,) [xy, wh, obj, class]
        "per_grid_per_source": terms,           # (nscales, 4)
    }
    return total, (new_bn, metrics)


def make_train_step(spec, anchors_table, grid_sizes, batch_size,
                    optimizer, mesh=None, bn_frozen=(), trainable_mask=None,
                    compute_dtype=None, remat=False, augment=None, seed=0,
                    accum_steps: int = 1, qat=False, qat_min_k2cin: int = 0,
                    ema_decay=None, ema_warmup: bool = True):
    """Returns step(train_state, images, labels) → (train_state, metrics).

    ``trainable_mask``: optional pytree of bools matching params — False
    leaves get zero gradient (transfer-learning freeze_train_list; with
    Adam a zero gradient yields an exactly-zero update, matching Keras's
    exclusion of non-trainable variables).
    ``augment``: optional dict of ops/augment.py::augment_batch kwargs —
    device-side flip/scale/color augmentation keyed off the step counter.
    ``accum_steps``: split the batch into N microbatches scanned
    sequentially, averaging gradients — effective batches beyond HBM
    capacity (activations are per-microbatch; BN statistics too, so
    BN behaves like microbatch-local BN — same caveat as any
    grad-accumulation scheme).
    ``qat``: False | True/'weights' (fake-quant conv kernels on the int8
    serving lattice, STE) | 'activations' (conv-input fake-quant only,
    weights fp) | 'full' (weights + per-batch activation fake-quant on
    every conv input the int8_chain tier quantizes). ``qat_min_k2cin``
    mirrors serving's mixed-precision threshold (quantize_params'
    min_k2cin) so QAT skips the same convs serving leaves in bf16.
    ``ema_decay``: maintain an exponential moving average of params + BN
    statistics in ``train_state["ema"]`` (init_train_state(ema=True)),
    updated inside the same jit — two fused axpy sweeps, no extra passes.
    """
    anchors_table = jnp.asarray(anchors_table, jnp.float32)
    grid_sizes = tuple(int(g) for g in grid_sizes)

    loss_fn = partial(
        _loss_and_metrics, spec,
        anchors_table=anchors_table, grid_sizes=grid_sizes,
        batch_size=batch_size, bn_frozen=tuple(bn_frozen), train=True,
        compute_dtype=compute_dtype, remat=remat, qat=qat,
        qat_min_k2cin=qat_min_k2cin,
    )

    aug_kwargs = dict(augment) if isinstance(augment, dict) else {}
    base_key = jax.random.PRNGKey(seed)

    def step(train_state, images, labels):
        params = train_state["params"]
        if augment is not None:
            from ..ops.augment import augment_batch

            key = jax.random.fold_in(base_key, train_state["step"])
            images, labels = augment_batch(images, labels, key, **aug_kwargs)

        if accum_steps > 1:
            if batch_size % accum_steps:
                raise ValueError(f"batch {batch_size} not divisible by accum_steps {accum_steps}")
            micro = batch_size // accum_steps
            # strided split (element i → microbatch i % accum) so each
            # microbatch spans all devices evenly under batch sharding
            def split(x):
                return jnp.swapaxes(x.reshape(micro, accum_steps, *x.shape[1:]), 0, 1)

            images_m = split(images)
            labels_m = split(labels)

            grad_fn = jax.value_and_grad(
                lambda p, bn, im, lb: _loss_and_metrics(
                    spec, p, bn, im, lb, anchors_table, grid_sizes,
                    micro, tuple(bn_frozen), True, compute_dtype, remat, qat,
                    qat_min_k2cin,
                ),
                has_aux=True,
            )

            def body(carry, xs):
                grads_acc, bn, metrics_acc = carry
                im, lb = xs
                (_, (new_bn, metrics)), grads = grad_fn(params, bn, im, lb)
                grads_acc = jax.tree.map(lambda a, g: a + g, grads_acc, grads)
                metrics_acc = jax.tree.map(lambda a, m: a + m, metrics_acc, metrics)
                return (grads_acc, new_bn, metrics_acc), None

            zeros_grads = jax.tree.map(jnp.zeros_like, params)
            (_, (_, metrics_shape)), _ = jax.eval_shape(
                grad_fn, params, train_state["bn_state"], images_m[0], labels_m[0]
            )
            zeros_metrics = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape
            )
            (grads, new_bn, metrics_sum), _ = lax.scan(
                body, (zeros_grads, train_state["bn_state"], zeros_metrics),
                (images_m, labels_m),
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            metrics = jax.tree.map(lambda m: m / accum_steps, metrics_sum)
        else:
            grad_fn = jax.value_and_grad(
                lambda p: loss_fn(p, train_state["bn_state"], images, labels),
                has_aux=True,
            )
            (_, (new_bn, metrics)), grads = grad_fn(params)
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g * m, grads,
                jax.tree.map(lambda t: jnp.asarray(t, jnp.float32), trainable_mask),
            )
        updates, new_opt_state = optimizer.update(grads, train_state["opt_state"], params)
        new_params = optax.apply_updates(params, updates)
        new_train_state = {
            "params": new_params,
            "bn_state": new_bn,
            "opt_state": new_opt_state,
            "step": train_state["step"] + 1,
        }
        if ema_decay is not None:
            new_train_state["ema"] = ema_update(
                train_state["ema"], {"params": new_params, "bn_state": new_bn},
                ema_decay, train_state["step"], warmup=ema_warmup,
            )
        return new_train_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    data = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    # images additionally shard H over a 'spatial' mesh axis when present
    # (mesh.py: GSPMD spatial partitioning); labels/targets stay batch-only
    return jax.jit(
        step,
        in_shardings=(repl, image_sharding(mesh), data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(spec, anchors_table, grid_sizes, batch_size, mesh=None, bn_frozen=()):
    """Validation loss step (no update) — mirrors train.py:80-91."""
    anchors_table = jnp.asarray(anchors_table, jnp.float32)
    grid_sizes = tuple(int(g) for g in grid_sizes)

    def step(params, bn_state, images, labels):
        _, (_, metrics) = _loss_and_metrics(
            spec, params, bn_state, images, labels, anchors_table,
            grid_sizes, batch_size, tuple(bn_frozen), train=False,
        )
        return metrics

    if mesh is None:
        return jax.jit(step)
    data = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, repl, image_sharding(mesh), data),
                   out_shardings=repl)
