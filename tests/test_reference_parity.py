"""Golden parity tests against the TF2 reference implementation.

These run only when the reference mount (/root/reference) and tensorflow
are both available; they pin our math to the reference's observable
behavior (SURVEY §6 functional baselines).
"""

import os
import sys

import numpy as np
import pytest

from .conftest import REFERENCE, has_reference, has_tf

pytestmark = pytest.mark.skipif(
    not (has_reference() and has_tf()), reason="reference mount or TF unavailable"
)


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    sys.path.insert(0, REFERENCE)
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    yield
    os.chdir(cwd)
    sys.path.remove(REFERENCE)


def _rand_labels(rng, b=4, m=20, nclasses=7):
    labels = np.zeros((b, m, 6), np.float32)
    for i in range(b):
        n = rng.randint(1, 8)
        xy = rng.rand(n, 2) * 0.6
        wh = rng.rand(n, 2) * 0.35 + 0.02
        labels[i, :n, 0:2] = xy
        labels[i, :n, 2:4] = np.clip(xy + wh, 0, 0.999)
        labels[i, :n, 4] = 1
        labels[i, :n, 5] = rng.randint(0, nclasses, n)
    return labels


ANCHORS = np.array(
    [[0.05, 0.06], [0.1, 0.12], [0.2, 0.18],
     [0.3, 0.28], [0.38, 0.4], [0.5, 0.45],
     [0.6, 0.62], [0.75, 0.7], [0.9, 0.88]], np.float32).reshape(3, 3, 2)


def test_assigner_bit_exact_vs_reference():
    import tensorflow as tf
    import jax.numpy as jnp
    from core.preprocess_dataset import PreprocessDataset
    from yolov3_tpu.ops.assign import assign_targets

    rng = np.random.RandomState(3)
    labels = _rand_labels(rng)
    grid_sizes = [13, 26, 52]
    pp = PreprocessDataset()
    ref = [
        pp._arrange_in_grid(tf.constant(labels), tf.convert_to_tensor(ANCHORS), g,
                            [labels.shape[0], gs, gs, 3, 6], labels.shape[1]).numpy()
        for g, gs in enumerate(grid_sizes)
    ]
    ours = assign_targets(jnp.asarray(labels), ANCHORS, grid_sizes)
    for r, o in zip(ref, ours):
        np.testing.assert_array_equal(r, np.asarray(o))


def test_loss_matches_reference():
    import tensorflow as tf
    import jax.numpy as jnp
    from core.loss_func import get_loss_func
    from core.preprocess_dataset import PreprocessDataset
    from yolov3_tpu.ops.loss import yolo_loss_terms

    rng = np.random.RandomState(3)
    labels = _rand_labels(rng)
    nclasses = 7
    pp = PreprocessDataset()
    for g, gs in enumerate([13, 26]):
        y_true = pp._arrange_in_grid(
            tf.constant(labels), tf.convert_to_tensor(ANCHORS), g,
            [labels.shape[0], gs, gs, 3, 6], labels.shape[1]).numpy()
        y_pred = (rng.randn(labels.shape[0], gs, gs, 3, 5 + nclasses) * 0.5).astype(np.float32)
        ref = get_loss_func(tf.convert_to_tensor(ANCHORS[g]), nclasses,
                            tf.constant(True))(tf.constant(y_true), tf.constant(y_pred)).numpy()
        ours = np.asarray(yolo_loss_terms(jnp.asarray(y_true), jnp.asarray(y_pred),
                                          ANCHORS[g], nclasses))
        np.testing.assert_allclose(ours, ref, rtol=5e-5)


def test_decode_matches_reference():
    import tensorflow as tf
    import jax.numpy as jnp
    from core.yolo_decode_layer import yolo_decode as ref_decode
    from yolov3_tpu.ops.decode import yolo_decode

    rng = np.random.RandomState(0)
    nclasses = 7
    grids = [rng.randn(2, g, g, 3, 5 + nclasses).astype(np.float32) for g in (13, 26, 52)]
    rb, rc, rp = ref_decode([tf.constant(g) for g in grids], tf.constant(ANCHORS), nclasses)
    ob, oc, op = yolo_decode([jnp.asarray(g) for g in grids], ANCHORS, nclasses)
    np.testing.assert_allclose(rb.numpy(), np.asarray(ob), atol=1e-4)
    np.testing.assert_allclose(rc.numpy(), np.asarray(oc), atol=1e-5)
    np.testing.assert_allclose(rp.numpy(), np.asarray(op), atol=1e-5)


def test_nms_selected_indices_match_tf():
    import tensorflow as tf
    import jax.numpy as jnp
    from yolov3_tpu.ops.nms import yolo_nms

    for seed, iou_t, score_t, max_boxes in (
        (0, 0.5, 0.3, 100), (1, 0.3, 0.0, 50), (2, 0.7, 0.6, 20), (3, 0.5, 0.9, 100),
    ):
        rng = np.random.RandomState(seed)
        B, N, nclasses = 3, 400, 7
        xy = rng.rand(B, N, 2) * 0.8
        wh = rng.rand(B, N, 2) * 0.2 + 0.02
        boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
        # inject exact duplicates to exercise tie-breaking
        boxes[:, 50] = boxes[:, 10]
        conf = rng.rand(B, N, 1).astype(np.float32)
        conf[:, 50] = conf[:, 10]
        probs = rng.rand(B, N, nclasses).astype(np.float32)
        probs[:, 50] = probs[:, 10]

        scores = (conf[..., 0] * probs.max(-1)).astype(np.float32)
        sel_ref, nv_ref = tf.image.non_max_suppression_padded(
            boxes=tf.constant(boxes), scores=tf.constant(scores),
            max_output_size=max_boxes, iou_threshold=iou_t, score_threshold=score_t,
            pad_to_max_output_size=True)
        _, _, _, sel, nv = yolo_nms(jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(probs),
                                    max_boxes=max_boxes, iou_threshold=iou_t,
                                    score_threshold=score_t)
        np.testing.assert_array_equal(nv_ref.numpy(), np.asarray(nv), err_msg=f"seed {seed}")
        for b in range(B):
            np.testing.assert_array_equal(
                sel_ref.numpy()[b][: nv_ref.numpy()[b]], np.asarray(sel)[b][: int(nv[b])],
                err_msg=f"seed {seed} batch {b}",
            )


def test_nms_exact_at_eval_sweep_thresholds():
    """Full YOLOv3-416 candidate count (N=10,647) at the reference eval
    sweep's low thresholds (0.004 / 0.1 — config/evaluate_config.yaml),
    where far more than the default K=512 candidates beat the threshold.
    yolo_nms_exact must escalate K and stay index-exact vs TF's full NMS.

    Two regimes: scattered boxes (keeps hit max_boxes inside top-K — no
    escalation needed, exactness condition short-circuits) and heavily
    clustered boxes (few survivors, thousands of candidates above threshold
    — forces escalation up to K=N)."""
    import tensorflow as tf
    import jax.numpy as jnp
    from yolov3_tpu.ops.nms import yolo_nms_exact

    N, nclasses, max_boxes = 10647, 80, 100

    def run_case(boxes, conf, probs, score_t, iou_t=0.5):
        scores = (conf[..., 0] * probs.max(-1)).astype(np.float32)
        sel_ref, nv_ref = tf.image.non_max_suppression_padded(
            boxes=tf.constant(boxes), scores=tf.constant(scores),
            max_output_size=max_boxes, iou_threshold=iou_t,
            score_threshold=score_t, pad_to_max_output_size=True)
        _, _, _, sel, nv = yolo_nms_exact(
            jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(probs),
            max_boxes=max_boxes, iou_threshold=iou_t, score_threshold=score_t)
        np.testing.assert_array_equal(nv_ref.numpy(), np.asarray(nv))
        for b in range(boxes.shape[0]):
            np.testing.assert_array_equal(
                sel_ref.numpy()[b][: nv_ref.numpy()[b]],
                np.asarray(sel)[b][: int(nv[b])])

    # scattered: nearly everything beats 0.004, keeps reach max_boxes fast
    rng = np.random.RandomState(11)
    xy = rng.rand(1, N, 2) * 0.9
    wh = rng.rand(1, N, 2) * 0.08 + 0.01
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
    conf = (rng.rand(1, N, 1) * 0.9 + 0.1).astype(np.float32)
    probs = rng.rand(1, N, nclasses).astype(np.float32)
    for score_t in (0.004, 0.1):
        run_case(boxes, conf, probs, score_t)

    # clustered: ~30 tight clusters → ≪ max_boxes survivors, escalation to N
    centers = rng.rand(30, 2) * 0.9
    idx = rng.randint(0, 30, N)
    cxy = centers[idx] + rng.randn(N, 2) * 1e-4
    cwh = np.full((N, 2), 0.08) + rng.randn(N, 2) * 1e-4
    cboxes = np.concatenate([cxy, cxy + cwh], axis=-1)[None].astype(np.float32)
    run_case(cboxes, conf, probs, 0.004)


def _copy_ref_weights(ref, spec, params, state):
    """Copy a reference Keras model's weights into our (params, state) trees.

    Keras auto-numbers conv2d/batch_normalization layers globally across the
    nested sub-models in creation order (the property convert.py's ordering
    walk relies on, reference convert.py:93-137), which matches our spec's
    config-order conv walk exactly.
    """
    import jax.numpy as jnp

    def idx_of(name, prefix):
        rest = name[len(prefix):]
        return 0 if rest == "" else int(rest[1:])

    convs, bns = [], []
    for lyr in ref.layers:
        if hasattr(lyr, "layers"):
            for l2 in lyr.layers:
                if l2.name.startswith("conv2d"):
                    convs.append(l2)
                if l2.name.startswith("batch_normalization"):
                    bns.append(l2)
    convs.sort(key=lambda l: idx_of(l.name, "conv2d"))
    bns.sort(key=lambda l: idx_of(l.name, "batch_normalization"))

    ci = bi = 0
    for sm in spec.sub_models:
        for i, layer in enumerate(sm.layers):
            if layer.kind != "convolutional":
                continue
            entry = params[sm.name][f"layer{i}"]
            kl = convs[ci]; ci += 1
            entry["kernel"] = jnp.asarray(kl.kernel.numpy())
            if "bn" in entry:
                bl = bns[bi]; bi += 1
                entry["bn"]["gamma"] = jnp.asarray(bl.gamma.numpy())
                entry["bn"]["beta"] = jnp.asarray(bl.beta.numpy())
                state[sm.name][f"layer{i}"]["mean"] = jnp.asarray(bl.moving_mean.numpy())
                state[sm.name][f"layer{i}"]["var"] = jnp.asarray(bl.moving_variance.numpy())
            else:
                entry["bias"] = jnp.asarray(kl.bias.numpy())
    assert ci == len(convs) and bi == len(bns)
    return params, state


def test_forward_parity_tiny():
    """Full-model forward parity vs the reference Keras graph (weights
    copied across) — conv stacking tolerance covers oneDNN round-off."""
    import yaml
    import jax
    import jax.numpy as jnp
    from tensorflow.keras import Input
    from core.parse_model import ParseModel
    from yolov3_tpu.models import parse_model_config, init_model, apply_model

    cfg = "config/models/yolov3_tiny/model.yaml"
    with open(cfg) as f:
        mc = yaml.safe_load(f)
    ref = ParseModel().build_model(Input(shape=(None, None, 3)), nclasses=7, **mc)

    spec = parse_model_config(cfg, nclasses=7)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    params, state = _copy_ref_weights(ref, spec, params, state)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 416, 416, 3).astype(np.float32)
    ref_outs = ref(x, training=False)
    outs, _ = apply_model(spec, params, state, jnp.asarray(x))
    for ro, jo in zip(ref_outs, outs):
        ro, jo = np.asarray(ro), np.asarray(jo)
        rel = np.abs(ro - jo).max() / (np.abs(ro).max() + 1e-9)
        assert rel < 3e-2, f"forward rel diff {rel}"


@pytest.fixture(scope="module")
def full_model_taps():
    """Reference full YOLOv3-80 graph + per-sub-model activation taps on a
    fixed input, plus our spec/params with the reference weights copied in.
    Built once for the whole parametrized activation-parity sweep."""
    import tensorflow as tf
    import yaml
    import jax
    from tensorflow.keras import Input
    from core.parse_model import ParseModel
    from yolov3_tpu.models import parse_model_config, init_model

    cfg = "config/models/yolov3/model.yaml"
    with open(cfg) as f:
        mc = yaml.safe_load(f)
    ref = ParseModel().build_model(Input(shape=(416, 416, 3)), nclasses=80, **mc)

    spec = parse_model_config(cfg, nclasses=80)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    params, state = _copy_ref_weights(ref, spec, params, state)

    # collect reference activation taps by running each nested Keras
    # sub-model eagerly in config (topological) order, wiring inputs the way
    # build_model does (parse_model.py:279-314) — this also cross-checks our
    # spec's (name, entry_index) wiring against the reference graph
    sub_layers = {l.name: l for l in ref.layers if isinstance(l, tf.keras.Model)}
    assert set(sub_layers) == {sm.name for sm in spec.sub_models}
    rng = np.random.RandomState(7)
    x = rng.rand(1, 416, 416, 3).astype(np.float32)
    ref_taps = {}
    for sm in spec.sub_models:
        if sm.inputs is None:
            inp = x
        else:
            srcs = [ref_taps[name][entry_index] for name, entry_index in sm.inputs]
            inp = srcs[0] if len(srcs) == 1 else srcs
        out = sub_layers[sm.name](inp, training=False)
        ref_taps[sm.name] = [np.asarray(t) for t in (out if isinstance(out, list) else [out])]
    return spec, params, state, x, ref_taps


FULL_SUB_MODELS = ["backbone", "neck0", "head0", "neck1", "head1", "neck2", "head2"]


@pytest.mark.parametrize("sm_name", FULL_SUB_MODELS)
def test_full_model_activation_parity(full_model_taps, sm_name):
    """Per-sub-model activation parity on full YOLOv3-80, fp32, ≤1e-3
    relative per tap (SURVEY §7 step 3). Each sub-model is fed the
    *reference's* input activations, so round-off does not compound across
    the Darknet-53 stack — this isolates any semantic divergence to the
    sub-model under test. Match: reference core/parse_model.py:279-314."""
    import jax.numpy as jnp
    from yolov3_tpu.models.network import _apply_sub_model

    spec, params, state, x, ref_taps = full_model_taps
    sm = next(s for s in spec.sub_models if s.name == sm_name)

    if sm.inputs is None:
        inputs_entry = jnp.asarray(x)
    else:
        srcs = [jnp.asarray(ref_taps[name][entry_index]) for name, entry_index in sm.inputs]
        inputs_entry = srcs[0] if len(srcs) == 1 else srcs

    outs, _ = _apply_sub_model(sm, params[sm.name], state.get(sm.name, {}),
                               inputs_entry, spec.nclasses, train=False)
    ref_outs = ref_taps[sm_name]
    assert len(outs) == len(ref_outs)
    for tap_i, (ro, jo) in enumerate(zip(ref_outs, outs)):
        jo = np.asarray(jo)
        rel = np.abs(ro - jo).max() / (np.abs(ro).max() + 1e-9)
        assert rel <= 1e-3, f"{sm_name} tap {tap_i}: rel diff {rel:.2e}"


@pytest.mark.parametrize("hw", [(427, 640), (640, 427), (500, 333), (99, 100), (123, 77)])
def test_letterbox_resize_parity(hw):
    """letterbox_resize exactly matches the reference's resize_image
    (core/utils.py:17-28 = tf.image.resize(preserve_aspect_ratio=True) +
    pad_to_bounding_box) for non-square inputs — including TF's
    round-half-to-even scaled-dim computation (floor diverges by one row
    e.g. at 427x640->416: 278 vs 277)."""
    import tensorflow as tf
    from core.utils import resize_image
    from yolov3_tpu.data.image import letterbox_resize

    h, w = hw
    rng = np.random.RandomState(h + w)
    img = rng.rand(h, w, 3).astype(np.float32)
    ref = resize_image(tf.constant(img), 416, 416).numpy()
    ours = letterbox_resize(img, 416, 416)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_forward_parity_spp():
    """Full-model forward parity for the bundled YOLOv3-SPP variant: the
    reference's own ParseModel builds our generated
    config/models/yolov3_spp/model.yaml (its route/maxpool vocab covers the
    SPP block — parse_model.py:78-140), weights are copied across, and the
    heads must agree. Isolates the SPP neck too: neck0's output is compared
    at 1e-3 on the reference's own input activations."""
    import yaml
    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from tensorflow.keras import Input
    from core.parse_model import ParseModel
    from yolov3_tpu.models import parse_model_config, init_model, apply_model
    from yolov3_tpu.models.network import _apply_sub_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = os.path.join(repo, "config", "models", "yolov3_spp", "model.yaml")
    with open(cfg) as f:
        mc = yaml.safe_load(f)
    for sm_conf in mc["sub_models_configs"]:
        sm_conf["layers_config_file"] = os.path.join(repo, sm_conf["layers_config_file"])
    ref = ParseModel().build_model(Input(shape=(416, 416, 3)), nclasses=80, **mc)

    spec = parse_model_config(cfg, nclasses=80)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    params, state = _copy_ref_weights(ref, spec, params, state)

    rng = np.random.RandomState(11)
    x = rng.rand(1, 416, 416, 3).astype(np.float32)

    # whole-stack head parity (conv-stacking tolerance, like the tiny test)
    ref_outs = ref(x, training=False)
    outs, _ = apply_model(spec, params, state, jnp.asarray(x))
    for ro, jo in zip(ref_outs, outs):
        ro, jo = np.asarray(ro), np.asarray(jo)
        rel = np.abs(ro - jo).max() / (np.abs(ro).max() + 1e-9)
        assert rel < 3e-2, f"spp forward rel diff {rel}"

    # SPP neck isolated at tight tolerance: feed the reference backbone's
    # 13-grid tap to both neck0s
    sub_layers = {l.name: l for l in ref.layers if isinstance(l, tf.keras.Model)}
    bb_taps = sub_layers["backbone"](x, training=False)
    ref_neck0 = np.asarray(sub_layers["neck0"](bb_taps[2], training=False))
    sm = next(s for s in spec.sub_models if s.name == "neck0")
    ours, _ = _apply_sub_model(sm, params["neck0"], state.get("neck0", {}),
                               jnp.asarray(np.asarray(bb_taps[2])), spec.nclasses,
                               train=False)
    ours = np.asarray(ours[0])
    rel = np.abs(ref_neck0 - ours).max() / (np.abs(ref_neck0).max() + 1e-9)
    assert rel <= 1e-3, f"spp neck0 rel diff {rel:.2e}"



def test_train_gradient_parity():
    """Training-step parity one level deeper than the loss tests: the full
    total loss (per-scale 4-term / batch_size + L2, reference
    train.py:38-54) AND its gradients w.r.t. every conv kernel/bias and BN
    gamma/beta must match a TF GradientTape over a reference-built model
    with the reference loss closures (train.py:170-171), both in training
    mode (batch-statistics BN). Pins our AD + train-mode forward against
    the reference's actual optimization math.

    Uses a small fixed two-head topology at 64x64 covering the full vocab
    (BN and bias convs, stride 2, shortcut, route concat, maxpool,
    upsample): at 416x416 the first conv's weight gradient sums ~350k f32
    products with heavy cancellation and TF's oneDNN reduction order makes
    the comparison nondeterministic at the 1e-2 level — at 64x64 the
    accumulation noise stays below the 1e-3 gate."""
    import tempfile
    import yaml
    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from tensorflow.keras import Input
    from core.parse_model import ParseModel
    from core.loss_func import get_loss_func
    from yolov3_tpu.models import parse_model_config, init_model
    from yolov3_tpu.ops.assign import assign_targets
    from yolov3_tpu.parallel.train_step import _loss_and_metrics

    nclasses, B, IMAGE = 3, 2, 64

    body = [
        {"type": "route", "source": {"inputs": [0]}},
        {"type": "convolutional", "filters": 8, "size": 3, "stride": 1,
         "pad": 1, "activation": "leaky", "batch_normalize": 1},
        {"type": "convolutional", "filters": 16, "size": 3, "stride": 2,
         "pad": 1, "activation": "leaky", "batch_normalize": 1},
        # residual block
        {"type": "convolutional", "filters": 8, "size": 1, "stride": 1,
         "pad": 1, "activation": "leaky", "batch_normalize": 1},
        {"type": "convolutional", "filters": 16, "size": 3, "stride": 1,
         "pad": 1, "activation": "leaky", "batch_normalize": 1},
        {"type": "shortcut", "from": -3, "activation": "linear"},
        # bias conv (no BN)
        {"type": "convolutional", "filters": 16, "size": 3, "stride": 2,
         "pad": 1, "activation": "leaky"},
        {"type": "maxpool", "size_xy": [2, 2], "stride_xy": [2, 2],
         "padding": "same"},                                   # 7: scale 8
        {"type": "convolutional", "filters": 24, "size": 3, "stride": 2,
         "pad": 1, "activation": "leaky", "batch_normalize": 1},  # 8: scale 16
        {"type": "upsample", "stride": 2},                        # 9: scale 8
        {"type": "route", "source": {"layers": [-1, -3]}},        # 10: 24+16 ch
        {"type": "convolutional", "filters": 16, "size": 1, "stride": 1,
         "pad": 1, "activation": "leaky", "batch_normalize": 1},  # 11: scale 8
    ]

    def head(grid):
        return [
            {"type": "route", "source": {"inputs": [0]}},
            {"type": "convolutional", "filters": 16, "size": 3, "stride": 1,
             "pad": 1, "activation": "leaky", "batch_normalize": 1},
            {"type": "convolutional", "filters": "3*(2+2+1+nclasses)",
             "size": 1, "stride": 1, "pad": 1, "activation": "linear"},
            {"type": "yolo", "grid_size": grid, "jitter": 0.3},
        ]

    with tempfile.TemporaryDirectory() as tmp:
        for name, layers in (("body.yaml", body),
                             ("head_a.yaml", head(IMAGE // 16)),
                             ("head_b.yaml", head(IMAGE // 8))):
            with open(os.path.join(tmp, name), "w") as f:
                yaml.safe_dump({"layers_config": layers}, f)
        model = {
            "decay_factor": 0.0005, "output_stage": "head",
            "grid_sizes": [IMAGE // 16, IMAGE // 8],
            "sub_models_configs": [
                {"name": "body", "layers_config_file": f"{tmp}/body.yaml",
                 "outputs_layers": [8, -1]},
                {"name": "head_a", "layers_config_file": f"{tmp}/head_a.yaml",
                 "inputs": {"source": [{"name": "body", "entry_index": 0}]},
                 "outputs_layers": [-1]},
                {"name": "head_b", "layers_config_file": f"{tmp}/head_b.yaml",
                 "inputs": {"source": [{"name": "body", "entry_index": 1}]},
                 "outputs_layers": [-1]},
            ],
        }
        model_path = os.path.join(tmp, "model.yaml")
        with open(model_path, "w") as f:
            yaml.safe_dump(model, f)

        ref = ParseModel().build_model(Input(shape=(IMAGE, IMAGE, 3)),
                                       nclasses=nclasses, **model)
        spec = parse_model_config(model_path, nclasses=nclasses)

    params, state = init_model(jax.random.PRNGKey(1), spec)
    params, state = _copy_ref_weights(ref, spec, params, state)

    rng = np.random.RandomState(5)
    images = rng.rand(B, IMAGE, IMAGE, 3).astype(np.float32)
    labels = _rand_labels(rng, b=B, nclasses=nclasses)
    anchors = ANCHORS[:2]  # 2 scales
    grid_sizes = (IMAGE // 16, IMAGE // 8)

    # y_true for the TF side from our assigner (bit-exact vs the reference's
    # — test_assigner_bit_exact_vs_reference)
    y_true = [np.asarray(t) for t in
              assign_targets(jnp.asarray(labels), anchors, grid_sizes)]

    def _flat(o):
        if isinstance(o, (list, tuple)):
            for e in o:
                yield from _flat(e)
        else:
            yield o

    # reference _calc_loss under GradientTape (eager 4-term closures).
    # Wrapped in a function so the TF pass can be recomputed: the math is
    # deterministic (batch BN stats, not moving averages), so two passes
    # agree unless oneDNN's thread partitioning shifted mid-run.
    loss_fns = [get_loss_func(anchors[i], nclasses, tf.constant(True))
                for i in range(2)]

    def ref_pass():
        with tf.GradientTape() as tape:
            outputs = list(_flat(ref(tf.constant(images), training=True)))
            reg = tf.reduce_sum(ref.losses)
            pred_loss = [loss_fns[i](tf.constant(y_true[i]), outputs[i]) / B
                         for i in range(2)]
            ref_total = tf.reduce_sum(tf.stack(pred_loss)) + reg
        return ref_total, tape

    ref_total, tape = ref_pass()

    # TF variables in our conv-walk order (same walk as _copy_ref_weights)
    def idx_of(name, prefix):
        rest = name[len(prefix):]
        return 0 if rest == "" else int(rest[1:])

    convs, bns = [], []
    for lyr in ref.layers:
        if hasattr(lyr, "layers"):
            for l2 in lyr.layers:
                if l2.name.startswith("conv2d"):
                    convs.append(l2)
                if l2.name.startswith("batch_normalization"):
                    bns.append(l2)
    convs.sort(key=lambda l: idx_of(l.name, "conv2d"))
    bns.sort(key=lambda l: idx_of(l.name, "batch_normalization"))

    tf_vars, keys = [], []
    ci = bi = 0
    for sm in spec.sub_models:
        for i, layer in enumerate(sm.layers):
            if layer.kind != "convolutional":
                continue
            kl = convs[ci]; ci += 1
            tf_vars.append(kl.kernel); keys.append((sm.name, i, "kernel"))
            if layer.get("batch_normalize"):
                bl = bns[bi]; bi += 1
                tf_vars.append(bl.gamma); keys.append((sm.name, i, "gamma"))
                tf_vars.append(bl.beta); keys.append((sm.name, i, "beta"))
            else:
                tf_vars.append(kl.bias); keys.append((sm.name, i, "bias"))
    assert ci == len(convs) and bi == len(bns)
    tf_grads = tape.gradient(ref_total, tf_vars)

    # our total + grads
    def total_fn(p):
        total, _aux = _loss_and_metrics(
            spec, p, state, jnp.asarray(images), jnp.asarray(labels),
            anchors, grid_sizes, batch_size=B, bn_frozen=(), train=True)
        return total

    our_total, our_grads = jax.value_and_grad(total_fn)(params)

    rel_total = abs(float(ref_total) - float(our_total)) / (abs(float(ref_total)) + 1e-9)
    assert rel_total <= 1e-5, f"total loss rel diff {rel_total:.2e}"

    def mismatches(tf_grads):
        bad = []
        for (sm_name, i, which), tg in zip(keys, tf_grads):
            entry = our_grads[sm_name][f"layer{i}"]
            og = {"kernel": lambda: entry["kernel"],
                  "bias": lambda: entry["bias"],
                  "gamma": lambda: entry["bn"]["gamma"],
                  "beta": lambda: entry["bn"]["beta"]}[which]()
            tg, og = np.asarray(tg), np.asarray(og)
            rel = np.abs(tg - og).max() / (np.abs(tg).max() + 1e-9)
            # gate 2.5e-3, not 1e-3: TF's oneDNN thread partitioning shifts
            # the reduction order under full-suite CPU contention — observed
            # 1.67e-3 on a conv kernel grad in one suite run, ~2e-4 standalone
            if rel > 2.5e-3:
                bad.append(f"{sm_name} layer{i} {which}: grad rel diff {rel:.2e}")
        return bad

    bad = mismatches(tf_grads)
    if bad:
        # one retry with a fresh TF pass: under heavy external CPU load
        # (e.g. a concurrent training job) oneDNN's accumulation order can
        # drift far past the contention gate (observed 8.6e-2 in one suite
        # run that passed standalone). The comparison math is deterministic,
        # so a REAL divergence fails both attempts identically.
        ref_total2, tape2 = ref_pass()
        bad2 = mismatches(tape2.gradient(ref_total2, tf_vars))
        assert not bad2, (f"gradient parity failed twice — first: {bad}; "
                          f"retry: {bad2}")


def test_evaluator_counters_match_reference():
    """Randomized golden: per-class tp/fp/fn/preds/gts + errors/examples
    from our fixed-shape vmapped evaluator must equal the reference's
    ragged per-image EvaluateDetections (evaluate_detections.py:120-145)
    over a stream of random images — including greedy gt assignment order
    and the duplicate-TP quirk (assignment mask read before update).

    The negative-gt-class 'errors' path is deliberately NOT part of this
    golden: the reference's try/except lives inside a @tf.function
    (evaluate_detections.py:64-72), which cannot catch the runtime scatter
    error — a -1 gt class makes the reference CRASH with
    InvalidArgumentError (verified in this environment), so its errors
    counter is unreachable at runtime. We implement the documented intent
    (count the error, skip the image) — pinned by the intent-based unit
    test test_negative_class_counts_error_only."""
    import tensorflow as tf
    from evaluate_detections import EvaluateDetections as RefEval
    from yolov3_tpu.eval.detections_evaluator import EvaluateDetections

    nclasses, iou_t = 5, 0.5
    P, G, NIMG = 8, 6, 24
    rng = np.random.RandomState(42)

    ref = RefEval(nclasses, iou_t)
    ours = EvaluateDetections(nclasses, iou_t)

    for img in range(NIMG):
        n_p = rng.randint(1, P + 1)
        n_g = rng.randint(1, G + 1)
        # overlapping-ish boxes so IoU decisions actually trigger
        centers = rng.rand(max(n_p, n_g), 2) * 0.7 + 0.1
        def boxes_from(n):
            c = centers[rng.randint(0, len(centers), n)]
            wh = rng.rand(n, 2) * 0.25 + 0.05
            b = np.concatenate([c - wh / 2, c + wh / 2], -1)
            return np.clip(b, 0, 1).astype(np.float32)
        pb, gb = boxes_from(n_p), boxes_from(n_g)
        pc = rng.randint(0, nclasses, n_p).astype(np.int32)
        gc = rng.randint(0, nclasses, n_g).astype(np.int32)

        ref.evaluate(tf.RaggedTensor.from_tensor(tf.constant(pb)),
                     tf.constant(pc), tf.constant(gb), tf.constant(gc))

        pv = np.zeros((1, P), bool); pv[0, :n_p] = True
        gv = np.zeros((1, G), bool); gv[0, :n_g] = True
        pb_pad = np.zeros((1, P, 4), np.float32); pb_pad[0, :n_p] = pb
        gb_pad = np.zeros((1, G, 4), np.float32); gb_pad[0, :n_g] = gb
        pc_pad = np.zeros((1, P), np.int32); pc_pad[0, :n_p] = pc
        gc_pad = np.zeros((1, G), np.int32); gc_pad[0, :n_g] = gc
        ours.evaluate_batch(pb_pad, pc_pad, pv, gb_pad, gc_pad, gv)

    for key in ("preds", "gts", "tp", "fp", "fn"):
        np.testing.assert_array_equal(
            np.asarray(ref.counters[key]), ours.counters[key],
            err_msg=f"counter {key}")
    assert int(ref.counters["errors"]) == ours.counters["errors"]
    assert int(ref.counters["examples"]) == ours.counters["examples"]


def test_darknet_importer_cross_validated_vs_reference_convert(
        tmp_path, repo_root, monkeypatch):
    """Pin the Darknet ``.weights`` importer against the REFERENCE's own
    implementation (VERDICT r2 item 5): author a synthetic full-size
    80-class yolov3.weights with io/darknet.py's writer, import it through
    the reference's convert.py:93-137 ordering walk + Keras graph AND
    through our importer, and assert the two loaded models' forwards agree.
    This validates BN reorder, OIHW→HWIO transpose, and global conv
    ordering against reference behavior rather than only our roundtrip.
    Ref: /root/reference/convert.py:36-137 (walk), 140-170 (end use)."""
    import importlib.util

    import jax
    import jax.numpy as jnp
    import yaml
    from tensorflow.keras import Input

    from core.parse_model import ParseModel
    from yolov3_tpu.io.darknet import load_darknet_weights, save_darknet_weights
    from yolov3_tpu.models import apply_model, init_model, parse_model_config

    # the reference's Convert, loaded by explicit file path (both repos
    # have a root-level convert.py)
    spec_mod = importlib.util.spec_from_file_location(
        "reference_convert", os.path.join(REFERENCE, "convert.py"))
    ref_convert = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(ref_convert)

    # env-compat shims so the reference's Keras-2/numpy-1 era code executes
    # under the installed Keras 3 / numpy 2 (auto-restored by monkeypatch)
    import tensorflow as tf
    monkeypatch.setattr(np, "product", np.prod, raising=False)
    monkeypatch.setattr(
        tf.keras.layers.Conv2D, "get_input_shape_at",
        lambda self, _i: tuple(self.input.shape), raising=False)

    cfg = os.path.join(repo_root, "config/models/yolov3/model.yaml")
    spec = parse_model_config(cfg, nclasses=80)

    # healthy-magnitude synthetic weights: variance-scaled kernels from our
    # init, randomized BN stats/affine + head biases so every tensor
    # position is signal-bearing through all 75 convs
    params, state = init_model(jax.random.PRNGKey(1), spec)
    rng = np.random.RandomState(3)

    def randomize(tree, make):
        return jax.tree.map(
            lambda x: jnp.asarray(make(np.asarray(x).shape)), tree)

    for sm in params.values():
        for entry in sm.values():
            if "bn" in entry:
                entry["bn"]["gamma"] = jnp.asarray(
                    rng.uniform(0.8, 1.2, entry["bn"]["gamma"].shape)
                    .astype(np.float32))
                entry["bn"]["beta"] = jnp.asarray(
                    (rng.randn(*entry["bn"]["beta"].shape) * 0.2)
                    .astype(np.float32))
            if "bias" in entry:
                entry["bias"] = jnp.asarray(
                    (rng.randn(*entry["bias"].shape) * 0.2).astype(np.float32))
    state = randomize(
        state, lambda shp: (rng.randn(*shp) * 0.3).astype(np.float32))
    for sm in state.values():
        for entry in sm.values():
            if "var" in entry:
                entry["var"] = jnp.asarray(
                    rng.uniform(0.5, 1.5, entry["var"].shape).astype(np.float32))

    wfile = str(tmp_path / "yolov3_synth.weights")
    save_darknet_weights(spec, params, state, wfile)
    assert os.path.getsize(wfile) > 200 * 1024 * 1024  # full-size: ~248 MB

    # reference import path. find_next_layer (convert.py:15-33) PREFIX-matches
    # layer names ('conv2d_1' also matches 'conv2d_10/...'), which is only
    # safe under the fresh-process Keras name counters the reference CLI
    # always ran with — earlier suite tests advance the global counters and
    # desync its walk, so restore the fresh-process invariant here.
    tf.keras.backend.clear_session()
    with open(cfg) as f:
        mc = yaml.safe_load(f)
    ref_model = ParseModel().build_model(
        Input(shape=(416, 416, 3)), nclasses=80, **mc)

    # last env-compat shim: Keras 2 named tensors '<layer>/BiasAdd:0' and the
    # reference's find_next_layer (convert.py:15-33) keys its BN detection on
    # that producer-prefix; Keras 3 names them 'keras_tensor_N'. Restore the
    # producer-prefixed naming via _keras_history so the reference's own walk
    # logic runs unmodified.
    def restore_producer_names(model):
        for lyr in model.layers:
            if hasattr(lyr, "layers"):
                restore_producer_names(lyr)
            outs = getattr(lyr, "output", None)
            for t in (outs if isinstance(outs, list) else [outs]):
                if t is not None and hasattr(t, "name"):
                    t.name = lyr.name + "/out"  # plain instance attribute

    restore_producer_names(ref_model)
    ref_model = ref_convert.Convert().load_all_weights(ref_model, wfile)

    # our import path
    params2, state2 = load_darknet_weights(spec, wfile)

    x = np.random.RandomState(0).rand(1, 416, 416, 3).astype(np.float32)
    ref_outs = ref_model(x, training=False)
    outs, _ = apply_model(spec, params2, state2, jnp.asarray(x))
    assert len(ref_outs) == len(outs) == 3
    for ro, jo in zip(ref_outs, outs):
        ro, jo = np.asarray(ro), np.asarray(jo)
        rel = np.abs(ro - jo).max() / (np.abs(ro).max() + 1e-9)
        assert rel < 3e-2, f"importer cross-validation rel diff {rel}"
