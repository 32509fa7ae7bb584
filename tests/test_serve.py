"""Batching detection server (apps/serve_app.py): dynamic batcher unit
tests + a live ThreadingHTTPServer end-to-end check on CPU.

New capability — the reference has no serving path (its inference.py is a
batch CLI, reference inference.py:52-188)."""

import io
import json
import os
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from yolov3_tpu.apps.serve_app import DynamicBatcher, Serve
from yolov3_tpu.io.resolve import save_weights
from yolov3_tpu.models import init_model, parse_model_config

IMAGE_SIZE = 96


# ---------------------------------------------------------------- batcher

def _fake_factory(calls):
    """Predictor factory returning a deterministic nms-shaped tuple and
    recording (bucket, runtime batch) per call."""

    def factory(bucket):
        def fn(x):
            calls.append((bucket, x.shape[0]))
            n = x.shape[0]
            boxes = np.tile(np.array([[0.1, 0.2, 0.3, 0.4]], np.float32), (n, 5, 1))
            cls = np.zeros((n, 5), np.int32)
            # per-image marker: score = mean pixel value, so each request
            # can verify it got ITS image's result back, not a neighbor's
            sc = np.tile(x.mean(axis=(1, 2, 3))[:, None], (1, 5)).astype(np.float32)
            sel = np.tile(np.arange(5)[None], (n, 1)).astype(np.int32)
            nv = np.full((n,), 2, np.int32)
            return boxes, cls, sc, sel, nv

        return fn

    return factory


def test_batcher_groups_pads_and_demuxes():
    calls = []
    batcher = DynamicBatcher(_fake_factory(calls), [1, 4], batch_timeout_ms=250)
    try:
        results = [None] * 3

        def worker(i):
            results[i] = batcher.submit(np.full((8, 8, 3), i + 1, np.float32))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (bb, cc, ss) in enumerate(results):
            assert bb.shape == (2, 4)  # num_valid=2 rows gathered
            assert np.allclose(ss, i + 1)  # demuxed to the right requester
        # 3 concurrent requests + generous follower window → one padded
        # bucket-4 launch (padding never produces extra per-image results)
        assert calls == [(4, 4)]
    finally:
        batcher.shutdown()


def test_batcher_single_request_uses_smallest_bucket():
    calls = []
    batcher = DynamicBatcher(_fake_factory(calls), [1, 4], batch_timeout_ms=1)
    try:
        batcher.submit(np.zeros((8, 8, 3), np.float32))
        assert calls == [(1, 1)]
    finally:
        batcher.shutdown()


def test_batcher_propagates_predictor_errors():
    def factory(bucket):
        def fn(x):
            raise RuntimeError("device fell over")

        return fn

    batcher = DynamicBatcher(factory, [1], batch_timeout_ms=1)
    try:
        with pytest.raises(RuntimeError, match="device fell over"):
            batcher.submit(np.zeros((8, 8, 3), np.float32))
    finally:
        batcher.shutdown()


def test_batcher_rejects_bad_buckets():
    with pytest.raises(ValueError):
        DynamicBatcher(_fake_factory([]), [])
    with pytest.raises(ValueError):
        DynamicBatcher(_fake_factory([]), [0, 4])


# ------------------------------------------------------------- live server

@pytest.fixture(scope="module")
def server(repo_root, toy_dataset, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, bn_state = init_model(jax.random.PRNGKey(0), spec)
    weights = str(tmp / "serve_weights")
    save_weights(spec, params, bn_state, weights)

    httpd, app = Serve()(
        model_config_file=os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml"),
        classes_name_file=os.path.join(toy_dataset, "class.names"),
        anchors_file=os.path.join(toy_dataset, "anchors/anchors_tiny.txt"),
        input_weights_path=weights,
        image_size=IMAGE_SIZE,
        yolo_max_boxes=10,
        nms_iou_threshold=0.5,
        nms_score_threshold=0.05,
        host="127.0.0.1",
        port=0,  # ephemeral
        batch_buckets=[1, 2],
        batch_timeout_ms=1,
        warmup=True,
        serve_forever=False,
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield url, app
    httpd.shutdown()
    app.shutdown()
    thread.join(timeout=5)


def _png_bytes(rng, h=70, w=90):
    arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue(), arr


def _post(url, data):
    req = urllib.request.Request(f"{url}/detect", data=data, method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_detect_endpoint(server):
    url, app = server
    png, arr = _png_bytes(np.random.RandomState(0))
    body = _post(url, png)
    assert body["width"] == arr.shape[1] and body["height"] == arr.shape[0]
    assert isinstance(body["detections"], list)
    for det in body["detections"]:
        assert det["class_name"] in ("circle", "square", "triangle")
        x1n, y1n, x2n, y2n = det["box_normalized"]
        x1, y1, x2, y2 = det["box"]
        # pixel boxes are the normalized boxes scaled to the ORIGINAL size
        assert x1 == pytest.approx(x1n * arr.shape[1], abs=1e-3)
        assert y2 == pytest.approx(y2n * arr.shape[0], abs=1e-3)
    # HTTP result identical to the in-process pipeline on the same bytes
    direct = app.detect(png)
    assert len(direct["detections"]) == len(body["detections"])
    for a, b in zip(direct["detections"], body["detections"]):
        assert a["class_id"] == b["class_id"]
        assert a["score"] == pytest.approx(b["score"], abs=1e-6)
        assert np.allclose(a["box_normalized"], b["box_normalized"], atol=1e-6)


def test_detect_matches_inference_predictor(server, repo_root, toy_dataset):
    """The server's detections == the inference CLI's fused predictor on
    the same preprocessed image (serving is a transport, not a new model
    path)."""
    from yolov3_tpu.apps.inference_app import gather_valid_detections
    from yolov3_tpu.data.image import decode_image, resize_bilinear

    url, app = server
    png, _ = _png_bytes(np.random.RandomState(1))
    body = _post(url, png)

    image = resize_bilinear(
        decode_image(png).astype(np.float32) / 255.0, IMAGE_SIZE, IMAGE_SIZE)
    out = app.batcher.predictor(1)(image[None])
    bboxes, class_idx, scores, selected, num_valid = map(np.asarray, out)
    bb, cc, ss = gather_valid_detections(
        bboxes[0], class_idx[0], scores[0], selected[0], num_valid[0])
    assert len(body["detections"]) == len(bb)
    for det, box, cls, score in zip(body["detections"], bb, cc, ss):
        assert det["class_id"] == int(cls)
        assert det["score"] == pytest.approx(float(score), abs=1e-6)
        assert np.allclose(det["box_normalized"], box, atol=1e-6)


def test_concurrent_requests_batched(server):
    url, app = server
    rng = np.random.RandomState(2)
    pngs = [_png_bytes(rng)[0] for _ in range(4)]
    results = [None] * 4

    def worker(i):
        results[i] = _post(url, pngs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None for r in results)
    stats = json.loads(urllib.request.urlopen(f"{url}/stats", timeout=30).read())
    assert stats["requests"] >= 4
    assert stats["latency_ms"]["p50"] is not None
    # batch histogram exists (grouping itself is timing-dependent on 1 core)
    assert sum(stats["batch_histogram"].values()) >= 1


def test_serve_letterbox_unmaps_boxes(repo_root, toy_dataset, tmp_path):
    """`letterbox: true` serving: detections on a non-square upload come
    back in the ORIGINAL frame — exactly letterbox_unmap_boxes applied to
    the letterboxed predictor's raw output."""
    from yolov3_tpu.apps.inference_app import (build_serving_predictor,
                                               gather_valid_detections)
    from yolov3_tpu.data.image import (decode_image, letterbox_resize,
                                       letterbox_unmap_boxes)

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, bn_state = init_model(jax.random.PRNGKey(2), spec)
    weights = str(tmp_path / "lb_weights")
    save_weights(spec, params, bn_state, weights)
    cfg = dict(
        model_config_file=os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml"),
        classes_name_file=os.path.join(toy_dataset, "class.names"),
        anchors_file=os.path.join(toy_dataset, "anchors/anchors_tiny.txt"),
        input_weights_path=weights,
        image_size=IMAGE_SIZE,
        yolo_max_boxes=10,
        nms_iou_threshold=0.5,
        nms_score_threshold=0.02,
    )
    httpd, app = Serve()(
        **cfg, host="127.0.0.1", port=0, batch_buckets=[1],
        batch_timeout_ms=1, warmup=False, serve_forever=False, letterbox=True,
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        health = json.loads(urllib.request.urlopen(f"{url}/healthz", timeout=30).read())
        assert health["letterbox"] is True

        png, arr = _png_bytes(np.random.RandomState(5), h=50, w=90)  # non-square
        body = _post(url, png)

        predictor, _, _ = build_serving_predictor(**cfg)
        image = letterbox_resize(
            decode_image(png).astype(np.float32) / 255.0, IMAGE_SIZE, IMAGE_SIZE)
        bb, cc, ss = gather_valid_detections(
            *[np.asarray(o)[0] for o in predictor(image[None])])
        expected = letterbox_unmap_boxes(bb, 50, 90, IMAGE_SIZE, IMAGE_SIZE) \
            if len(bb) else bb.reshape(-1, 4)
        assert len(body["detections"]) == len(bb)
        for det, box, cls, score in zip(body["detections"], expected, cc, ss):
            assert det["class_id"] == int(cls)
            assert det["score"] == pytest.approx(float(score), abs=1e-6)
            assert np.allclose(det["box_normalized"], box, atol=1e-5)
            # pixel boxes scale by the ORIGINAL width/height
            assert det["box"][0] == pytest.approx(box[0] * 90, abs=1e-2)
            assert det["box"][3] == pytest.approx(box[3] * 50, abs=1e-2)
    finally:
        httpd.shutdown()
        app.shutdown()
        thread.join(timeout=5)


def test_sigterm_graceful_shutdown(repo_root, toy_dataset, tmp_path):
    """SIGTERM (orchestrator stop) drains and exits cleanly (rc 0), not by
    being killed — the CLI registers a handler that stops the serve loop."""
    import signal
    import subprocess
    import time

    import yaml

    from .conftest import SUITE_XLA_CACHE

    spec = None  # weights: random-init tiny saved once
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, bn_state = init_model(jax.random.PRNGKey(3), spec)
    weights = str(tmp_path / "sig_weights")
    save_weights(spec, params, bn_state, weights)
    cfg = dict(
        model_config_file=os.path.join(repo_root,
                                       "config/models/yolov3_tiny/model.yaml"),
        classes_name_file=os.path.join(toy_dataset, "class.names"),
        anchors_file=os.path.join(toy_dataset, "anchors/anchors_tiny.txt"),
        input_weights_path=weights,
        image_size=IMAGE_SIZE,
        host="127.0.0.1", port=0, batch_buckets=[1], batch_timeout_ms=1,
        warmup=True,
    )
    cfg_path = str(tmp_path / "serve_cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    env["YOLOV3_TPU_PLATFORM"] = "cpu"
    env["YOLOV3_TPU_COMPILE_CACHE"] = SUITE_XLA_CACHE
    proc = subprocess.Popen(
        ["python", "serve.py", "--config", cfg_path], cwd=repo_root, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.monotonic() + 180
        for line in proc.stdout:
            if "serving on http" in line:
                break
            if time.monotonic() > deadline:
                raise TimeoutError("server never came up")
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=30)
        assert rc == 0, f"expected clean exit, got rc={rc}"
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)


def test_metrics_prometheus(server):
    url, app = server
    png, _ = _png_bytes(np.random.RandomState(4))
    _post(url, png)  # ensure at least one request/batch/latency sample
    resp = urllib.request.urlopen(f"{url}/metrics", timeout=30)
    assert resp.headers["Content-Type"].startswith("text/plain")
    text = resp.read().decode()
    assert "# TYPE yolov3_requests_total counter" in text
    metrics = {}
    for line in text.splitlines():
        if line and not line.startswith("#"):
            name, value = line.rsplit(" ", 1)
            metrics[name] = float(value)
    assert metrics["yolov3_requests_total"] >= 1
    assert metrics["yolov3_request_errors_total"] >= 0
    assert metrics["yolov3_queue_depth"] == 0
    assert 'yolov3_request_latency_ms{quantile="0.5"}' in metrics
    assert sum(v for k, v in metrics.items()
               if k.startswith("yolov3_batches_total")) >= 1


def test_serve_sharded_matches_unsharded(repo_root, toy_dataset, tmp_path):
    """`spatial_partitioning: 8` (pure SP — every device works on each
    image via GSPMD conv halo exchange) serves the same detections as the
    single-device predictor; `data_parallel` bucket validation enforced."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")

    from yolov3_tpu.apps.inference_app import (build_serving_predictor,
                                               gather_valid_detections)
    from yolov3_tpu.data.image import decode_image, resize_bilinear

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, bn_state = init_model(jax.random.PRNGKey(1), spec)
    weights = str(tmp_path / "sp_weights")
    save_weights(spec, params, bn_state, weights)
    cfg = dict(
        model_config_file=os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml"),
        classes_name_file=os.path.join(toy_dataset, "class.names"),
        anchors_file=os.path.join(toy_dataset, "anchors/anchors_tiny.txt"),
        input_weights_path=weights,
        image_size=IMAGE_SIZE,
        yolo_max_boxes=10,
        nms_iou_threshold=0.5,
        nms_score_threshold=0.05,
    )

    httpd, app = Serve()(
        **cfg, host="127.0.0.1", port=0, batch_buckets=[1, 2],
        batch_timeout_ms=1, warmup=False, serve_forever=False,
        spatial_partitioning=8,
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        png, _ = _png_bytes(np.random.RandomState(3))
        body = _post(f"http://127.0.0.1:{httpd.server_address[1]}", png)

        unsharded, _, _ = build_serving_predictor(**cfg)
        image = resize_bilinear(
            decode_image(png).astype(np.float32) / 255.0, IMAGE_SIZE, IMAGE_SIZE)
        bb, cc, ss = gather_valid_detections(
            *[np.asarray(o)[0] for o in unsharded(image[None])])
        assert len(body["detections"]) == len(bb)
        for det, box, cls, score in zip(body["detections"], bb, cc, ss):
            assert det["class_id"] == int(cls)
            assert det["score"] == pytest.approx(float(score), abs=1e-5)
            assert np.allclose(det["box_normalized"], box, atol=1e-5)
    finally:
        httpd.shutdown()
        app.shutdown()
        thread.join(timeout=5)

    # data_parallel with buckets not divisible by the data axis → rejected
    with pytest.raises(ValueError, match="divisible"):
        Serve()(**cfg, port=0, batch_buckets=[1, 2], warmup=False,
                serve_forever=False, data_parallel=True)


def test_healthz_and_errors(server):
    url, app = server
    health = json.loads(urllib.request.urlopen(f"{url}/healthz", timeout=30).read())
    assert health["status"] == "ok"
    assert health["image_size"] == IMAGE_SIZE
    assert health["batch_buckets"] == [1, 2]
    assert health["classes"] == 3

    # non-image body → 400, counted in stats
    req = urllib.request.Request(f"{url}/detect", data=b"not an image", method="POST")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400

    # unknown path → 404
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(f"{url}/nope", timeout=30)
    assert err.value.code == 404


def test_detection_client(server):
    """yolov3_tpu.client.DetectionClient against the live server: all
    three image input forms produce the same detections; health/stats/
    metrics round-trip."""
    import tempfile

    from yolov3_tpu.client import DetectionClient

    url, app = server
    client = DetectionClient(url)
    png, arr = _png_bytes(np.random.RandomState(6))

    r_bytes = client.detect(png)
    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
        f.write(png)
        path = f.name
    r_path = client.detect(path)
    r_array = client.detect(arr)  # uint8 numpy array → PNG encode

    for r in (r_bytes, r_path, r_array):
        assert r["width"] == arr.shape[1] and r["height"] == arr.shape[0]
    assert len(r_bytes["detections"]) == len(r_path["detections"]) \
        == len(r_array["detections"])
    for a, b in zip(r_bytes["detections"], r_array["detections"]):
        assert a["class_id"] == b["class_id"]
        assert a["score"] == pytest.approx(b["score"], abs=1e-5)

    assert client.health()["status"] == "ok"
    assert client.stats()["requests"] >= 3
    assert "yolov3_requests_total" in client.metrics()


def test_storm_mixed_sizes_no_cross_wiring(server):
    """Concurrency storm (VERDICT r2 item 10): many client threads × mixed
    image sizes against the live server — every response must carry ITS
    request's dimensions (no lost / duplicated / cross-wired responses
    under dynamic-batching churn), and duplicate posts of the same bytes
    must agree."""
    url, app = server
    reqs = []
    for t in range(8):
        for r in range(6):
            h, w = 40 + t * 3, 40 + r * 5  # unique (h, w) identity per request
            png, _ = _png_bytes(np.random.RandomState(1000 + t * 16 + r), h=h, w=w)
            reqs.append((png, h, w))
    reqs += reqs[:8]  # duplicates, posted from different threads
    results = [None] * len(reqs)
    errors = []

    def worker(i):
        try:
            results[i] = _post(url, reqs[i][0])
        except Exception as e:  # noqa: BLE001 — collected and asserted below
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(reqs))]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=180)
    assert not errors, errors
    for (png, h, w), body in zip(reqs, results):
        assert body is not None, "lost response"
        assert (body["height"], body["width"]) == (h, w), "cross-wired response"
    # duplicate posts: same detections (scores may differ in ulps across
    # batch-bucket programs — different XLA fusions)
    for i in range(8):
        a, b = results[i], results[len(reqs) - 8 + i]
        assert len(a["detections"]) == len(b["detections"])
        for da, db in zip(a["detections"], b["detections"]):
            assert da["class_id"] == db["class_id"]
            assert da["score"] == pytest.approx(db["score"], abs=1e-5)
            assert np.allclose(da["box_normalized"], db["box_normalized"],
                               atol=1e-5)
    stats = json.loads(urllib.request.urlopen(f"{url}/stats", timeout=10).read())
    assert stats["requests"] >= len(reqs)


def test_sigterm_drains_mid_storm(repo_root, toy_dataset, tmp_path):
    """SIGTERM mid-storm (VERDICT r2 item 10): the real serve.py process
    must drain in-flight work and exit cleanly while clients are hammering
    it; every response that does come back is well-formed and matches its
    request."""
    import signal
    import subprocess
    import sys
    import time

    import yaml

    spec = parse_model_config(
        os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml"), nclasses=3)
    params, bn_state = init_model(jax.random.PRNGKey(0), spec)
    weights = str(tmp_path / "storm_weights")
    save_weights(spec, params, bn_state, weights)

    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    cfg = dict(
        model_config_file=os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml"),
        classes_name_file=os.path.join(toy_dataset, "class.names"),
        anchors_file=os.path.join(toy_dataset, "anchors/anchors_tiny.txt"),
        input_weights_path=weights, image_size=IMAGE_SIZE,
        yolo_max_boxes=10, nms_iou_threshold=0.5, nms_score_threshold=0.05,
        host="127.0.0.1", port=port, batch_buckets=[1, 2], batch_timeout_ms=1,
        warmup=True)
    cfg_path = str(tmp_path / "serve_storm.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ, YOLOV3_TPU_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo_root, "serve.py"), "--config", cfg_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo_root, env=env)
    try:
        url = f"http://127.0.0.1:{port}"
        deadline = time.time() + 420
        while time.time() < deadline:
            try:
                urllib.request.urlopen(f"{url}/healthz", timeout=2)
                break
            except Exception:
                if proc.poll() is not None:
                    raise AssertionError(
                        f"server died during startup:\n{proc.stdout.read()}")
                time.sleep(1)
        else:
            raise AssertionError("server never became healthy")

        ok, failed, mismatched = [], [], []
        stop = threading.Event()

        def hammer(t):
            r = 0
            while not stop.is_set():
                h, w = 40 + t * 2, 44 + (r % 5) * 4
                png, _ = _png_bytes(np.random.RandomState(t * 997 + r), h=h, w=w)
                try:
                    body = _post(url, png)
                    if (body["height"], body["width"]) != (h, w):
                        mismatched.append((t, r))
                    ok.append((t, r))
                except Exception:
                    failed.append((t, r))  # refused during/after drain: fine
                r += 1

        threads = [threading.Thread(target=hammer, args=(t,)) for t in range(6)]
        for th in threads:
            th.start()
        t0 = time.time()
        while len(ok) < 12 and time.time() - t0 < 120:
            time.sleep(0.1)
        assert len(ok) >= 12, "storm never got going"
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
        stop.set()
        for th in threads:
            th.join(timeout=30)
        out = proc.stdout.read()
        assert rc == 0, f"non-zero exit after SIGTERM:\n{out}"
        assert "draining and shutting down" in out
        assert not mismatched, f"cross-wired responses: {mismatched}"
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
