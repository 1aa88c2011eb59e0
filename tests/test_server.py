"""Serving front end: dynamic batching + the HTTP detection server.

The reference has no serving component (deployment endpoint = the
one-shot ncnn demo, sample/ncnn/demo.cpp); these tests cover the
TPU-native analog (fastdet/server.py): request coalescing, static-shape
bucketing, error propagation, and the HTTP protocol end-to-end over a
real DevicePipeline.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest


# ---------------------------------------------------------------- batcher

def test_batcher_coalesces_concurrent_requests():
    """While the (gated) first dispatch runs, queued requests must form
    ONE following batch — the core dynamic-batching property."""
    from fastdet.server import DynamicBatcher

    gate = threading.Event()
    sizes = []

    def infer(items):
        sizes.append(len(items))
        if len(sizes) == 1:
            gate.wait(timeout=10)
        return [x * 2 for x in items]

    b = DynamicBatcher(infer, max_batch=32, max_wait_ms=2.0)
    results = {}

    def post(i):
        results[i] = b.submit(i)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(9)]
    threads[0].start()
    # wait until the worker is inside the gated first dispatch
    while not sizes:
        time.sleep(0.001)
    for t in threads[1:]:
        t.start()
    # let the other 8 requests queue up behind the gate
    time.sleep(0.15)
    gate.set()
    for t in threads:
        t.join(timeout=10)
    b.close()

    assert results == {i: 2 * i for i in range(9)}
    assert sizes[0] == 1
    assert sum(sizes) == 9
    assert max(sizes) >= 2, f"no coalescing happened: {sizes}"
    assert b.stats["requests"] == 9
    assert b.stats["batches"] == len(sizes)
    assert b.stats["max_batch"] == max(sizes)


def test_batcher_max_batch_cap_and_order():
    from fastdet.server import DynamicBatcher

    sizes = []

    def infer(items):
        sizes.append(len(items))
        return [x + 100 for x in items]

    b = DynamicBatcher(infer, max_batch=4, max_wait_ms=50.0)
    out = []

    def post(i):
        out.append((i, b.submit(i)))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    b.close()
    assert sorted(out) == [(i, i + 100) for i in range(10)]
    assert max(sizes) <= 4
    assert sum(sizes) == 10


def test_batcher_error_propagates_to_every_caller():
    from fastdet.server import DynamicBatcher

    def infer(items):
        raise ValueError("boom")

    b = DynamicBatcher(infer, max_batch=8, max_wait_ms=1.0)
    with pytest.raises(ValueError, match="boom"):
        b.submit(1)
    # the worker must survive a failed batch and serve the next one
    with pytest.raises(ValueError, match="boom"):
        b.submit(2)
    b.close()


def test_batcher_close_rejects_new_submits():
    from fastdet.server import DynamicBatcher
    b = DynamicBatcher(lambda xs: xs, max_batch=2, max_wait_ms=1.0)
    assert b.submit(7) == 7
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(8)


def test_batcher_close_submit_race_never_hangs():
    """ADVICE r3: a submit racing close() must either be served or
    raise — never block forever behind the shutdown sentinel.  Hammer
    the window with many threads closing mid-flight."""
    import threading

    from fastdet.server import DynamicBatcher

    for _ in range(20):
        b = DynamicBatcher(lambda xs: [x * 2 for x in xs],
                           max_batch=4, max_wait_ms=0.5)
        results = []

        def caller(i):
            try:
                results.append(("ok", b.submit(i)))
            except RuntimeError:
                results.append(("closed", None))

        threads = [threading.Thread(target=caller, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        b.close()
        for t in threads:
            t.join(timeout=10)
            assert not t.is_alive(), "submit hung across close()"
        assert len(results) == 8
        for kind, v in results:
            assert kind in ("ok", "closed")


def test_bucket_padding_is_power_of_two():
    from fastdet.server import InferenceServer
    assert [InferenceServer._bucket(n) for n in (1, 2, 3, 4, 5, 8, 9, 31)] \
        == [1, 2, 4, 4, 8, 8, 16, 32]


# ----------------------------------------------------------- HTTP server

@pytest.fixture(scope="module")
def http_server():
    """A live InferenceServer over a real (random-init) DevicePipeline on
    a small config — exercises decode → resize → batch → detect →
    rescale → JSON end-to-end."""
    import jax
    import jax.numpy as jnp

    from fastdet.config import Config
    from fastdet.models import Detector
    from fastdet.serve import DevicePipeline
    from fastdet.server import InferenceServer

    cfg = Config.from_dict({
        "classes": 3, "width": 128, "height": 128, "anchor_num": 3,
        "anchors": [10.0, 14.0, 27.0, 25.0, 52.0, 55.0,
                    70.0, 45.0, 90.0, 100.0, 120.0, 110.0]})
    model = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.height, cfg.width, 3)),
                           train=False)
    # conf 0.0: random-init logits rarely clear 0.3; the protocol is what
    # is under test, and count>0 makes the box-rescale path execute
    pipe = DevicePipeline(model, variables, cfg, conf_thres=0.0,
                          iou_thres=0.4, max_det=16, max_nms=64)
    server = InferenceServer(pipe, cfg, names=["cat", "dog", "bird"],
                             max_batch=8, max_wait_ms=5.0,
                             model_name="test-detector")
    httpd = server.make_httpd("127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    # warm the compile cache (bucket 1) before the timed client calls
    server.detect_bytes(_jpeg_bytes(0))
    yield url, server
    server.shutdown()
    thread.join(timeout=10)


def _jpeg_bytes(seed, size=(96, 80)):
    import cv2
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, size + (3,), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def _post(url, body, timeout=120):
    req = urllib.request.Request(url + "/detect", data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_http_healthz_and_stats(http_server):
    url, _ = http_server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["ok"] is True
    assert health["model"] == "test-detector"
    assert health["input_size"] == [128, 128]
    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1 and stats["batches"] >= 1


def test_http_detect_roundtrip(http_server):
    url, _ = http_server
    status, out = _post(url, _jpeg_bytes(1))
    assert status == 200
    assert out["image_size"] == [80, 96]     # [w, h] of the (96,80,3) jpeg
    assert out["count"] == len(out["detections"])
    assert out["count"] > 0          # conf 0.0 → the max_det window fills
    for d in out["detections"]:
        assert set(d) == {"box", "score", "class_id", "class_name"}
        assert d["class_name"] in ("cat", "dog", "bird")
        x1, y1, x2, y2 = d["box"]
        # boxes are rescaled to ORIGINAL (w=80, h=96) coordinates: the
        # in-bounds part of any detection must lie inside the image
        assert x1 < 80 * 1.5 and y1 < 96 * 1.5


def test_http_detect_bad_body(http_server):
    url, _ = http_server
    req = urllib.request.Request(url + "/detect", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_http_concurrent_requests_batch(http_server):
    """8 concurrent clients: all succeed, all orderings consistent, and
    the batcher's stats show real coalescing happened somewhere."""
    url, server = http_server
    results = {}

    def client(i):
        results[i] = _post(url, _jpeg_bytes(10 + i))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 8
    assert all(status == 200 for status, _ in results.values())
    # identical bytes → identical detections (batch membership must not
    # change a request's result: padding rows are trimmed per image)
    s1, a = _post(url, _jpeg_bytes(99))
    s2, b = _post(url, _jpeg_bytes(99))
    assert (s1, s2) == (200, 200) and a == b
    assert server._batcher.stats["requests"] >= 11
