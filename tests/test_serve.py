"""The HTTP serving daemon (utils/serve.py, `cli serve`): wire protocol,
parity with the in-process Predictor, and client-error handling."""

import base64
import http.client
import json
import threading

import numpy as np
import pytest

import rgb_proprioceptive_pose_estimator_tpu as rppe
from rgb_proprioceptive_pose_estimator_tpu.utils.serve import (
    PoseService,
    make_server,
)


@pytest.fixture(scope="module")
def proprio_server(tmp_path_factory):
    """Tiny trained pr1 (proprio-only) model behind a live HTTP server."""
    tmp = tmp_path_factory.mktemp("serve")
    cfg = rppe.preset("pr1").override(**{
        "train.steps": 4,
        "train.ckpt_every": 4,
        "train.eval_every": 0,
        "train.log_every": 2,
        "train.ckpt_dir": str(tmp / "ckpt"),
        "data.synthetic_size": 128,
        "data.num_workers": 2,
    })
    rppe.train(cfg)
    service = PoseService(cfg, max_batch=4, warmup=True)
    httpd = make_server(service, port=0)   # free port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1], cfg, service
    httpd.shutdown()
    httpd.server_close()


def _request(port, method, path, payload=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_healthz(proprio_server):
    port, cfg, _ = proprio_server
    status, h = _request(port, "GET", "/healthz")
    assert status == 200
    assert h["status"] == "ok"
    assert h["step"] == 4
    assert h["proprio_dim"] == cfg.model.proprio_dim
    assert h["cameras"] == []          # pr1 has no image backbone
    assert h["quat_order"] == "wxyz"


def test_predict_matches_in_process(proprio_server):
    port, cfg, service = proprio_server
    rng = np.random.default_rng(0)
    p = rng.normal(size=cfg.model.proprio_dim).astype(np.float32)
    status, out = _request(port, "POST", "/predict",
                           {"proprio": p.tolist()})
    assert status == 200
    assert len(out["pos"]) == 3 and len(out["quat"]) == 4
    np.testing.assert_allclose(np.linalg.norm(out["quat"]), 1.0, rtol=1e-5)
    pos, quat = service.predictor({"proprio": p})
    np.testing.assert_allclose(out["pos"], pos, rtol=1e-6)
    np.testing.assert_allclose(out["quat"], quat, rtol=1e-6)
    # health picked up the traffic
    _, h = _request(port, "GET", "/healthz")
    assert h["requests"] >= 1 and h["p50_ms"] is not None


def test_predict_batched(proprio_server):
    port, cfg, _ = proprio_server
    p = np.zeros((3, cfg.model.proprio_dim), np.float32)
    status, out = _request(port, "POST", "/predict",
                           {"proprio": p.tolist()})
    assert status == 200
    assert np.asarray(out["pos"]).shape == (3, 3)
    assert np.asarray(out["quat"]).shape == (3, 4)


def test_client_errors(proprio_server):
    port, _, _ = proprio_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/predict", body=b"{not json",
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    assert "JSON" in json.loads(resp.read())["error"]
    conn.close()

    status, out = _request(port, "POST", "/predict", {})
    assert status == 400

    status, out = _request(port, "GET", "/nope")
    assert status == 404

    status, out = _request(port, "POST", "/predict",
                           {"images": {"agentview": {"b64": "!!notb64"}}})
    assert status == 400 and "base64" in out["error"]


def test_coalesce_batches_one_device_call(proprio_server):
    """Deterministic micro-batching check: run the worker's batch path
    directly on queued requests and count underlying Predictor calls."""
    from rgb_proprioceptive_pose_estimator_tpu.utils.serve import (
        PoseService,
        _Pending,
    )

    _, cfg, base = proprio_server
    service = PoseService(cfg, max_batch=4, warmup=False,
                          state=base.predictor.state,
                          model=base.predictor.model,
                          coalesce_ms=5.0)
    try:
        calls = []
        inner = service.predictor

        class Counting:
            def __call__(self, obs):
                calls.append(obs)
                return inner(obs)

        service.predictor = Counting()
        rng = np.random.default_rng(3)
        obs = [{"proprio": rng.normal(
                    size=cfg.model.proprio_dim).astype(np.float32)}
               for _ in range(3)]
        items = [_Pending(o) for o in obs]
        service._run_batch(items)
        assert len(calls) == 1                       # ONE compiled call
        assert all(it.event.is_set() for it in items)
        assert all(it.exc is None for it in items)
        for o, it in zip(obs, items):
            pos, quat = base.predictor(o)            # solo oracle
            np.testing.assert_allclose(it.result[0], pos,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(it.result[1], quat,
                                       rtol=1e-5, atol=1e-6)
        # non-standard signatures bypass the queue
        assert not service._coalescable(
            {"proprio": np.zeros((2, cfg.model.proprio_dim), np.float32)})
        assert not service._coalescable({})
        assert service._coalescable(obs[0])
    finally:
        service.close()


def test_coalesce_live_concurrent_clients(proprio_server):
    """End-to-end over HTTP: concurrent clients inside one window all get
    answers that match the solo path, and at least one multi-request
    micro-batch forms."""
    from rgb_proprioceptive_pose_estimator_tpu.utils.serve import (
        PoseService,
        make_server,
    )

    _, cfg, base = proprio_server
    service = PoseService(cfg, max_batch=8, warmup=False,
                          state=base.predictor.state,
                          model=base.predictor.model,
                          coalesce_ms=250.0)
    httpd = make_server(service, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        rng = np.random.default_rng(7)
        obs = [rng.normal(size=cfg.model.proprio_dim).astype(np.float32)
               for _ in range(6)]
        outs = [None] * len(obs)

        def client(i):
            outs[i] = _request(port, "POST", "/predict",
                               {"proprio": obs[i].tolist()})

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(obs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        for i, (status, out) in enumerate(outs):
            assert status == 200
            pos, quat = base.predictor({"proprio": obs[i]})
            np.testing.assert_allclose(out["pos"], pos,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(out["quat"], quat,
                                       rtol=1e-5, atol=1e-6)
        _, h = _request(port, "GET", "/healthz")
        assert h["coalesce_ms"] == 250.0
        assert h["coalesced_batches"] >= 1
        # 6 clients inside a 250 ms window: at least one batch > 1 (the
        # window is opened by the FIRST arrival; the rest enqueue while
        # the worker waits)
        assert h["mean_batch"] > 1.0
    finally:
        httpd.shutdown()
        httpd.server_close()
        service.close()


def test_coalesce_close_serves_stragglers(proprio_server):
    """A request enqueued after the worker consumed the shutdown sentinel
    (the close() race) must still be answered -- close() drains and serves
    leftovers instead of letting the waiter time out."""
    from rgb_proprioceptive_pose_estimator_tpu.utils.serve import (
        PoseService,
        _Pending,
    )

    _, cfg, base = proprio_server
    service = PoseService(cfg, max_batch=4, warmup=False,
                          state=base.predictor.state,
                          model=base.predictor.model,
                          coalesce_ms=5.0)
    # kill the worker out from under the service (what the race produces)
    service._queue.put(None)
    service._worker.join(timeout=10)
    item = _Pending({"proprio": np.zeros(cfg.model.proprio_dim,
                                         np.float32)})
    service._queue.put(item)          # enqueued after the worker died
    service.close()                   # must serve the straggler
    assert item.event.is_set()
    assert item.exc is None and item.result is not None
    # and once closed, predict() takes the solo path (no hang)
    out = service.predict({"proprio": np.zeros(cfg.model.proprio_dim,
                                               np.float32)})
    assert len(out["pos"]) == 3


def test_image_model_encoded_and_raw(tmp_path):
    """cnn_small image model: a JPEG-encoded request and a raw-pixel
    request both serve, and match the in-process Predictor on the same
    decoded pixels."""
    from rgb_proprioceptive_pose_estimator_tpu.data import augment as aug
    from rgb_proprioceptive_pose_estimator_tpu.data.hdf5_store import (
        write_demo_fixture,
    )

    path = str(tmp_path / "demo.hdf5")
    write_demo_fixture(path, n_demos=2, steps=8, image_hw=64)
    cfg = rppe.preset("pr2").override(**{
        "data.path": path,
        "data.batch_size": 8,
        "data.num_workers": 2,
        "train.steps": 2,
        "train.ckpt_every": 2,
        "train.eval_every": 0,
        "train.log_every": 1,
        "train.ckpt_dir": str(tmp_path / "ckpt"),
    })
    rppe.train(cfg)
    service = PoseService(cfg, max_batch=2, warmup=False)
    httpd = make_server(service, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        prop = rng.normal(size=cfg.model.proprio_dim).astype(np.float32)

        jpg = aug.encode_image(img, ".jpg")
        status, out = _request(port, "POST", "/predict", {
            "proprio": prop.tolist(),
            "images": {"agentview": {
                "b64": base64.b64encode(jpg.tobytes()).decode(),
                "encoding": "jpeg"}},
        })
        assert status == 200
        decoded = aug.decode_image(jpg)   # what the server saw (lossy jpeg)
        pos, quat = service.predictor(
            {"proprio": prop, "images": {"agentview": decoded}})
        np.testing.assert_allclose(out["pos"], pos, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out["quat"], quat, rtol=1e-5, atol=1e-6)

        status, out_raw = _request(port, "POST", "/predict", {
            "proprio": prop.tolist(),
            "images": {"agentview": {
                "b64": base64.b64encode(img.tobytes()).decode(),
                "encoding": "raw", "shape": [64, 64, 3]}},
        })
        assert status == 200
        pos, quat = service.predictor(
            {"proprio": prop, "images": {"agentview": img}})
        np.testing.assert_allclose(out_raw["pos"], pos,
                                   rtol=1e-5, atol=1e-6)

        # raw with the wrong byte count is the client's fault, not a 500
        status, out = _request(port, "POST", "/predict", {
            "proprio": prop.tolist(),
            "images": {"agentview": {
                "b64": base64.b64encode(img.tobytes()[:-7]).decode(),
                "encoding": "raw", "shape": [64, 64, 3]}},
        })
        assert status == 400 and "reshape" in out["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()
