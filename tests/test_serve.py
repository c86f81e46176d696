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


# ---- resource limits + temporal streaming + mixed traffic (VERDICT r3
# next-5: the serving daemon must be hardened and the pr5-shaped temporal
# deployment story tested over HTTP) ------------------------------------------


def test_body_size_cap(proprio_server):
    """Bodies above max_body_mb are refused with 413 BEFORE being read."""
    _, cfg, base = proprio_server
    from rgb_proprioceptive_pose_estimator_tpu.utils.serve import make_server

    service = PoseService(cfg, max_batch=2, warmup=False,
                          state=base.predictor.state,
                          model=base.predictor.model)
    httpd = make_server(service, port=0, max_body_mb=0.001)  # 1 KiB cap
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        big = {"proprio": [0.0] * 5000}      # ~30 KB of JSON
        status, out = _request(port, "POST", "/predict", big)
        assert status == 413 and "limit" in out["error"]
        # a normal-size request on a fresh connection still works
        p = np.zeros(cfg.model.proprio_dim, np.float32)
        status, out = _request(port, "POST", "/predict",
                               {"proprio": p.tolist()})
        assert status == 200
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_read_timeout_mid_body(proprio_server):
    """A connection that stalls mid-body gets 408 within read_timeout_s
    instead of pinning the handler thread forever."""
    import socket as socket_mod

    _, cfg, base = proprio_server
    from rgb_proprioceptive_pose_estimator_tpu.utils.serve import make_server

    service = PoseService(cfg, max_batch=2, warmup=False,
                          state=base.predictor.state,
                          model=base.predictor.model)
    httpd = make_server(service, port=0, read_timeout_s=0.5)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        s = socket_mod.create_connection(("127.0.0.1", port), timeout=30)
        # claim 1000 body bytes, send only 10, then stall
        s.sendall(b"POST /predict HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: 1000\r\n\r\n{\"proprio\"")
        resp = s.recv(65536).decode()
        assert "408" in resp.splitlines()[0]
        s.close()
    finally:
        httpd.shutdown()
        httpd.server_close()


@pytest.fixture(scope="module")
def temporal_server(tmp_path_factory, demo_h5):
    """pr5-shaped tiny model (dual camera + temporal LSTM + camera_dropout
    + proprio) trained a few steps, behind a live HTTP server."""
    tmp = tmp_path_factory.mktemp("serve_t")
    cfg = rppe.preset("pr5").override(**{
        "model.backbone": "cnn_small",
        "model.image_size": 32,
        "model.image_features": 32,
        "model.proprio_dim": 16,
        "model.proprio_hidden": [32],
        "model.proprio_features": 16,
        "model.head_hidden": [32],
        "model.temporal_frames": 3,
        "model.temporal_mode": "lstm",
        "model.camera_dropout": 0.2,
        "model.dtype": "float32",
        "data.path": demo_h5,
        "data.batch_size": 8,
        "data.num_workers": 0,
        "train.steps": 2,
        "train.steps_per_call": 1,
        "train.log_every": 1,
        "train.eval_every": 0,
        "train.ckpt_every": 2,
        "train.ckpt_dir": str(tmp / "ckpt"),
        "dist.num_devices": 1,
    })
    rppe.train(cfg)
    service = PoseService(cfg, max_batch=4, warmup=False, coalesce_ms=5.0)
    httpd = make_server(service, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1], cfg, service
    httpd.shutdown()
    httpd.server_close()
    service.close()


def _frame(rng, cfg):
    return {
        "proprio": rng.normal(size=cfg.model.proprio_dim).astype(np.float32),
        "images": {c: rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                   for c in cfg.model.cameras},
    }


def _frame_payload(frame, session=None, reset=False):
    payload = {"proprio": frame["proprio"].tolist(),
               "images": {c: {"b64": base64.b64encode(v.tobytes()).decode(),
                              "encoding": "raw", "shape": list(v.shape)}
                          for c, v in frame["images"].items()}}
    if session is not None:
        payload["session"] = session
        payload["reset"] = reset
    return payload


def test_temporal_session_streaming_matches_obs_buffer(temporal_server):
    """Streaming single frames with a session id over HTTP produces the
    SAME poses as the documented in-process loop (ObsBuffer + Predictor),
    including clamp-at-start padding on the first frames and a mid-episode
    reset."""
    from rgb_proprioceptive_pose_estimator_tpu.utils.obs_buffer import (
        ObsBuffer,
    )

    port, cfg, service = temporal_server
    rng = np.random.default_rng(42)
    frames = [_frame(rng, cfg) for _ in range(5)]

    buf = ObsBuffer(cfg.model)
    for i, f in enumerate(frames):
        reset = i == 3                      # episode boundary mid-stream
        status, out = _request(port, "POST", "/predict",
                               _frame_payload(f, session="ep1", reset=reset))
        assert status == 200, out
        if reset:
            buf.reset()
        want_pos, want_quat = service.predictor(buf.push(f))
        np.testing.assert_allclose(out["pos"], want_pos,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out["quat"], want_quat,
                                   rtol=1e-5, atol=1e-6)

    _, h = _request(port, "GET", "/healthz")
    assert h["active_sessions"] >= 1

    # a malformed session frame (wrong proprio width) is a 400 and must
    # NOT poison the window: the next good frame still matches the oracle
    bad = _frame_payload(frames[0], session="ep1")
    bad["proprio"] = [0.0] * 3
    status, out = _request(port, "POST", "/predict", bad)
    assert status == 400 and "ONE standard frame" in out["error"]
    f = _frame(rng, cfg)
    status, out = _request(port, "POST", "/predict",
                           _frame_payload(f, session="ep1"))
    assert status == 200
    want_pos, _ = service.predictor(buf.push(f))
    np.testing.assert_allclose(out["pos"], want_pos, rtol=1e-5, atol=1e-6)


def test_temporal_session_isolation_and_eviction(temporal_server):
    """Two interleaved sessions keep independent windows; the LRU cap
    evicts the oldest session."""
    port, cfg, service = temporal_server
    rng = np.random.default_rng(7)
    a = [_frame(rng, cfg) for _ in range(3)]
    b = [_frame(rng, cfg) for _ in range(3)]

    from rgb_proprioceptive_pose_estimator_tpu.utils.obs_buffer import (
        ObsBuffer,
    )

    buf_a, buf_b = ObsBuffer(cfg.model), ObsBuffer(cfg.model)
    for fa, fb in zip(a, b):
        _, out_a = _request(port, "POST", "/predict",
                            _frame_payload(fa, session="A", reset=fa is a[0]))
        _, out_b = _request(port, "POST", "/predict",
                            _frame_payload(fb, session="B", reset=fb is b[0]))
        pa, _ = service.predictor(buf_a.push(fa))
        pb, _ = service.predictor(buf_b.push(fb))
        np.testing.assert_allclose(out_a["pos"], pa, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out_b["pos"], pb, rtol=1e-5, atol=1e-6)

    # eviction: shrink the cap and touch a new session
    old = service.max_sessions
    service.max_sessions = 1
    try:
        _request(port, "POST", "/predict",
                 _frame_payload(_frame(rng, cfg), session="C"))
        with service._session_lock:
            assert set(service._sessions) == {"C"}
    finally:
        service.max_sessions = old


def test_mixed_traffic_coalesce_stress(temporal_server):
    """Standard full-window requests, dead-camera requests, session
    frames, and malformed requests interleaved across concurrent clients:
    every class gets its correct answer (coalescer must batch only the
    standard signatures and never wedge on the rest)."""
    port, cfg, service = temporal_server
    rng = np.random.default_rng(3)
    T = cfg.model.temporal_frames

    def full_window():
        return {
            "proprio": rng.normal(size=(T, cfg.model.proprio_dim)
                                  ).astype(np.float32),
            "images": {c: rng.integers(0, 255, (T, 32, 32, 3),
                                       dtype=np.uint8)
                       for c in cfg.model.cameras},
        }

    def payload_of(obs):
        return {"proprio": obs["proprio"].tolist(),
                "images": {c: {"b64":
                               base64.b64encode(v.tobytes()).decode(),
                               "encoding": "raw", "shape": list(v.shape)}
                           for c, v in obs["images"].items()}}

    jobs = []
    for i in range(4):                       # standard
        obs = full_window()
        jobs.append(("std", obs, payload_of(obs)))
    for i in range(2):                       # dead camera (trained dropout)
        obs = full_window()
        del obs["images"]["robot0_eye_in_hand"]
        jobs.append(("dead", obs, payload_of(obs)))
    for i in range(2):                       # malformed
        jobs.append(("bad", None, {"proprio": "not a number"}))
    for i in range(2):                       # session frames
        f = _frame(rng, cfg)
        jobs.append(("sess", f, _frame_payload(f, session=f"s{i}",
                                               reset=True)))
    rng.shuffle(jobs)

    outs = [None] * len(jobs)

    def client(i):
        kind, obs, payload = jobs[i]
        outs[i] = _request(port, "POST", "/predict", payload)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(jobs))]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)

    from rgb_proprioceptive_pose_estimator_tpu.utils.obs_buffer import (
        ObsBuffer,
    )

    for (kind, obs, _), (status, out) in zip(jobs, outs):
        if kind == "bad":
            assert status == 400
            continue
        assert status == 200, (kind, out)
        if kind == "sess":
            buf = ObsBuffer(cfg.model)
            want_pos, _ = service.predictor(buf.push(obs))
        else:
            want_pos, _ = service.predictor(obs)
        np.testing.assert_allclose(out["pos"], want_pos,
                                   rtol=1e-5, atol=1e-6)


def test_negative_content_length_is_400(proprio_server):
    """Content-Length: -1 must be refused, not turned into an unbounded
    rfile.read(-1) read-until-EOF (ADVICE r4 medium)."""
    import socket as socket_mod

    port, _, _ = proprio_server
    s = socket_mod.create_connection(("127.0.0.1", port), timeout=30)
    try:
        s.sendall(b"POST /predict HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: -1\r\n\r\n")
        resp = s.recv(65536).decode()
        assert "400" in resp.splitlines()[0]
        assert "Content-Length" in resp
    finally:
        s.close()


def test_session_transparency_fields(temporal_server):
    """Session responses report window_fill/window_size; a session the
    server does not know, arriving WITHOUT reset, is flagged
    session_restarted so eviction/restart can never silently serve
    clamp-padded 1-frame predictions mid-episode (VERDICT r4 weak-4)."""
    port, cfg, service = temporal_server
    rng = np.random.default_rng(11)
    T = cfg.model.temporal_frames

    for i in range(T + 1):
        f = _frame(rng, cfg)
        status, out = _request(port, "POST", "/predict",
                               _frame_payload(f, session="tr1",
                                              reset=i == 0))
        assert status == 200, out
        assert out["window_size"] == T
        assert out["window_fill"] == min(i + 1, T)
        assert "session_restarted" not in out
        assert "dead_cameras" not in out

    # simulate TTL/LRU eviction (or a server restart) mid-episode: the
    # next frame transparently recreates the session -- and SAYS so
    with service._session_lock:
        service._sessions.pop("tr1")
    f = _frame(rng, cfg)
    status, out = _request(port, "POST", "/predict",
                           _frame_payload(f, session="tr1"))
    assert status == 200
    assert out["session_restarted"] is True
    assert out["window_fill"] == 1 and out["window_size"] == T


def test_session_streams_through_dead_camera(temporal_server):
    """The two pr5 serving features COMPOSED (VERDICT r4 weak-5): a
    camera_dropout-trained temporal model keeps streaming frame-by-frame
    when a sensor dies mid-episode -- no fallback to full-window re-ship.
    Poses match the in-process ObsBuffer + Predictor oracle (whole-window
    structural absence), responses declare the dead camera, and the
    camera revives after T consecutive live frames."""
    from rgb_proprioceptive_pose_estimator_tpu.utils.obs_buffer import (
        ObsBuffer,
    )

    port, cfg, service = temporal_server
    rng = np.random.default_rng(23)
    T = cfg.model.temporal_frames
    buf = ObsBuffer(cfg.model)
    plan = ["full"] * T + ["dead"] * 2 + ["full"] * (T + 1)
    last = None
    for i, kind in enumerate(plan):
        f = _frame(rng, cfg)
        if kind == "dead":
            del f["images"]["robot0_eye_in_hand"]
        status, out = _request(port, "POST", "/predict",
                               _frame_payload(f, session="deadcam",
                                              reset=i == 0))
        assert status == 200, out
        want_pos, want_quat = service.predictor(buf.push(f))
        np.testing.assert_allclose(out["pos"], want_pos,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out["quat"], want_quat,
                                   rtol=1e-5, atol=1e-6)
        assert out.get("dead_cameras", []) == buf.dead_cameras()
        last = out
    # the final window is fully live again: the camera revived
    assert "dead_cameras" not in last
    # and mid-failure the response did flag it
    # (re-run one dead frame to assert the flag shape explicitly)
    f = _frame(rng, cfg)
    del f["images"]["agentview"]
    status, out = _request(port, "POST", "/predict",
                           _frame_payload(f, session="deadcam"))
    assert status == 200
    assert out["dead_cameras"] == ["agentview"]
    buf.push(f)


def test_session_dead_camera_requires_dropout_training(temporal_server):
    """Without camera_dropout training (and without the explicit
    allow_missing_cameras opt-in) a partial session frame stays a 400:
    zeroed features would be out-of-distribution."""
    from rgb_proprioceptive_pose_estimator_tpu.utils.serve import BadRequest

    _, cfg, service = temporal_server
    svc2 = PoseService(cfg.override(**{"model.camera_dropout": 0.0}),
                       max_batch=2, warmup=False,
                       state=service.predictor.state,
                       model=service.predictor.model)
    f = _frame(np.random.default_rng(5), cfg)
    del f["images"]["agentview"]
    with pytest.raises(BadRequest, match="missing cameras"):
        svc2.predict(f, session="x", reset=True)
    # the full frame is still accepted (and reports transparency fields)
    f2 = _frame(np.random.default_rng(6), cfg)
    out = svc2.predict(f2, session="x", reset=True)
    assert out["window_fill"] == 1
    assert out["window_size"] == cfg.model.temporal_frames


def test_session_window_with_no_live_camera_is_clear_400():
    """Image-only model, disjoint per-frame sensor gaps: when the union of
    missing cameras covers the whole camera set, whole-window structural
    absence leaves the model zero inputs. That must surface as a CLEAR
    BadRequest naming the window semantics (keep streaming; revival after
    a full live window) -- not the Predictor's 'obs supplies none of the
    cameras' shape error blaming a frame that DID carry a live camera --
    and the stream must recover without a reset once a camera has been
    present for the full window again."""
    from rgb_proprioceptive_pose_estimator_tpu.engine.state import (
        create_state,
    )
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer,
    )
    from rgb_proprioceptive_pose_estimator_tpu.models import build_model
    from rgb_proprioceptive_pose_estimator_tpu.utils.serve import BadRequest

    cfg = rppe.preset("pr5").override(**{
        "model.backbone": "cnn_small",
        "model.image_size": 32,
        "model.image_features": 32,
        "model.head_hidden": [32],
        "model.use_proprio": False,
        "model.temporal_frames": 3,
        "model.temporal_mode": "lstm",
        "model.camera_dropout": 0.2,
        "model.dtype": "float32",
        "dist.num_devices": 1,
    })
    state = create_state(cfg, make_optimizer(cfg.train), seed=0)
    svc = PoseService(cfg, max_batch=2, warmup=False,
                      state=state, model=build_model(cfg.model))
    rng = np.random.default_rng(3)
    cams = list(cfg.model.cameras)

    def frame(omit=None):
        f = {"images": {c: rng.integers(0, 255, (32, 32, 3), np.uint8)
                        for c in cams}}
        if omit is not None:
            del f["images"][omit]
        return f

    out = svc.predict(frame(omit=cams[0]), session="s", reset=True)
    assert out["dead_cameras"] == [cams[0]]
    # second frame omits the OTHER camera: each frame carried a live
    # sensor, but the 3-frame window now has no camera present throughout
    with pytest.raises(BadRequest, match="no live camera"):
        svc.predict(frame(omit=cams[1]), session="s")
    # full frame 1/3: window still spans both gaps -> still the clear error
    with pytest.raises(BadRequest, match="keep streaming"):
        svc.predict(frame(), session="s")
    # full frames 2..3/3: cams[0]'s gap ages out first -> serving resumes
    # with the surviving gap declared; then the window is fully live
    out = svc.predict(frame(), session="s")
    assert out["dead_cameras"] == [cams[1]]
    out = svc.predict(frame(), session="s")
    assert "dead_cameras" not in out
    assert out["window_fill"] == cfg.model.temporal_frames
