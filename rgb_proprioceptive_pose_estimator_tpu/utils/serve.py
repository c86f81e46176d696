"""HTTP pose-serving daemon over `api.Predictor` (SURVEY.md §4.3's
predict() surface, exposed to robot stacks that are NOT in-process
Python — a ROS bridge, a C++ controller, a remote teleop client).

Deliberately stdlib-only (http.server + json + base64): the serving host
of a robot cell should not grow a web-framework dependency tree, and the
Predictor underneath already does the real work (fixed-shape compiled
batches, chunking, dead-camera signatures). One process serves one model;
scale-out is N processes behind any TCP load balancer.

Wire protocol (JSON over HTTP):

  GET /healthz
      -> 200 {"status": "ok", "step", "cameras", "image_size",
              "temporal_frames", "proprio_dim", "quat_order": "wxyz",
              "requests", "p50_ms"}

  POST /predict      body: a single observation
      {
        "proprio": [f32 ...],                  # (D,) or nested (B/T,D)
        "images": {
          "<camera>": {"b64": "<base64>", "encoding": "jpeg"|"png"},
          # or raw pixels: {"b64": ..., "encoding": "raw",
          #                 "shape": [H, W, 3]}   (uint8, any leading dims)
          # or plain nested uint8 lists (convenience, slow for big images)
        }
      }
      -> 200 {"pos": [x, y, z], "quat": [w, x, y, z],
              "quat_order": "wxyz", "ms": <server-side latency>}

A configured camera may be omitted exactly when the in-process Predictor
allows it (model.camera_dropout training or allow_missing_cameras) — the
dead-camera request runs the cheaper structural-absence signature.
Malformed requests get 400 with {"error": ...}; everything else 500.
"""

from __future__ import annotations

import base64
import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

from rgb_proprioceptive_pose_estimator_tpu.config import Config


class BadRequest(ValueError):
    """Client-side protocol error -> HTTP 400."""


def _decode_image(spec: Any) -> np.ndarray:
    """One camera's wire value -> uint8 ndarray (HWC or with leading
    batch/time dims). Accepts the three forms documented above."""
    if isinstance(spec, (list, tuple)):
        arr = np.asarray(spec)
        if arr.dtype.kind not in "iuf":
            raise BadRequest("image nested list must be numeric")
        return arr.astype(np.uint8)
    if not isinstance(spec, dict) or "b64" not in spec:
        raise BadRequest(
            "image must be nested uint8 lists or "
            '{"b64": ..., "encoding": "jpeg"|"png"|"raw"[, "shape": ...]}')
    try:
        buf = base64.b64decode(spec["b64"], validate=True)
    except Exception as e:
        raise BadRequest(f"invalid base64 image payload: {e}")
    enc = spec.get("encoding", "jpeg")
    if enc in ("jpeg", "png"):
        from rgb_proprioceptive_pose_estimator_tpu.data.augment import (
            decode_image,
        )

        try:
            return decode_image(np.frombuffer(buf, np.uint8))
        except ValueError as e:
            raise BadRequest(str(e))
    if enc == "raw":
        shape = spec.get("shape")
        if not shape:
            raise BadRequest('raw image needs a "shape" field')
        arr = np.frombuffer(buf, np.uint8)
        try:
            return arr.reshape(shape)
        except ValueError:
            raise BadRequest(
                f"raw image payload has {arr.size} bytes, which does not "
                f"reshape to {shape}")
    raise BadRequest(f"unknown image encoding {enc!r}")


def _parse_obs(body: bytes) -> Dict[str, Any]:
    try:
        req = json.loads(body)
    except json.JSONDecodeError as e:
        raise BadRequest(f"body is not valid JSON: {e}")
    if not isinstance(req, dict):
        raise BadRequest("body must be a JSON object")
    obs: Dict[str, Any] = {}
    if "proprio" in req:
        p = np.asarray(req["proprio"], dtype=np.float32)
        obs["proprio"] = p
    if "images" in req:
        if not isinstance(req["images"], dict):
            raise BadRequest('"images" must map camera name -> image')
        obs["images"] = {c: _decode_image(v)
                         for c, v in req["images"].items()}
    if not obs:
        raise BadRequest('need "proprio" and/or "images"')
    return obs


class PoseService:
    """The model side of the server: one Predictor + a serialization lock
    (one TPU stream; interleaving compiled calls buys nothing) + rolling
    latency stats for /healthz."""

    def __init__(self, cfg: Config, ckpt_dir: Optional[str] = None,
                 step: Union[int, str, None] = None, max_batch: int = 8,
                 warmup: bool = True, state=None, model=None):
        from rgb_proprioceptive_pose_estimator_tpu.api import Predictor

        self.cfg = cfg
        self.predictor = Predictor(cfg, ckpt_dir=ckpt_dir, step=step,
                                   max_batch=max_batch, state=state,
                                   model=model)
        self.step = int(self.predictor.state.step)
        self._lock = threading.Lock()
        self._lat_ms: deque = deque(maxlen=256)
        self._requests = 0
        if warmup:
            self.predictor.warmup()

    def predict(self, obs: Dict[str, Any]) -> Dict[str, Any]:
        t0 = time.perf_counter()
        with self._lock:
            pos, quat = self.predictor(obs)
            ms = (time.perf_counter() - t0) * 1e3
            # stats mutate under the same lock health() reads them with --
            # iterating a deque while another request thread appends raises
            self._lat_ms.append(ms)
            self._requests += 1
        return {"pos": np.asarray(pos).tolist(),
                "quat": np.asarray(quat).tolist(),
                "quat_order": "wxyz",
                "ms": round(ms, 3)}

    def health(self) -> Dict[str, Any]:
        m = self.cfg.model
        with self._lock:
            lat = sorted(self._lat_ms)
        return {
            "status": "ok",
            "step": self.step,
            "cameras": list(m.cameras) if m.backbone != "none" else [],
            "image_size": m.image_size,
            "temporal_frames": m.temporal_frames,
            "proprio_dim": m.proprio_dim if m.use_proprio else 0,
            "quat_order": "wxyz",
            "requests": self._requests,
            "p50_ms": round(lat[len(lat) // 2], 3) if lat else None,
        }


class _Handler(BaseHTTPRequestHandler):
    # set per-server via the factory in make_server()
    service: PoseService
    # HTTP/1.1 keep-alive: a control loop polling /predict reuses its TCP
    # connection instead of paying connect/teardown per request (every
    # response carries Content-Length, which keep-alive requires)
    protocol_version = "HTTP/1.1"
    # TCP_NODELAY: on a reused connection, Nagle + the peer's delayed-ACK
    # timer stalls the second write of every request/response ~40 ms --
    # measured 96 ms vs 59 ms p50 batch-1 before this line (bench_serve)
    disable_nagle_algorithm = True

    def _send(self, code: int, payload: Dict[str, Any]) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        try:
            if self.path in ("/healthz", "/health"):
                self._send(200, self.service.health())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})
        except Exception as e:  # pragma: no cover - genuine server faults
            # an aborted connection reads as a dead daemon to a load
            # balancer; always answer
            self._send(500, {"error": f"{type(e).__name__}: {e}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/predict":
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            obs = _parse_obs(self.rfile.read(n))
            self._send(200, self.service.predict(obs))
        except BadRequest as e:
            self._send(400, {"error": str(e)})
        except (KeyError, ValueError) as e:
            # Predictor-level contract errors (missing camera, bad shapes)
            # are client mistakes too
            self._send(400, {"error": str(e)})
        except Exception as e:  # pragma: no cover - genuine server faults
            self._send(500, {"error": f"{type(e).__name__}: {e}"})

    def log_message(self, fmt, *args):
        # one structured line per request instead of BaseHTTPRequestHandler's
        # stderr chatter; quiet under tests
        pass


def make_server(service: PoseService, host: str = "127.0.0.1",
                port: int = 8080) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; port 0 picks a free port
    (read it back from server.server_address)."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve(cfg: Config, host: str = "127.0.0.1", port: int = 8080,
          ckpt_dir: Optional[str] = None,
          step: Union[int, str, None] = None, max_batch: int = 8,
          warmup: bool = True) -> Tuple[ThreadingHTTPServer, PoseService]:
    """cli serve entry: restore, warm up, listen. Returns after binding;
    the caller decides between serve_forever() (CLI) and a background
    thread (tests/notebooks)."""
    service = PoseService(cfg, ckpt_dir=ckpt_dir, step=step,
                          max_batch=max_batch, warmup=warmup)
    return make_server(service, host, port), service
