"""HTTP inference endpoint over an exported StableHLO artifact.

Extends the deployment story past directory serving (cyclegan_tpu.serve):
``python -m cyclegan_tpu.main --serve model.shlo --serve_http PORT`` starts
a stdlib HTTP server that answers segmentation requests straight from the
self-contained artifact — no checkpoint, no trainer, no framework state on
the serving host (the reference's deployment path ends at ``--testing``
PNG dumps from a live checkpoint — SURVEY.md §3c; an online endpoint is
framework-added surface).

Endpoints:

- ``GET /healthz`` — liveness: ``{"status": "ok", "requests": N}``.
- ``GET /info`` — artifact metadata: manifest, window/canvas shapes,
  number of classes, enabled TTA options.
- ``GET /metrics`` — Prometheus text format: request/error counters and
  a predict-latency histogram (scrape-ready; no client library needed).
- ``POST /predict[?format=png|mask|json]`` — body is an encoded image
  (PNG/JPEG/BMP — anything PIL decodes). The image is eval-transformed to
  the serving shape and pushed through the predictor (with whatever
  tiling/flip/multi-scale TTA the server was started with):

  - ``format=png`` (default): VOC-palette colorized prediction, image/png.
  - ``format=mask``: raw class indices as a grayscale PNG (lossless —
    class counts here are <= 255).
  - ``format=json``: ``{"shape": [H, W], "class_pixels": {idx: count}}``
    (plus ``class_pixels_named`` when the artifact manifest embeds
    ``class_names``) — the per-class pixel histogram (cheap summary;
    fetch ``mask`` for the full map).

All device work is serialized behind a lock: requests are single-image
(the batch-polymorphic artifact compiles one ``(1, H, W, C)`` program at
warmup, so steady-state requests never recompile), and one in-flight
device call keeps the endpoint's memory footprint flat under a threaded
server. Throughput scaling is horizontal — a fleet of independent hosts
behind a load balancer, each with its own artifact (matching
``--serve_dp``'s one-process contract).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from cyclegan_tpu.data.palette import decode_colormap
from cyclegan_tpu.data.transforms import eval_transform
from cyclegan_tpu.serve import build_predictor

MAX_BODY_BYTES = 64 * 1024 * 1024  # reject absurd uploads before decode

# Predict-latency histogram bucket upper bounds (seconds). Wide on the
# right tail: tiled/multi-scale TTA configs legitimately run seconds/image.
_LATENCY_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5,
                    5.0, 10.0)


class _Metrics:
    """Request counters + predict-latency histogram, Prometheus text
    exposition format (counters and cumulative histogram buckets — the
    format scrapers parse without a client library)."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.requests_total: dict[str, int] = {}  # by (route, code)
        self.predict_seconds_sum = 0.0
        self.predict_seconds_count = 0
        self.bucket_counts = [0] * len(_LATENCY_BUCKETS)

    def count(self, route: str, code: int) -> None:
        key = f'route="{route}",code="{code}"'
        with self.lock:
            self.requests_total[key] = self.requests_total.get(key, 0) + 1

    def observe_predict(self, seconds: float) -> None:
        with self.lock:
            self.predict_seconds_sum += seconds
            self.predict_seconds_count += 1
            for i, ub in enumerate(_LATENCY_BUCKETS):
                if seconds <= ub:
                    self.bucket_counts[i] += 1

    def render(self) -> str:
        with self.lock:
            lines = [
                "# HELP cyclegan_tpu_requests_total HTTP requests by "
                "route and status code",
                "# TYPE cyclegan_tpu_requests_total counter",
            ]
            for key, n in sorted(self.requests_total.items()):
                lines.append(f"cyclegan_tpu_requests_total{{{key}}} {n}")
            lines += [
                "# HELP cyclegan_tpu_predict_seconds Device predict call "
                "latency (decode/encode excluded)",
                "# TYPE cyclegan_tpu_predict_seconds histogram",
            ]
            cum = 0
            for ub, n in zip(_LATENCY_BUCKETS, self.bucket_counts):
                cum += n
                lines.append(
                    f'cyclegan_tpu_predict_seconds_bucket{{le="{ub}"}} {cum}')
            lines.append(
                f'cyclegan_tpu_predict_seconds_bucket{{le="+Inf"}} '
                f"{self.predict_seconds_count}")
            lines.append(f"cyclegan_tpu_predict_seconds_sum "
                         f"{self.predict_seconds_sum}")
            lines.append(f"cyclegan_tpu_predict_seconds_count "
                         f"{self.predict_seconds_count}")
        return "\n".join(lines) + "\n"


def _decode_image(data: bytes, hw: tuple[int, int], in_channels: int,
                  eval_resize: str) -> np.ndarray:
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        im = im.convert("L" if in_channels == 1 else "RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None]
    img, _ = eval_transform(arr, None, crop_hw=hw, mode=eval_resize)
    return img


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    # The server object carries predict/info/lock (see make_server).
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # stdout noise off; /healthz polls
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def _reply(self, code: int, body: bytes, ctype: str,
               route: str | None = None) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        self.server.metrics.count(route or urlparse(self.path).path, code)

    def _json(self, code: int, obj, route: str | None = None) -> None:
        self._reply(code, json.dumps(obj).encode(), "application/json",
                    route=route)

    def do_GET(self):  # noqa: N802 — http.server API
        path = urlparse(self.path).path
        if path == "/healthz":
            self._json(200, {"status": "ok",
                             "requests": self.server.requests_served})
            return
        if path == "/metrics":
            self._reply(200, self.server.metrics.render().encode(),
                        "text/plain; version=0.0.4")
            return
        if path == "/info":
            info = self.server.info
            self._json(200, {
                "manifest": info["manifest"],
                "head": info["head"],
                "num_classes": info["num_classes"],
                "window_hw": list(info["window_hw"]),
                "load_hw": list(info["load_hw"]),
                "in_channels": info["in_channels"],
                "eval_resize": info["eval_resize"],
                "tta": self.server.tta_options,
            })
            return
        self._json(404, {"error": f"unknown path {path!r} (GET /healthz, "
                                  f"/info, /metrics; POST /predict)"},
                   route="unknown")

    def do_POST(self):  # noqa: N802 — http.server API
        url = urlparse(self.path)
        if url.path != "/predict":
            self._json(404, {"error": f"unknown path {url.path!r} "
                                      f"(POST /predict)"}, route="unknown")
            return
        fmt = parse_qs(url.query).get("format", ["png"])[0]
        if fmt not in ("png", "mask", "json"):
            self._json(400, {"error": f"format must be png|mask|json, "
                                      f"got {fmt!r}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
        except ValueError:
            length = 0
        if length <= 0:
            self._json(400, {"error": "empty body (send encoded image "
                                      "bytes with Content-Length)"})
            return
        if length > MAX_BODY_BYTES:
            self._json(413, {"error": f"body {length} bytes exceeds "
                                      f"{MAX_BODY_BYTES}"})
            return
        data = self.rfile.read(length)
        info = self.server.info
        try:
            img = _decode_image(data, info["load_hw"], info["in_channels"],
                                info["eval_resize"])
        except Exception as e:  # PIL raises a zoo of decode errors
            self._json(400, {"error": f"could not decode image: {e}"})
            return
        with self.server.predict_lock:
            import time

            import jax

            t0 = time.perf_counter()
            pred = np.asarray(jax.device_get(
                self.server.predict(img[None])))[0].astype(np.uint8)
            self.server.metrics.observe_predict(time.perf_counter() - t0)
            self.server.requests_served += 1
        if fmt == "png":
            self._reply(200, _png_bytes(decode_colormap(pred)), "image/png")
        elif fmt == "mask":
            self._reply(200, _png_bytes(pred), "image/png")
        else:
            idx, cnt = np.unique(pred, return_counts=True)
            resp = {"shape": list(pred.shape),
                    "class_pixels": {int(i): int(n)
                                     for i, n in zip(idx, cnt)}}
            names = info["manifest"].get("class_names") or []
            if (len(names) == info["num_classes"]
                    and len(set(names)) == len(names)):
                # Artifacts exported with embedded class_names also get the
                # histogram keyed by label (additive; index keys stay).
                # Duplicate names would silently merge counts, so the named
                # view is skipped unless the table is unique (mirrors the
                # uniqueness assertion in test_class_names.py).
                resp["class_pixels_named"] = {
                    names[int(i)]: int(n) for i, n in zip(idx, cnt)
                    if 0 <= int(i) < len(names)}
            self._json(200, resp)


def make_server(artifact_path: str, *, host: str = "127.0.0.1",
                port: int = 0, eval_resize: str = "resize",
                canvas_hw: tuple[int, int] | None = None,
                flip: bool = False,
                scales: tuple[float, ...] | None = None,
                warmup: bool = True,
                verbose: bool = False) -> ThreadingHTTPServer:
    """Build (and optionally warm up) the serving HTTP server.

    ``port=0`` binds an ephemeral port (read it back from
    ``server.server_address[1]`` — how the tests run hermetically).
    ``warmup`` runs one dummy predict so the first real request hits a
    compiled program instead of a compile stall. Call ``serve_forever()``
    on the result (or :func:`run_http_serve` for the CLI wrapper).
    """
    predict, info = build_predictor(
        artifact_path, eval_resize=eval_resize, canvas_hw=canvas_hw,
        flip=flip, scales=scales)
    server = ThreadingHTTPServer((host, port), _Handler)
    server.predict = predict
    server.info = info
    server.predict_lock = threading.Lock()
    server.requests_served = 0
    server.metrics = _Metrics()
    server.verbose = verbose
    server.tta_options = {"flip": bool(flip),
                          "scales": list(scales) if scales else None,
                          "canvas_hw": list(canvas_hw) if canvas_hw else None}
    if warmup:
        import jax

        h, w = info["load_hw"]
        dummy = np.zeros((1, h, w, info["in_channels"]), np.float32)
        jax.device_get(predict(dummy))
    return server


def run_http_serve(artifact_path: str, *, host: str = "127.0.0.1",
                   port: int = 8000, **opts) -> None:
    """CLI entry: serve until interrupted."""
    server = make_server(artifact_path, host=host, port=port, **opts)
    bound = server.server_address
    print(f"serving {artifact_path} on http://{bound[0]}:{bound[1]} "
          f"(GET /healthz, /info; POST /predict)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
