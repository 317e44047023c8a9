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

Device work runs one call at a time, with **adaptive micro-batching**
(``--serve_http_batch``, default 8): while a device call is in flight,
concurrent requests queue up; whichever request thread next takes the
device lock coalesces everything waiting (up to the cap) into ONE batched
call. Batches are zero-padded to power-of-two buckets so the
batch-polymorphic artifact compiles a bounded set of programs — all
pre-warmed at startup — and steady-state requests never recompile. Under
a single client the path degenerates to today's batch-1 call with zero
added latency (no timer-based waiting; batching emerges only from actual
concurrency). One in-flight device call keeps the endpoint's memory
footprint flat under a threaded server; scaling beyond one chip is
horizontal — a fleet of independent hosts behind a load balancer, each
with its own artifact (matching ``--serve_dp``'s one-process contract).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from cyclegan_tpu.data.palette import save_prediction_png
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
        self.device_call_seconds_sum = 0.0
        self.device_call_count = 0
        self.batched_images_sum = 0  # images served across device calls

    def count(self, route: str, code: int) -> None:
        key = f'route="{route}",code="{code}"'
        with self.lock:
            self.requests_total[key] = self.requests_total.get(key, 0) + 1

    def observe_predict(self, seconds: float) -> None:
        """Per-REQUEST serving latency: queue wait + however many device
        rounds it took until this request's row came back. Observed once per
        request (count == requests), so p99 dashboards see exactly the
        latency a coalesced-behind-a-round request experiences — the device
        call itself is tracked separately by observe_device_call."""
        with self.lock:
            self.predict_seconds_sum += seconds
            self.predict_seconds_count += 1
            for i, ub in enumerate(_LATENCY_BUCKETS):
                if seconds <= ub:
                    # Per-bucket storage; render() does the cumulative sum
                    # Prometheus expects (without the break each observation
                    # landed in EVERY bucket above it and render double-
                    # accumulated — buckets came out non-monotonic vs +Inf).
                    self.bucket_counts[i] += 1
                    break

    def observe_device_call(self, seconds: float, n_images: int) -> None:
        with self.lock:
            self.device_call_seconds_sum += seconds
            self.device_call_count += 1
            self.batched_images_sum += n_images

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
                "# HELP cyclegan_tpu_predict_seconds Per-request predict "
                "latency: queue wait + device round(s) (decode/encode "
                "excluded); count == requests",
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
            lines += [
                "# HELP cyclegan_tpu_device_call_seconds Device call "
                "latency totals (one coalesced batch per call)",
                "# TYPE cyclegan_tpu_device_call_seconds summary",
                f"cyclegan_tpu_device_call_seconds_sum "
                f"{self.device_call_seconds_sum}",
                f"cyclegan_tpu_device_call_seconds_count "
                f"{self.device_call_count}",
                "# HELP cyclegan_tpu_predict_images_total Images served by "
                "device calls (ratio to device_call_seconds_count = mean "
                "micro-batch size)",
                "# TYPE cyclegan_tpu_predict_images_total counter",
                f"cyclegan_tpu_predict_images_total {self.batched_images_sum}",
            ]
        return "\n".join(lines) + "\n"


class _Slot:
    """One queued request: input image, completion event, result or error."""

    __slots__ = ("img", "done", "out", "err")

    def __init__(self, img: np.ndarray) -> None:
        self.img = img
        self.done = threading.Event()
        self.out: np.ndarray | None = None
        self.err: BaseException | None = None


def _bucket(n: int, cap: int) -> int:
    """Next power-of-two >= n, capped — the set of batch shapes the device
    ever sees (bounded program count; all pre-warmed at startup)."""
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)


class _MicroBatcher:
    """Adaptive request coalescing over one batch-polymorphic predictor.

    Leader–follower: every request enqueues its slot, then competes for the
    device lock. The winner (leader) drains up to ``max_batch`` queued slots,
    zero-pads the stack to a power-of-two bucket, runs ONE device call, and
    distributes the rows. Followers wake on their slot's event — served
    either by the leader's batch or by a later round. No timers: batching
    arises only when requests actually overlap, so a lone client pays
    exactly the batch-1 latency.
    """

    def __init__(self, predict, max_batch: int, metrics: "_Metrics") -> None:
        self.predict = predict
        self.max_batch = max(1, int(max_batch))
        self.metrics = metrics
        self._mutex = threading.Lock()     # guards queue + leadership
        self._cond = threading.Condition(self._mutex)
        self._leader_active = False        # one device call in flight
        self._queue: list[_Slot] = []

    def buckets(self) -> list[int]:
        out, b = [], 1
        while b < self.max_batch:
            out.append(b)
            b *= 2
        out.append(self.max_batch)
        return out

    def _serve_round(self) -> None:
        """Holding the device lock: drain one batch and complete its slots."""
        with self._mutex:
            take = self._queue[:self.max_batch]
            del self._queue[:len(take)]
        if not take:
            return
        try:
            import time

            import jax

            batch = np.stack([s.img for s in take])
            b = _bucket(batch.shape[0], self.max_batch)
            if b > batch.shape[0]:
                batch = np.concatenate(
                    [batch, np.zeros((b - batch.shape[0],) + batch.shape[1:],
                                     batch.dtype)])
            t0 = time.perf_counter()
            pred = np.asarray(jax.device_get(self.predict(batch)))
            self.metrics.observe_device_call(time.perf_counter() - t0,
                                             len(take))
            for s, p in zip(take, pred):
                s.out = p.astype(np.uint8)
        except BaseException as e:  # deliver to every waiter, don't hang them
            for s in take:
                s.err = e
        finally:
            for s in take:
                s.done.set()

    def predict_one(self, img: np.ndarray) -> np.ndarray:
        import time

        t0 = time.perf_counter()
        slot = _Slot(img)
        with self._cond:
            self._queue.append(slot)
        # Leader–follower with condition-variable handoff (no poll quantum):
        # whoever finds no leader active becomes leader and serves ONE round;
        # everyone else waits on the condition. After each round the leader
        # clears leadership and notify_all()s — served followers return
        # immediately, and a follower whose slot overflowed a full round
        # (queue > max_batch) takes leadership the same instant instead of
        # sleeping out a 50 ms retry quantum (round-4 advisor / VERDICT
        # weak #4: under sustained overload the old slot.done.wait(0.05)
        # loop added up to 50 ms of handoff latency per extra round).
        while True:
            with self._cond:
                while not slot.done.is_set() and self._leader_active:
                    self._cond.wait()
                if slot.done.is_set():
                    break
                self._leader_active = True
            try:
                self._serve_round()
            finally:
                with self._cond:
                    self._leader_active = False
                    self._cond.notify_all()
        if slot.err is not None:
            # Per-request wrapper: the round's exception object is shared by
            # every coalesced waiter, and concurrent raises of ONE exception
            # mutate its __traceback__ across threads (garbled logs).
            raise RuntimeError(f"device call failed: {slot.err}") from slot.err
        # Per-request latency (queue wait + device rounds); error paths are
        # visible in requests_total{code="500"} instead.
        self.metrics.observe_predict(time.perf_counter() - t0)
        return slot.out


def _decode_image(data: bytes, hw: tuple[int, int], in_channels: int,
                  eval_resize: str, input_dtype: str = "float32"
                  ) -> np.ndarray:
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        im = im.convert("L" if in_channels == 1 else "RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None]
    # uint8-input artifacts normalize on-device; ship raw shaped pixels.
    img, _ = eval_transform(arr, None, crop_hw=hw, mode=eval_resize,
                            normalize_img=input_dtype != "uint8")
    return img


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _pred_png_bytes(pred: np.ndarray) -> bytes:
    """Colorized prediction PNG (P-mode palette by default — the RGB
    encode was the endpoint's dominant per-request host cost; see
    palette.save_prediction_png)."""
    buf = io.BytesIO()
    save_prediction_png(pred, buf)
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    # The server object carries predict/info/lock (see make_server).
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # stdout noise off; /healthz polls
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def _reply(self, code: int, body: bytes, ctype: str,
               route: str | None = None) -> None:
        # Count BEFORE writing the response: a client that receives the
        # reply and immediately scrapes /metrics must see this request.
        self.server.metrics.count(route or urlparse(self.path).path, code)
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

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
                "input_dtype": info["input_dtype"],
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
                                info["eval_resize"], info["input_dtype"])
        except Exception as e:  # PIL raises a zoo of decode errors
            self._json(400, {"error": f"could not decode image: {e}"})
            return
        try:
            pred = self.server.batcher.predict_one(img)
        except Exception as e:  # device-call failure: fail THIS request
            self._json(500, {"error": f"predict failed: {e}"})
            return
        with self.server.count_lock:
            self.server.requests_served += 1
        if fmt == "png":
            self._reply(200, _pred_png_bytes(pred), "image/png")
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
                warmup: bool = True, max_batch: int = 8,
                data_parallel: bool = False,
                verbose: bool = False) -> ThreadingHTTPServer:
    """Build (and optionally warm up) the serving HTTP server.

    ``port=0`` binds an ephemeral port (read it back from
    ``server.server_address[1]`` — how the tests run hermetically).
    ``warmup`` runs one dummy predict per micro-batch bucket so every
    steady-state request shape hits a compiled program instead of a
    compile stall. ``max_batch`` caps adaptive request coalescing
    (``_MicroBatcher``); 1 disables batching entirely. ``data_parallel``
    shards each (micro-)batch over all local devices (serve.build_predictor
    — pairs naturally with micro-batching: coalesced requests spread across
    the chips). Call ``serve_forever()`` on the result (or
    :func:`run_http_serve` for the CLI wrapper).
    """
    predict, info = build_predictor(
        artifact_path, eval_resize=eval_resize, canvas_hw=canvas_hw,
        data_parallel=data_parallel, flip=flip, scales=scales)
    if info["num_classes"] > 255:
        # Every HTTP output path is 8-bit (micro-batcher rows, mask PNGs,
        # P-mode palette PNGs); silently wrapping class indices above 255
        # would corrupt predictions, so refuse at server build time.
        raise ValueError(
            f"--serve_http supports at most 255 classes (artifact has "
            f"{info['num_classes']}): the mask/palette PNG responses are "
            f"8-bit")
    server = ThreadingHTTPServer((host, port), _Handler)
    server.predict = predict
    server.info = info
    server.count_lock = threading.Lock()
    server.requests_served = 0
    server.metrics = _Metrics()
    server.batcher = _MicroBatcher(predict, max_batch, server.metrics)
    server.verbose = verbose
    server.tta_options = {"flip": bool(flip),
                          "scales": list(scales) if scales else None,
                          "canvas_hw": list(canvas_hw) if canvas_hw else None,
                          "data_parallel": bool(data_parallel),
                          "max_batch": max(1, int(max_batch))}
    if warmup:
        import jax

        h, w = info["load_hw"]
        for b in server.batcher.buckets():
            dummy = np.zeros((b, h, w, info["in_channels"]),
                             np.dtype(info["input_dtype"]))
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
