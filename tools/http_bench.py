"""HTTP endpoint load benchmark: concurrent clients against --serve_http.

Starts the serving endpoint in-process on an exported artifact, fires
``--clients`` threads x ``--requests`` POST /predict each (a real encoded
PNG body), and reports req/s + latency percentiles as one JSON line —
the measurement harness behind BASELINE.md's micro-batching rows (round 4
measured +28% req/s at 8 clients; round 5 re-verifies with the
condition-variable leadership handoff).

Run: python tools/http_bench.py ARTIFACT [--clients 8] [--requests 24]
     [--max_batch 8] [--format mask]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from http.client import HTTPConnection
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=24,
                    help="requests per client")
    ap.add_argument("--max_batch", type=int, default=8,
                    help="server-side micro-batching cap (1 disables)")
    ap.add_argument("--format", default="mask", choices=["png", "mask", "json"])
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for a smoke run "
                         "that must not grab the TPU tunnel)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from PIL import Image

    from cyclegan_tpu.http_serve import make_server

    server = make_server(args.artifact, port=0, max_batch=args.max_batch)
    host, port = server.server_address
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    h, w = server.info["load_hw"]
    ch = server.info["in_channels"]
    rng = np.random.RandomState(0)
    body = io.BytesIO()
    Image.fromarray(rng.randint(0, 255, (h, w, ch), np.uint8).squeeze()).save(
        body, format="PNG")
    payload = body.getvalue()

    lat: list[float] = []
    lat_lock = threading.Lock()
    errors = []

    def client(i: int) -> None:
        conn = HTTPConnection(host, port, timeout=120)
        for _ in range(args.requests):
            t0 = time.perf_counter()
            conn.request("POST", f"/predict?format={args.format}", payload,
                         {"Content-Type": "image/png"})
            r = conn.getresponse()
            data = r.read()
            dt = time.perf_counter() - t0
            if r.status != 200:
                errors.append((r.status, data[:120]))
                return
            with lat_lock:
                lat.append(dt)
        conn.close()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    elapsed = time.perf_counter() - t0
    server.shutdown()
    server.server_close()
    if errors:
        raise SystemExit(f"request failures: {errors[:3]}")
    lat.sort()
    n = len(lat)
    print(json.dumps({
        "clients": args.clients, "requests_per_client": args.requests,
        "max_batch": args.max_batch, "format": args.format,
        "req_per_s": round(n / elapsed, 2),
        "latency_ms": {
            "p50": round(lat[n // 2] * 1e3, 1),
            "p90": round(lat[int(n * 0.9)] * 1e3, 1),
            "p99": round(lat[min(n - 1, int(n * 0.99))] * 1e3, 1),
            "max": round(lat[-1] * 1e3, 1)},
        "mean_batch": round(
            server.metrics.batched_images_sum
            / max(server.metrics.device_call_count, 1), 2),
    }))


if __name__ == "__main__":
    main()
