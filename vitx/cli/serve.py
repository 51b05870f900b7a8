"""Serving CLI: ``python -m vitx.cli.serve --preset base16 --checkpoint ...``

A stdlib HTTP front end over ``vitx.serve.InferenceServer`` (dynamic
batching, one compiled forward, on-device top-k). Endpoints:

- ``POST /predict`` — body is a raw float32 (H, W, C) image (``.npy`` bytes
  or raw little-endian floats); response JSON ``{"probs": [...],
  "classes": [...]}`` for the top-k classes.
- ``POST /explain[?method=rollout|gradcam&class=K]`` — same body; response
  adds ``heatmap`` (patch-grid weights, row-major), ``grid`` and
  ``method``. ``rollout`` = class-agnostic attention rollout; ``gradcam`` =
  class-specific saliency (``class`` defaults to the prediction). Runs
  outside the batching path (debug/inspection surface).
- ``GET /stats`` — JSON throughput/latency/occupancy counters.
- ``GET /metrics`` — the same counters in Prometheus text exposition format.
- ``GET /healthz`` — 200 once the model is compiled and serving.

Client example:

    import io, numpy as np, urllib.request
    buf = io.BytesIO(); np.save(buf, img.astype(np.float32))
    req = urllib.request.Request("http://127.0.0.1:8808/predict",
                                 data=buf.getvalue(), method="POST")
    print(urllib.request.urlopen(req).read())
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from vitx.core.config import PRESETS, ViTConfig


def make_handler(server):
    cfg = server.cfg

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):            # quiet access log
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply(self, code, payload: dict):
            self._send(code, json.dumps(payload).encode(),
                       "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/stats":
                self._reply(200, server.stats.summary())
            elif self.path == "/metrics":
                # Prometheus text exposition of the same counters
                s = server.stats.summary()
                lines = []
                for name, key in (("requests_total", "requests"),
                                  ("batches_total", "batches"),
                                  ("rejected_total", "rejected"),
                                  ("explains_total", "explains")):
                    lines.append(f"# TYPE vitx_{name} counter")
                    lines.append(f"vitx_{name} {s[key]}")
                lines.append("# TYPE vitx_batch_occupancy gauge")
                lines.append(f"vitx_batch_occupancy {s['batch_occupancy']}")
                lines.append("# TYPE vitx_latency_ms summary")
                for q, key in (("0.5", "p50_ms"), ("0.9", "p90_ms"),
                               ("0.99", "p99_ms")):
                    lines.append(
                        f'vitx_latency_ms{{quantile="{q}"}} {s[key]}')
                self._send(200, ("\n".join(lines) + "\n").encode(),
                           "text/plain; version=0.0.4")
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path not in ("/predict", "/explain"):
                self._reply(404, {"error": "unknown path"})
                return
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            try:
                if raw[:6] == b"\x93NUMPY":
                    img = np.load(io.BytesIO(raw))
                else:
                    img = np.frombuffer(raw, np.float32).reshape(
                        cfg.image_size, cfg.image_size, cfg.num_channels)
                img = np.asarray(img, np.float32)
                if url.path == "/predict":
                    out = server.predict(img)
                else:
                    q = parse_qs(url.query)
                    cls = q.get("class", [None])[0]
                    out = server.explain(
                        img, method=q.get("method", ["rollout"])[0],
                        class_idx=None if cls is None else int(cls))
                self._reply(200, out)
            except Exception as e:   # noqa: BLE001 — surface to the client
                from vitx.serve import ServerOverloaded

                code = 503 if isinstance(e, ServerOverloaded) else 400
                self._reply(code, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def resolve_serve_config(checkpoint, config_json, preset,
                         tome_r=0) -> ViTConfig:
    """Config discovery for serving — delegates to the shared rule
    (vitx/train/checkpoint.py::resolve_artifact_config, also used by the
    eval and probe CLIs) so the three inference surfaces cannot drift."""
    from vitx.train.checkpoint import resolve_artifact_config

    return resolve_artifact_config(checkpoint, config_json, preset,
                                   tome_r=tome_r)


def main(argv=None):
    from vitx.core.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(prog="vitx.serve")
    p.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    p.add_argument("--config-json", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="{epoch}.ckpt file, checkpoint dir (newest epoch), "
                        "orbax dir, reference .pt, .quant.npz int8 artifact "
                        "or .stablehlo deployment artifact (params baked "
                        "in); omit for fresh params")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8808)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--dp", type=int, default=None,
                   help="serve over a data-parallel mesh of this many chips")
    p.add_argument("--temperature", type=float, default=None,
                   help="temperature-scale the served probabilities "
                        "(fit T with vitx.eval --calibrate)")
    from vitx.nn.tome import parse_tome_r
    p.add_argument("--tome-r", type=parse_tome_r, default=0,
                   help="ToMe token merging: merge this many patch-token "
                        "pairs per block (vitx/nn/tome.py), a comma-"
                        "separated per-block schedule, or 'toN' (e.g. "
                        "to128) — higher throughput for a small accuracy "
                        "delta")
    args = p.parse_args(argv)

    from vitx.serve import load_server

    cfg = resolve_serve_config(args.checkpoint, args.config_json,
                               args.preset, args.tome_r)
    mesh = None
    if args.dp is not None:
        from vitx.parallel import make_mesh

        mesh = make_mesh(dp=args.dp, tp=1)
    server = load_server(args.checkpoint, cfg, batch_size=args.batch_size,
                         top_k=args.top_k, max_delay_ms=args.max_delay_ms,
                         mesh=mesh, temperature=args.temperature)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    print(f"serving {args.preset} on http://{args.host}:{httpd.server_port} "
          f"(batch {args.batch_size}, top-{server.top_k})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()    # release the listening socket
        server.close()
    return 0


def serve_in_thread(server, host="127.0.0.1", port=0):
    """Start the HTTP front end on a background thread (tests / embedding).
    Returns (httpd, thread); ``httpd.server_port`` has the bound port."""
    httpd = ThreadingHTTPServer((host, port), make_handler(server))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, t


if __name__ == "__main__":
    sys.exit(main())
