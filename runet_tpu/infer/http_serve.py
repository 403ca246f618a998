"""HTTP inference endpoint (SURVEY.md L9 serving adjunct).

The watch-folder daemon (`cli.py serve`) covers filesystem intake; this
module covers request/response intake — PACS gateways and orchestrators
that POST a volume and want the labelmap back on the same connection.
stdlib-only (`http.server`): nothing in the baked image beyond Python is
required, and the threading server is adequate because the workload is
one-device-bound anyway.

Endpoints:

  GET  /healthz      -> 200 JSON {status, device, cascade, num_classes}
  POST /v1/predict   -> body: ``.nii`` or ``.nii.gz`` bytes (gzip sniffed
                        by magic). Response: gzipped NIfTI-1 labelmap at
                        the native grid (application/gzip), with the JSON
                        report (latency, per-structure volumetry) in the
                        ``X-Runet-Report`` header.
  POST /v1/report    -> same body; JSON report only, no voxel payload —
                        for dashboards that want numbers, not a download.

Device discipline: ONE chip serves all requests, so predictions serialize
through a lock; the server threads still overlap request parse + response
gzip of one case with device compute of the in-flight one (the same
overlap the pipelined file server gets from its writer thread).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

# A KiTS19-scale int16 volume gzips to ~30-80 MB; f32 research exports run
# larger. Reject clearly-absurd bodies before buffering them.
MAX_BODY_BYTES = 1 << 31  # 2 GiB


class InferenceService:
    """Owns the model bundles and the single-device serialization lock."""

    def __init__(self, fine, coarse=None, cascade=None, postprocess: bool = True):
        from runet_tpu.config import CascadeConfig

        self.fine = fine
        self.coarse = coarse
        self.cascade = cascade if cascade is not None else CascadeConfig()
        self.postprocess = postprocess
        self._lock = threading.Lock()

    def predict(self, vol) -> tuple[np.ndarray, dict]:
        """Volume -> (native-grid uint8 labelmap, JSON-safe report)."""
        from runet_tpu.eval.surface import volumetry
        from runet_tpu.infer.cascade import predict_case, predict_volume

        t0 = time.monotonic()
        with self._lock:
            if self.coarse is not None:
                pred = predict_case(
                    self.coarse, self.fine, vol.data, vol.spacing,
                    self.cascade, postprocess=self.postprocess,
                )
            else:
                pred = predict_volume(self.fine, vol.data, vol.spacing)
        report = {
            "latency_s": round(time.monotonic() - t0, 3),
            "shape": list(vol.data.shape),
            "spacing_mm": [float(s) for s in vol.spacing],
            **volumetry(pred, vol.spacing, self.fine.num_classes),
        }
        return pred, report

    def health(self) -> dict:
        import jax

        return {
            "status": "ok",
            "device": str(jax.devices()[0]),
            "cascade": self.coarse is not None,
            "num_classes": self.fine.num_classes,
        }


def _make_handler(service: InferenceService):
    from runet_tpu.io.nifti import volume_from_bytes, volume_to_bytes

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: orchestrators reuse one connection for a
        # case stream; every response below sets Content-Length.
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default; report
            pass  # lines carry the signal (stderr prints in serve loop)

        def _send(self, code: int, body: bytes, ctype: str, extra=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: dict):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(200, service.health())
            else:
                self._send_json(404, {"error": f"no route {self.path}"})

        def _read_volume(self):
            n = int(self.headers.get("Content-Length", 0))
            if n <= 0:
                self._send_json(411, {"error": "Content-Length required"})
                return None
            if n > MAX_BODY_BYTES:
                self._send_json(413, {"error": f"body {n} bytes > {MAX_BODY_BYTES}"})
                return None
            raw = self.rfile.read(n)
            try:
                return volume_from_bytes(raw)
            except Exception as e:
                self._send_json(400, {"error": f"unparseable NIfTI body: {e!r}"})
                return None

        def do_POST(self):
            if self.path not in ("/v1/predict", "/v1/report"):
                self._send_json(404, {"error": f"no route {self.path}"})
                return
            vol = self._read_volume()
            if vol is None:
                return
            try:
                pred, report = service.predict(vol)
            except Exception as e:
                self._send_json(500, {"error": f"prediction failed: {e!r}"})
                return
            if self.path == "/v1/report":
                self._send_json(200, report)
                return
            body = volume_to_bytes(pred, vol.spacing, vol.affine, gz=True)
            self._send(
                200, body, "application/gzip",
                extra=(
                    ("X-Runet-Report", json.dumps(report)),
                    ("Content-Disposition", 'attachment; filename="labels.nii.gz"'),
                ),
            )

    return Handler


def make_server(
    service: InferenceService, host: str = "127.0.0.1", port: int = 8080
) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; caller owns its lifetime.
    ``port=0`` binds an ephemeral port (tests read ``server_address``)."""
    return ThreadingHTTPServer((host, port), _make_handler(service))
