"""Minimal HTTP front end for codec serving (stdlib-only).

Endpoints:

- ``POST /compress?q=<rate_ind>``   body: PNG/JPEG bytes
      -> ``application/octet-stream``: the `.bin` container (the exact
      length-prefixed ``save_byte_strings`` layout, so files from
      ``scripts/compress.py`` and this server interoperate).  Response
      headers carry ``X-CRDR-BPP`` (real bpp) and ``X-CRDR-Wire``.
- ``POST /decompress?beta=<beta>``  body: `.bin` container
      -> ``image/png`` reconstruction.
- ``GET /healthz``                  -> JSON: model/wire/devices + batcher
      stats (batch-size histogram shows whether micro-batching is winning).

Concurrent requests are coalesced into batched TPU dispatches by
:class:`crdr_tpu.serving.MicroBatcher` — the HTTP layer is a thin
``ThreadingHTTPServer`` (one thread per in-flight request, all blocking on
batcher futures; the single batcher worker owns the device).

Serving infrastructure extension — the reference only ships offline CLIs
(``/root/reference/scripts/compress.py``).
"""

from __future__ import annotations

import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..utils.codec_utils import pack_byte_strings, unpack_byte_strings
from .batcher import MicroBatcher

__all__ = ["make_server", "CodecHTTPServer"]


def _png_to_uint8(data: bytes) -> np.ndarray:
    """Decode image bytes -> uint8 HWC RGB.  Raw uint8 is the codec's
    preferred input: the fused encode converts on device, so the h2d
    transfer stays 4x smaller than float32 and the 1-CPU host does no
    pixel math."""
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img, np.uint8)


def _uint8_to_png(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="PNG")
    return buf.getvalue()


class CodecHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer carrying the model + batcher context."""

    daemon_threads = True

    def __init__(self, addr, model, max_batch: int = 8,
                 max_wait_s: float = 0.01,
                 default_q: Optional[float] = None,
                 default_beta: Optional[float] = None):
        self.model = model
        self.batcher = MicroBatcher(model, max_batch=max_batch,
                                    max_wait_s=max_wait_s)
        self.default_q = default_q
        self.default_beta = default_beta
        super().__init__(addr, _Handler)

    def shutdown(self):  # drain device work before stopping the listener
        self.batcher.close()
        super().shutdown()


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    # quiet: route access logs away from stderr chatter
    def log_message(self, fmt, *args):
        pass

    def _send(self, code: int, body: bytes, ctype: str, extra=None):
        self._responded = True
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _err(self, code: int, msg: str):
        self._send(code, json.dumps({"error": msg}).encode(),
                   "application/json")

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n)

    def do_GET(self):
        srv: CodecHTTPServer = self.server  # type: ignore[assignment]
        path = urlparse(self.path).path
        if path in ("/healthz", "/stats"):
            import jax

            info = {
                "status": "ok",
                "model": type(srv.model).__name__,
                "wire_format": getattr(srv.model, "wire_format",
                                       "compressai"),
                "devices": [str(d) for d in jax.devices()],
                "batcher": srv.batcher.stats(),
            }
            self._send(200, json.dumps(info).encode(), "application/json")
        else:
            self._err(404, f"no route {path}")

    def do_POST(self):
        srv: CodecHTTPServer = self.server  # type: ignore[assignment]
        url = urlparse(self.path)
        qs = parse_qs(url.query)
        self._responded = False
        body = self._body()  # always drain: keep-alive framing must not
        # desync when the route/handler errors before consuming it

        def _param(name, default):
            if name in qs:
                return float(qs[name][0])
            return default

        try:
            if url.path == "/compress":
                img = _png_to_uint8(body)
                rate = _param("q", srv.default_q)
                enc = srv.batcher.compress(img, rate_ind=rate)
                blob = pack_byte_strings(enc["string_list"])
                bpp = len(blob) * 8 / (img.shape[0] * img.shape[1])
                self._send(200, blob, "application/octet-stream", {
                    "X-CRDR-BPP": f"{bpp:.6f}",
                    "X-CRDR-Wire": getattr(srv.model, "wire_format",
                                           "compressai"),
                })
            elif url.path == "/decompress":
                strings = unpack_byte_strings(body)
                beta = _param("beta", srv.default_beta)
                img = srv.batcher.decompress(strings, beta=beta)
                self._send(200, _uint8_to_png(img), "image/png")
            else:
                self._err(404, f"no route {url.path}")
        except Exception as e:  # surface codec errors as 400s, keep serving
            if self._responded:
                # response already (partially) written — a second one would
                # corrupt the stream; drop the connection instead
                self.close_connection = True
            else:
                self._err(400, f"{type(e).__name__}: {e}")


def make_server(model, host: str = "127.0.0.1", port: int = 8080,
                **kw) -> CodecHTTPServer:
    return CodecHTTPServer((host, port), model, **kw)
