"""HTTP serving for the retrieval service (stdlib-only, deployable).

The reference stops at offline evaluation scripts; this turns
:class:`~vtc_tpu.serving.index.ClipRetrievalService` into a deployable
endpoint (``scripts/serve.py`` is the CLI). Design points, TPU-serving
shaped:

* stdlib ``ThreadingHTTPServer`` — no web-framework dependency to gate on;
* requests funnel through ONE lock around the device work: a single chip
  executes one program at a time anyway, and serialized dispatch keeps the
  power-of-two query bucketing (`ClipRetrievalService._bucketed`) the only
  compile-shape source — concurrent ragged dispatches would interleave
  compiles of the same buckets;
* the first request of each bucket size pays the XLA compile; ``warmup()``
  pre-pays buckets up to a cap so production traffic never sees a compile
  stall.

Endpoints (JSON in/out):

  GET  /healthz                   -> {"status": "ok", "gallery_size": N}
  POST /search/text  {"queries": ["a cat", ...], "k": 10}
  POST /search/image {"images": [[...]], "k": 10}   # [n, 3, H, W] floats
                                                     # (pre-preprocessed)
  POST /search/image {"images_b64": ["<base64 JPEG/PNG>", ...], "k": 10}
       # encoded bytes: decoded and CLIP-preprocessed server-side through
       # the PIL-bit-exact native worker (native/vtc_preproc.cpp) — the
       # boundary a real client cares about: no client-side reimplementation
       # of CLIP resize/normalize
  all  -> {"ids": [[...]], "scores": [[...]]}
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

logger = logging.getLogger(__name__)


class RetrievalHTTPServer:
    """Wraps a ClipRetrievalService (+ tokenizer for text queries) in an
    HTTP server. ``port=0`` binds an ephemeral port (tests); ``serve()``
    blocks, ``start()`` runs the accept loop in a daemon thread and returns
    the bound port."""

    def __init__(self, service, tokenizer=None, host="127.0.0.1", port=8000,
                 max_k: int = 100, max_batch: int = 1024,
                 image_size: int = 224):
        self.service = service
        self.tokenizer = tokenizer
        self.max_k = int(max_k)
        self.max_batch = int(max_batch)
        self.image_size = int(image_size)
        self._lock = threading.Lock()  # serialize device dispatch
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # route table lives on the outer object; handlers stay thin
            def log_message(self, fmt, *args):  # route to logging, not stderr
                logger.debug("%s - %s", self.address_string(), fmt % args)

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(
                        200,
                        {"status": "ok",
                         "gallery_size": len(outer.service.index)},
                    )
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError) as e:
                    self._reply(400, {"error": f"bad JSON: {e}"})
                    return
                try:
                    if self.path == "/search/text":
                        payload = outer.search_text(req)
                    elif self.path == "/search/image":
                        payload = outer.search_image(req)
                    else:
                        self._reply(404, {"error": f"unknown path {self.path}"})
                        return
                except ValueError as e:
                    self._reply(400, {"error": str(e)})
                    return
                except Exception:  # noqa: BLE001 — a serving loop must not die
                    logger.exception("request failed")
                    self._reply(500, {"error": "internal error"})
                    return
                self._reply(200, payload)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = None

    # ------------------------------------------------------------------ #

    def _k(self, req) -> int:
        k = int(req.get("k", 10))
        if not 1 <= k <= self.max_k:
            raise ValueError(f"k must be in [1, {self.max_k}], got {k}")
        return k

    def _check_batch(self, n: int):
        if n == 0:
            raise ValueError("empty query batch")
        if n > self.max_batch:
            raise ValueError(
                f"batch too large ({n} > max_batch={self.max_batch})"
            )

    def search_text(self, req: dict) -> dict:
        queries = req.get("queries")
        if not isinstance(queries, list) or not all(
            isinstance(q, str) for q in queries
        ):
            raise ValueError('"queries" must be a list of strings')
        self._check_batch(len(queries))
        if self.tokenizer is None:
            raise ValueError("server started without a tokenizer")
        # one batched call — data.tokenizer.tokenize returns [n, 77] int32
        tokens = np.asarray(self.tokenizer(queries), np.int32)
        if tokens.ndim != 2:
            raise ValueError(
                f"tokenizer returned shape {tokens.shape}, expected [n, L]"
            )
        with self._lock:
            ids, scores = self.service.search_text(tokens, k=self._k(req))
        return {"ids": ids.tolist(), "scores": scores.tolist()}

    def _decode_b64_images(self, items) -> np.ndarray:
        """base64 JPEG/PNG -> CLIP-preprocessed [n, 3, S, S] float32 via the
        PIL-bit-exact preprocessor (``native/vtc_preproc.cpp``; transparent
        PIL fallback) — byte-identical to a client preprocessing with PIL
        and posting floats (pinned in tests/test_serving.py)."""
        if not isinstance(items, list) or not all(
            isinstance(s, str) for s in items
        ):
            raise ValueError('"images_b64" must be a list of base64 strings')
        self._check_batch(len(items))
        import base64
        import io

        from PIL import Image

        from ..data.datasets import clip_preprocess_batch

        out = []
        for i, s in enumerate(items):
            try:
                raw = base64.b64decode(s, validate=True)
                img = Image.open(io.BytesIO(raw)).convert("RGB")
            except Exception as e:  # noqa: BLE001 — map to a 400, not a 500
                raise ValueError(f"images_b64[{i}]: cannot decode image: {e}")
            frame = np.asarray(img, np.uint8)[None]  # [1, h, w, 3]
            out.append(clip_preprocess_batch(frame, self.image_size)[0])
        return np.stack(out)

    def search_image(self, req: dict) -> dict:
        images = req.get("images")
        b64 = req.get("images_b64")
        if (images is None) == (b64 is None):
            raise ValueError(
                'provide exactly one of "images" (pre-preprocessed floats) '
                'or "images_b64" (encoded JPEG/PNG bytes)'
            )
        if b64 is not None:
            arr = self._decode_b64_images(b64)
        else:
            arr = np.asarray(images, np.float32)
            if arr.ndim != 4:
                raise ValueError(
                    f"images must be a 4-D batch, got shape {arr.shape}"
                )
            self._check_batch(arr.shape[0])
        with self._lock:
            ids, scores = self.service.search_image(arr, k=self._k(req))
        return {"ids": ids.tolist(), "scores": scores.tolist()}

    # ------------------------------------------------------------------ #

    def warmup(self, context_length: int = 77, max_bucket: int = 16):
        """Pre-compile the text-encode executables for power-of-two buckets
        up to ``max_bucket`` so live traffic never waits on XLA."""
        b = 1
        while b <= max_bucket:
            tokens = np.zeros((b, context_length), np.int32)
            with self._lock:
                self.service.search_text(tokens, k=1)
            b *= 2

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> int:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def serve(self):
        logger.info("serving on %s:%d", *self._httpd.server_address)
        self._httpd.serve_forever()

    def shutdown(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
