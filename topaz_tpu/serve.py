"""``topaz serve`` — HTTP inference endpoint for production deployment
(TPU-build extension; the reference ships only batch CLI commands,
topaz/main.py:87-126 registry).

A microscope facility or processing portal POSTs micrographs and gets
picks (JSON) or denoised images (MRC) back, with the models, compiled
programs, and the chip kept warm between requests — the per-request cost
is device compute only, never a cold compile after the first image of a
given shape bucket.

Protocol (stdlib-only on both ends):

  GET  /healthz   liveness + configuration
  GET  /models    bundled picker / denoiser names
  POST /extract   body = one micrograph file (MRC/TIFF/PNG — anything
                  io.image.load_image reads); response JSON
                  ``{"picks": [{"x", "y", "score"}, ...], "count", "scale",
                  "threshold"}`` with x/y in RAW input-pixel coordinates
                  (the pipeline scores at the downsampled scale and the
                  server scales coordinates back, as ``topaz watch`` does).
                  Query: ``?threshold=T`` filters picks per request; T must
                  be >= the server's configured threshold (NMS below the
                  configured threshold would need a rescore — the server
                  says so with a 400 rather than silently returning a
                  truncated list).
  POST /denoise   body = one micrograph; response = denoised MRC bytes
                  (reference patch defaults -s 1024 -p 500,
                  topaz/commands/denoise.py:52-53).

Device work is serialized with a lock (one exclusive chip); HTTP I/O and
file parsing run in per-request threads (ThreadingHTTPServer), so request
ingestion overlaps device compute under load.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from topaz_tpu.utils.printing import report

# formats load_image dispatches on; used to pick the temp-file suffix from
# the request's Content-Type (default: MRC, the microscope-native format)
_CONTENT_SUFFIX = {
    "application/x-mrc": ".mrc",
    "image/tiff": ".tiff",
    "image/png": ".png",
    "image/jpeg": ".jpg",
}


class TopazService:
    """The model/pipeline state shared across requests."""

    def __init__(self, model: str = "resnet16_u32",
                 denoise_model: Optional[str] = None, scale: int = 8,
                 radius: int = 14, threshold: float = -6.0,
                 precision=None, bins: int = 0, dtype=None,
                 max_request_bytes: int = 2 << 30):
        from topaz_tpu.pipeline import MicrographPipeline

        self.model = model
        self.denoise_model = denoise_model
        self.scale = scale
        self.radius = radius
        self.threshold = threshold
        self.max_request_bytes = max_request_bytes
        self.pipe = MicrographPipeline(
            model=model, scale=scale, radius=radius, threshold=threshold,
            normalize=True, precision=precision, bins=bins, dtype=dtype)
        self._denoiser = None
        self._dtype = dtype
        self._lock = threading.Lock()  # one chip; serialize device work
        self.started = time.time()
        self.n_extracted = 0
        self.n_denoised = 0

    def _get_denoiser(self):
        if self._denoiser is None:
            from topaz_tpu.denoise import Denoise

            self._denoiser = Denoise(self.denoise_model or "unet",
                                     dtype=self._dtype)
        return self._denoiser

    def extract(self, path: str, threshold: Optional[float] = None):
        """Run the picking pipeline on one saved micrograph; returns
        (scores, raw-scale integer coords)."""
        if threshold is not None and threshold < self.threshold:
            raise ValueError(
                f"requested threshold {threshold} is below the server's "
                f"configured {self.threshold}; picks below the configured "
                f"threshold were suppressed at NMS time — restart the "
                f"server with a lower -t to serve them")
        with self._lock:
            (_, scores, coords), = self.pipe.process([path])
        scores = np.asarray(scores)
        coords = np.asarray(coords)
        if threshold is not None:
            keep = scores >= threshold
            scores, coords = scores[keep], coords[keep]
        if self.scale != 1 and len(coords):
            coords = np.round(coords * float(self.scale)).astype(int)
        self.n_extracted += 1
        return scores, coords

    def denoise(self, path: str) -> np.ndarray:
        from topaz_tpu.io.image import load_image

        x = np.asarray(load_image(path), dtype=np.float32)
        with self._lock:
            y = self._get_denoiser().denoise(x, patch_size=1024, padding=500)
        self.n_denoised += 1
        return np.asarray(y, dtype=np.float32)

    def health(self) -> dict:
        import jax

        return {
            "status": "ok",
            "device": str(jax.devices()[0]),
            "model": self.model,
            "denoise_model": self.denoise_model,
            "scale": self.scale,
            "radius": self.radius,
            "threshold": self.threshold,
            "uptime_s": round(time.time() - self.started, 1),
            "extracted": self.n_extracted,
            "denoised": self.n_denoised,
        }


def _models_listing() -> dict:
    from topaz_tpu.models.factory import PRETRAINED_PICKERS
    from topaz_tpu.models.denoise_factory import PRETRAINED_DENOISERS

    return {"pickers": sorted(PRETRAINED_PICKERS),
            "denoisers": sorted(PRETRAINED_DENOISERS)}


class _Handler(BaseHTTPRequestHandler):
    service: TopazService  # set by make_server

    # -- helpers -----------------------------------------------------------
    def _send_json(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_body_to_tempfile(self) -> str:
        n = int(self.headers.get("Content-Length") or 0)
        if n <= 0:
            raise ValueError("empty request body; POST the micrograph file")
        if n > self.service.max_request_bytes:
            raise _TooLarge(n)
        suffix = _CONTENT_SUFFIX.get(
            (self.headers.get("Content-Type") or "").split(";")[0].strip(),
            ".mrc")
        fd, path = tempfile.mkstemp(suffix=suffix, prefix="topaz_serve_")
        try:
            with os.fdopen(fd, "wb") as f:
                remaining = n
                while remaining:
                    chunk = self.rfile.read(min(remaining, 1 << 20))
                    if not chunk:
                        raise ValueError("truncated request body")
                    f.write(chunk)
                    remaining -= len(chunk)
        except BaseException:
            os.unlink(path)
            raise
        return path

    def log_message(self, fmt, *args):  # route access logs through report
        report(f"serve: {self.address_string()} {fmt % args}")

    # -- routes ------------------------------------------------------------
    def do_GET(self):
        route = urlparse(self.path).path
        if route == "/healthz":
            return self._send_json(200, self.service.health())
        if route == "/models":
            return self._send_json(200, _models_listing())
        return self._send_json(404, {"error": f"unknown route {route}; "
                                     f"routes: /healthz /models /extract "
                                     f"/denoise"})

    def do_POST(self):
        url = urlparse(self.path)
        try:
            if url.path == "/extract":
                return self._extract(url)
            if url.path == "/denoise":
                return self._denoise()
            return self._send_json(404, {"error": f"unknown route "
                                         f"{url.path}"})
        except _TooLarge as e:
            return self._send_json(413, {"error": str(e)})
        except ValueError as e:
            return self._send_json(400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 — boundary: report, don't die
            return self._send_json(500, {"error": f"{type(e).__name__}: {e}"})

    def _extract(self, url):
        q = parse_qs(url.query)
        threshold = float(q["threshold"][0]) if "threshold" in q else None
        path = self._read_body_to_tempfile()
        try:
            scores, coords = self.service.extract(path, threshold=threshold)
        finally:
            os.unlink(path)
        picks = [{"x": int(coords[i, 0]), "y": int(coords[i, 1]),
                  "score": float(scores[i])} for i in range(len(scores))]
        self._send_json(200, {
            "picks": picks, "count": len(picks),
            "scale": self.service.scale,
            "threshold": (self.service.threshold if threshold is None
                          else threshold)})

    def _denoise(self):
        from topaz_tpu.io import mrc

        path = self._read_body_to_tempfile()
        try:
            y = self.service.denoise(path)
        finally:
            os.unlink(path)
        fd, out = tempfile.mkstemp(suffix=".mrc", prefix="topaz_serve_out_")
        os.close(fd)
        try:
            mrc.write(out, y)
            with open(out, "rb") as f:
                body = f.read()
        finally:
            os.unlink(out)
        self.send_response(200)
        self.send_header("Content-Type", "application/x-mrc")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


class _TooLarge(Exception):
    def __init__(self, n):
        super().__init__(f"request body of {n} bytes exceeds the server's "
                         f"--max-request-bytes limit")


def make_server(service: TopazService, host: str = "127.0.0.1",
                port: int = 8000) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; ``port=0`` picks a free
    ephemeral port (``server.server_address[1]`` has the real one)."""
    handler = type("TopazHandler", (_Handler,), {"service": service})
    server = ThreadingHTTPServer((host, port), handler)
    server.daemon_threads = True
    return server


def serve_from_args(args) -> int:
    """CLI adapter (cli/commands/serve.py)."""
    from topaz_tpu.parallel.devices import resolve_devices

    if getattr(args, "device", 0) >= 0:
        resolve_devices(args.device)
    dtype = "bf16" if getattr(args, "precision", "f32") == "bf16" else None
    service = TopazService(
        model=args.model, denoise_model=args.denoise_model,
        scale=args.scale, radius=args.radius, threshold=args.threshold,
        bins=getattr(args, "bins", 0), dtype=dtype,
        max_request_bytes=args.max_request_bytes)
    server = make_server(service, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    report(f"serve: listening on http://{host}:{port} "
           f"(model {args.model}, scale {args.scale}, threshold "
           f"{args.threshold}); POST micrographs to /extract or /denoise")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        report("serve: interrupted — shutting down")
    finally:
        server.server_close()
    return 0
