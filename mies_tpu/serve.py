"""HTTP inference serving: a warm-compiled enhancement endpoint.

The CLI pays process startup + (first-call) XLA compile per invocation;
clinical integrations (PACS hooks, modality gateways) want a resident
process that holds the compiled programs and answers over HTTP. This is
that front end — stdlib only (``http.server``), one process, the same
``pipeline.runner`` path as the CLI:

  GET  /healthz            liveness + backend + compiled-shape count
  GET  /config             the active pipeline config (JSON)
  POST /enhance            body = image bytes (PNG/JPEG/TIFF/DICOM);
                           responds image/png (uint8). The input format
                           is taken from Content-Type or ``?filename=``
                           (DICOM needs one of them; PNG/JPEG/TIFF
                           sniff fine either way). ``?metrics=psnr,ssim``
                           adds an ``X-Mies-Metrics`` JSON header
                           computed against the (windowed) input.

Programs are compiled per input shape on first use and cached for the
life of the process (``compile_pipeline``'s lru cache); a ``--warmup
HxW`` shape compiles before the socket opens so the first real request
is fast. Requests are served from a threading server — JAX dispatch is
thread-safe, and the GIL serializes the cheap host work.

Role analogue: the reference's torch stack is routinely fronted by
exactly such a process (SURVEY.md section 1b CLI/scripts layer); no
reference code exists (section 0), so the surface is self-defined.
"""

from __future__ import annotations

import io
import json
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

from mies_tpu.pipeline.config import PipelineConfig

_SUFFIX_BY_TYPE = {
    "image/png": ".png",
    "image/jpeg": ".jpg",
    "image/tiff": ".tif",
    "application/dicom": ".dcm",
}


class _State:
    def __init__(self, cfg: PipelineConfig,
                 artifact_fn=None, artifact_header: dict | None = None):
        self.cfg = cfg
        self.artifact_fn = artifact_fn
        self.artifact_header = artifact_header
        self.shapes: set = set()
        self.lock = threading.Lock()


def validate_servable_artifact(header: dict) -> None:
    """Startup gate: only single-slice [H, W] quantizing artifacts are
    servable — a batched/volume/float-output export would otherwise
    start a healthy-looking server that 400s every request."""
    shape = header.get("input_shape", [])
    if header.get("volume") or len(shape) != 2:
        raise ValueError(
            f"artifact takes input shape {shape}; serving needs a "
            f"single-slice [H, W] program — re-export with --batch 1 "
            f"(and without --volume)"
        )
    if not header.get("quantize", True):
        raise ValueError(
            "artifact was exported with quantize=False (float output — "
            "not PNG-encodable); re-export with quantization"
        )
    if header.get("input_dtype", "float32") not in (
            "float32", "uint8", "uint16", "int16"):
        raise ValueError(
            f"unsupported artifact input_dtype "
            f"{header.get('input_dtype')!r}")


def _enhance_bytes_artifact(state: _State, body: bytes,
                            suffix: str) -> bytes:
    """Decode -> AOT artifact program -> PNG bytes.

    Artifact mode serves ONE exported program: the input must decode to
    the artifact's exact [H, W] spec (fixed-modality PACS deployments)
    — mismatches are a 400 with the expected shape, never a silent
    resize. Ingest follows the SAME contract as the jit server: raw
    integer pixels ship to the device and normalize in-program (uint8/
    uint16 artifacts; int16 HU feeds window_hu chains), honoring the
    config's io.channels policy."""
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from mies_tpu.io.image import load_image

    hdr = state.artifact_header
    want = tuple(hdr["input_shape"])
    want_dtype = hdr.get("input_dtype", "float32")
    channels = state.cfg.io_dict().get("channels")
    with tempfile.NamedTemporaryFile(suffix=suffix or ".png") as f:
        f.write(body)
        f.flush()
        raw = load_image(f.name, dtype="raw", channels=channels)
    if want_dtype == str(raw.dtype):
        img = raw  # in-program ingest (the exported chain normalizes)
    elif want_dtype == "float32":
        if raw.dtype == np.uint8:
            img = raw.astype(np.float32) / 255.0
        elif raw.dtype == np.uint16:
            img = raw.astype(np.float32) / 65535.0
        else:
            raise ValueError(
                f"int16 HU input needs an int16-spec artifact "
                f"(re-export with input_dtype='int16'); this artifact "
                f"takes float32"
            )
    else:
        raise ValueError(
            f"artifact expects {want_dtype} input, this file decodes "
            f"to {raw.dtype} — re-export for this modality"
        )
    if img.shape != want:
        raise ValueError(
            f"artifact expects shape {list(want)}, got {list(img.shape)} "
            f"(artifact mode serves one fixed program; re-export for "
            f"this modality's shape)"
        )
    out = np.asarray(state.artifact_fn(jnp.asarray(img)))
    with state.lock:
        state.shapes.add(out.shape[-2:])
    buf = io.BytesIO()
    Image.fromarray(out).save(buf, format="PNG")
    return buf.getvalue()


def _enhance_bytes(state: _State, body: bytes, suffix: str,
                   metric_names: list[str]) -> tuple[bytes, dict | None]:
    """Decode -> compiled chain -> PNG bytes (+ optional metrics)."""
    from PIL import Image

    from mies_tpu.pipeline.runner import enhance_image

    with tempfile.NamedTemporaryFile(suffix=suffix or ".png") as f:
        f.write(body)
        f.flush()
        out = enhance_image(f.name, state.cfg)
        metrics = None
        if metric_names:
            from mies_tpu.eval.metrics import evaluate
            from mies_tpu.eval.report import reference_u8

            ref = reference_u8(f.name, state.cfg)
            if ref.shape != out.shape:
                raise ValueError(
                    f"metrics need a shape-preserving chain (input "
                    f"{ref.shape} vs output {out.shape})"
                )
            if out.ndim == 3:  # per-channel: mean over C
                m = [evaluate(ref[c], out[c], tuple(metric_names))
                     for c in range(out.shape[0])]
                metrics = {
                    k: float(np.mean([mi[k] for mi in m])) for k in m[0]
                }
            else:
                metrics = evaluate(ref, out, tuple(metric_names))
    with state.lock:
        state.shapes.add(out.shape[-2:])
    buf = io.BytesIO()
    if out.ndim == 3:  # [C, H, W] per-channel -> interleaved RGB-ish
        arr = np.moveaxis(out, 0, -1)
        arr = arr[..., :3] if arr.shape[-1] >= 3 else arr[..., 0]
    else:
        arr = out
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue(), metrics


DEFAULT_MAX_BODY_BYTES = 256 * 2**20  # largest clinical single-slice ask


def make_server(
    cfg: PipelineConfig, host: str = "127.0.0.1", port: int = 8080,
    artifact_fn=None, artifact_header: dict | None = None,
    max_body_bytes: int = DEFAULT_MAX_BODY_BYTES,
    request_timeout: float | None = 60.0,
) -> ThreadingHTTPServer:
    """Build (not start) the serving HTTPServer for ``cfg``.

    ``max_body_bytes`` caps POST bodies — an oversized request is a 413
    rejected from its Content-Length alone, BEFORE any body byte is
    read, so a hostile/buggy client cannot make the server allocate
    arbitrary host memory. ``request_timeout`` is the per-connection
    socket timeout (socketserver's handler timeout): a stalled client
    cannot pin a worker thread forever."""
    state = _State(cfg, artifact_fn, artifact_header)

    class Handler(BaseHTTPRequestHandler):
        timeout = request_timeout  # connection.settimeout in setup()

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj) -> None:
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                import jax

                self._json(200, {
                    "status": "ok",
                    "backend": jax.default_backend(),
                    "pipeline": state.cfg.name,
                    "mode": (
                        "artifact" if state.artifact_fn is not None
                        else "jit"
                    ),
                    "compiled_shapes": sorted(map(list, state.shapes)),
                })
            elif path == "/config":
                self._json(200, state.cfg.to_dict())
            else:
                self._json(404, {"error": f"no route {path!r}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/enhance":
                self._json(404, {"error": f"no route {url.path!r}"})
                return
            q = parse_qs(url.query)
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._json(400, {"error": "invalid Content-Length"})
                return
            if n <= 0:
                self._json(400, {"error": "empty body"})
                return
            if n > max_body_bytes:
                # refuse BEFORE reading: the body never gets allocated.
                # The unread body makes the connection unusable for
                # keep-alive, so close it.
                self.close_connection = True
                self._json(413, {
                    "error": f"body of {n} bytes exceeds the "
                             f"{max_body_bytes}-byte limit (configure "
                             f"with --max-body-mb)"
                })
                return
            body = self.rfile.read(n)
            fname = q.get("filename", [""])[0]
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            suffix = (
                Path(fname).suffix.lower()
                or _SUFFIX_BY_TYPE.get(ctype.strip().lower(), "")
            )
            metric_names = [
                m for ms in q.get("metrics", []) for m in ms.split(",") if m
            ]
            try:
                if state.artifact_fn is not None:
                    if metric_names:
                        raise ValueError(
                            "metrics are unavailable in artifact mode "
                            "(the artifact carries no reference path)"
                        )
                    png, metrics = _enhance_bytes_artifact(
                        state, body, suffix
                    ), None
                else:
                    png, metrics = _enhance_bytes(
                        state, body, suffix, metric_names
                    )
            except Exception as e:  # noqa: BLE001 — per-request isolation
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            if metrics is not None:
                self.send_header("X-Mies-Metrics", json.dumps(metrics))
            self.end_headers()
            self.wfile.write(png)

    return ThreadingHTTPServer((host, port), Handler)


def serve(
    config_path: str | Path | None = None,
    host: str = "127.0.0.1",
    port: int = 8080,
    warmup: tuple[int, int] | None = None,
    artifact: str | Path | None = None,
    max_body_bytes: int = DEFAULT_MAX_BODY_BYTES,
) -> None:
    """Blocking entry: load config (or a .mies artifact), optional warm
    compile, serve. Artifact mode needs NO warm-up: the program is AOT."""
    from mies_tpu.pipeline.config import load_config
    from mies_tpu.pipeline.compiler import compile_pipeline
    from mies_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    if artifact is not None:
        from mies_tpu.pipeline.config import from_dict
        from mies_tpu.pipeline.export import load_exported

        fn, header = load_exported(artifact)
        validate_servable_artifact(header)
        cfg = from_dict(header["config"])
        srv = make_server(cfg, host, port,
                          artifact_fn=fn, artifact_header=header,
                          max_body_bytes=max_body_bytes)
        announce = {
            "serving": f"http://{host}:{srv.server_address[1]}",
            "pipeline": cfg.name,
            "mode": "artifact",
            "input_shape": header["input_shape"],
            "input_dtype": header.get("input_dtype", "float32"),
        }
        return _run_server(srv, announce)
    if config_path is None:
        raise ValueError("serve needs a config path or an artifact")
    cfg = load_config(config_path)
    if warmup is not None:
        import jax.numpy as jnp

        h, w = warmup
        # requests ingest RAW integer pixels (enhance_image ships
        # dtype='raw': uint8 PNGs, uint16 16-bit, int16 DICOM) — warm
        # the uint8 signature, the overwhelmingly common one
        np.asarray(compile_pipeline(cfg)(
            jnp.asarray(np.zeros((h, w), np.uint8))
        ))
    srv = make_server(cfg, host, port, max_body_bytes=max_body_bytes)
    return _run_server(srv, {
        "serving": f"http://{host}:{srv.server_address[1]}",
        "pipeline": cfg.name,
    })


def _run_server(srv: ThreadingHTTPServer, announce: dict) -> None:
    print(json.dumps(announce), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
