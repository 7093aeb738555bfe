"""TPU-native model serving — the deploy-tools counterpart of the reference's
torchserve/mmdeploy stack (segmentation/tools/torchserve/mmseg2torchserve.py:16-76
packages config+checkpoint into an archive; mmseg_handler.py decodes request bytes
and runs inference; test_torchserve.py:36-56 POSTs an image to
``/predictions/<name>`` and compares against direct inference; pytorch2onnx's
interchange role is covered by export.export_stablehlo).

TPU-first design, not a translation:

* The archive is the ``publish_fused`` artifact (BN-fused msgpack + meta.json,
  optionally + StableHLO) — no .mar, no handler file: the model config lives in
  the registry and the server is generic over it.
* Requests are MICRO-BATCHED onto one compiled call: XLA needs static shapes,
  so the server compiles ONE ``(max_batch, S, S, 3)`` program (lane-packed
  executor for the m/a families — the measured-fastest serving path) and a
  single device thread pads each queue tick to that shape. One device thread
  total: the TPU is single-client, and concurrency belongs in the queue, not
  in competing device streams.
* Cold-start uses the persistent XLA compile cache (RECNEXT_COMPILE_CACHE /
  --compile-cache): measured 4m24s -> 6.8s warm restart (PERF.md).

HTTP surface (stdlib http.server; torchserve-compatible paths so the
reference's client workflow maps 1:1):

    GET  /ping                 -> {"status": "Healthy"}
    GET  /models/<name>        -> model meta + serving stats
    POST /predictions/<name>   -> body = JPEG/PNG bytes -> top-k JSON

CLI:
    python -m recnext_tpu.serve --archive published/ --model recnext_m1 --port 8080
    python -m recnext_tpu.serve --check http://127.0.0.1:8080 --model recnext_m1 \
        --image cat.jpg --archive published/   # server-vs-direct parity check
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recnext_tpu.data.transforms import EvalTransform
from recnext_tpu.models.registry import create_model, get_config


class ServingModel:
    """A published archive compiled into one fixed-shape serving function.

    ``predict(batch)`` pads to ``max_batch`` (the compiled shape), runs one
    jitted call, and returns softmax probabilities for the real rows only.
    """

    def __init__(self, archive: str, model_name: str, *,
                 max_batch: int = 8, input_size: int = 224,
                 dtype=jnp.bfloat16, packed: Optional[bool] = None,
                 cfg_overrides: Optional[Dict[str, Any]] = None):
        from flax import serialization

        self.model_name = model_name
        self.max_batch = int(max_batch)
        self.input_size = int(input_size)
        self.cfg = get_config(model_name, **(cfg_overrides or {}))
        self.transform = EvalTransform(size=self.input_size)

        model = create_model(model_name, fused=True, dtype=dtype,
                             **(cfg_overrides or {}))
        x0 = jnp.zeros((1, self.input_size, self.input_size, 3), dtype)
        template = model.init(jax.random.PRNGKey(0), x0)
        from recnext_tpu.export import resolve_published_path

        # shared resolution incl. the sha-stamped artifact fallback
        p = resolve_published_path(model_name, archive)
        self.variables = serialization.from_bytes(template, p.read_bytes())

        if packed is None:
            packed = self.cfg.family in ("m", "a")
        self.packed = bool(packed and self.cfg.family in ("m", "a"))
        cfg = self.cfg
        if self.packed:
            from recnext_tpu.models.packed_infer import packed_apply

            def fwd(v, x):
                return jax.nn.softmax(
                    packed_apply(v, cfg, x).astype(jnp.float32), axis=-1)
        else:
            def fwd(v, x):
                return jax.nn.softmax(
                    model.apply(v, x, training=False).astype(jnp.float32),
                    axis=-1)

        self._fn = jax.jit(fwd)
        self._dtype = dtype
        self.requests_served = 0
        self.batches_run = 0

    def warmup(self) -> None:
        z = jnp.zeros((self.max_batch, self.input_size, self.input_size, 3),
                      self._dtype)
        jax.block_until_ready(self._fn(self.variables, z))

    def preprocess(self, data: bytes) -> np.ndarray:
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        return self.transform(None, img)

    def predict(self, batch: np.ndarray) -> np.ndarray:
        n = batch.shape[0]
        assert n <= self.max_batch, f"batch {n} > compiled max_batch {self.max_batch}"
        if n < self.max_batch:
            pad = np.zeros((self.max_batch - n,) + batch.shape[1:], batch.dtype)
            batch = np.concatenate([batch, pad], axis=0)
        probs = self._fn(self.variables, jnp.asarray(batch, self._dtype))
        self.batches_run += 1
        self.requests_served += n
        return np.asarray(probs)[:n]


class MicroBatcher:
    """Queue requests; ONE device thread coalesces them into compiled-shape
    batches. ``window_ms`` is how long the worker waits to fill a batch after
    the first request arrives (latency/throughput knob)."""

    def __init__(self, model: ServingModel, window_ms: float = 5.0):
        self.model = model
        self.window_s = window_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, arr: np.ndarray, timeout: float = 60.0) -> np.ndarray:
        done = threading.Event()
        slot: Dict[str, Any] = {}
        self._q.put((arr, slot, done))
        if not done.wait(timeout):
            raise TimeoutError("inference timed out")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["result"]

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    def _worker(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.monotonic() + self.window_s
            while len(items) < self.model.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                batch = np.stack([arr for arr, _, _ in items])
                probs = self.model.predict(batch)
                for (_, slot, done), row in zip(items, probs):
                    slot["result"] = row
                    done.set()
            except Exception as e:  # surface to every waiting request
                for _, slot, done in items:
                    slot["error"] = repr(e)
                    done.set()


def topk_json(probs: np.ndarray, k: int = 5) -> Dict[str, Any]:
    idx = np.argsort(probs)[::-1][:k]
    return {"topk": [{"class_id": int(i), "score": float(probs[i])} for i in idx]}


def make_server(model: ServingModel, host: str = "127.0.0.1", port: int = 8080,
                *, window_ms: float = 5.0, topk: int = 5) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``.serve_forever()`` to run.
    The batcher is attached as ``server.batcher`` (close it on shutdown)."""
    batcher = MicroBatcher(model, window_ms=window_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats live in /models/<name>
            pass

        def _json(self, code: int, obj: Dict[str, Any]) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/ping":
                self._json(200, {"status": "Healthy"})
            elif self.path == f"/models/{model.model_name}":
                self._json(200, {
                    "model": model.model_name, "family": model.cfg.family,
                    "input_size": model.input_size, "max_batch": model.max_batch,
                    "packed": model.packed,
                    "num_classes": model.cfg.num_classes,
                    "requests_served": model.requests_served,
                    "batches_run": model.batches_run,
                })
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != f"/predictions/{model.model_name}":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            try:
                arr = model.preprocess(data)
            except Exception as e:
                self._json(400, {"error": f"bad image: {e!r}"})
                return
            try:
                probs = batcher.submit(arr)
            except Exception as e:
                self._json(500, {"error": repr(e)})
                return
            self._json(200, topk_json(probs, k=topk))

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.batcher = batcher  # type: ignore[attr-defined]
    return srv


def check_server(addr: str, model: ServingModel, image_path: str,
                 atol: float = 1e-3) -> bool:
    """Server-vs-direct parity (test_torchserve.py counterpart): POST the image,
    compare the returned top-k against a direct predict() on the same bytes."""
    import urllib.request

    data = Path(image_path).read_bytes()
    req = urllib.request.Request(
        f"{addr}/predictions/{model.model_name}", data=data, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        got = json.loads(r.read())
    direct = topk_json(model.predict(model.preprocess(data)[None])[0])
    ok = (got["topk"][0]["class_id"] == direct["topk"][0]["class_id"] and
          abs(got["topk"][0]["score"] - direct["topk"][0]["score"]) < atol)
    print(f"server  {got['topk'][:2]}")
    print(f"direct  {direct['topk'][:2]}")
    print("PARITY OK" if ok else "PARITY MISMATCH")
    return ok


def main(argv=None):
    import argparse
    import os

    # the site hook pins jax_platforms at interpreter start; honor an explicit
    # JAX_PLATFORMS from the command line (same pattern as validate.py)
    from recnext_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    p = argparse.ArgumentParser("recnext_tpu model server")
    p.add_argument("--archive", required=True,
                   help="published archive dir (export.publish_fused output)")
    p.add_argument("--model", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--window-ms", type=float, default=5.0)
    p.add_argument("--no-packed", action="store_true")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--compile-cache", default="",
                   help="persistent XLA compile cache dir (or env "
                        "RECNEXT_COMPILE_CACHE)")
    p.add_argument("--check", default="",
                   help="http://host:port — run the server-vs-direct parity "
                        "check against a running server instead of serving")
    p.add_argument("--image", default="", help="image for --check")
    args = p.parse_args(argv)

    from recnext_tpu.utils.cache import enable_compile_cache
    from recnext_tpu.utils.watchdog import require_devices

    enable_compile_cache(args.compile_cache or None)

    if args.check:
        # The TPU is single-client: the server process already holds the chip,
        # so the checker's direct model must NOT touch it or it blocks until
        # the server exits. Pin CPU BEFORE any device init (no require_devices
        # here — that would probe the held chip), run the direct reference in
        # f32, and compare with a cross-precision tolerance against the
        # server's bf16 output.
        atol = 1e-3
        if not os.environ.get("JAX_PLATFORMS"):
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
            atol = 5e-2
        ref = ServingModel(args.archive, args.model, max_batch=args.max_batch,
                           input_size=args.input_size, dtype=jnp.float32,
                           packed=False if args.no_packed else None)
        ok = check_server(args.check, ref, args.image, atol=atol)
        raise SystemExit(0 if ok else 1)

    # fail with rc=17 + a JSON error line instead of hanging forever when the
    # tunnel is down (same contract as bench.py; utils/watchdog.py)
    require_devices(metric=f"serve_{args.model}_device_init")

    model = ServingModel(args.archive, args.model, max_batch=args.max_batch,
                         input_size=args.input_size,
                         packed=False if args.no_packed else None)

    print(f"compiling {args.model} (max_batch={args.max_batch}, "
          f"packed={model.packed}) ...", flush=True)
    model.warmup()
    srv = make_server(model, args.host, args.port,
                      window_ms=args.window_ms, topk=args.topk)
    print(f"serving {args.model} on http://{args.host}:{srv.server_address[1]}",
          flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.batcher.close()


if __name__ == "__main__":
    main()
