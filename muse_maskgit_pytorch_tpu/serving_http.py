"""HTTP serving frontend with dynamic batching.

`GenerateServer` turns a `GeneratePipeline` into a network service the way a
TPU wants to be fed: ONE worker thread owns the device and always submits the
pipeline's fixed `batch_size` (XLA compiles one program per shape — variable
batches would recompile), while a request-coalescing queue fills each batch
from however many concurrent HTTP requests are in flight. A lone request
waits at most `max_wait_ms` for companions before the batch is padded out
and dispatched, so latency is bounded and throughput under load approaches
the pipeline's measured img/s.

The reference has no serving story at all (its generate is a host python
loop, /root/reference/muse_maskgit_pytorch/muse_maskgit_pytorch.py:507-609);
this is the deployment layer a production text->image system needs, built on
the stdlib only (http.server) so it runs anywhere the framework does.

Endpoints:
  POST /generate   {"prompts": ["a cat", ...]}       -> {"images": [b64 PNG]}
  GET  /healthz    liveness + warmup state + batching stats
  GET  /stats      rolling service counters

Usage:
    pipe = GeneratePipeline(model, batch_size=16)
    server = GenerateServer(pipe, port=8000)
    server.start()          # returns immediately; serves until .stop()
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np


class _Pending:
    """One enqueued prompt (plus optional edit payload) and its result slot."""

    __slots__ = (
        "prompt", "source", "mask", "cond_scale", "negative_prompt",
        "event", "image", "error",
    )

    def __init__(self, prompt: str, source=None, mask=None, cond_scale=None,
                 negative_prompt=None):
        self.prompt = prompt
        self.source = source  # (H, W, 3) source image for edit requests
        self.mask = mask  # (H, W) bool edit mask for edit requests
        self.cond_scale = cond_scale  # per-request guidance (None = default)
        self.negative_prompt = negative_prompt  # per-request neg (None = default)
        self.event = threading.Event()
        self.image: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None


class DynamicBatcher:
    """Coalesces individual prompts into fixed-size device batches.

    A single worker thread drains the queue: it waits up to `max_wait_ms`
    for the batch to fill, then dispatches whatever it has (padded to the
    pipeline's batch_size with empty prompts — the compiled program shape
    never changes). All device work happens on this one thread; HTTP handler
    threads only enqueue and wait, so concurrent requests never contend for
    the TPU or trigger duplicate compilations.
    """

    def __init__(self, pipeline, max_wait_ms: float = 50.0):
        self.pipeline = pipeline
        self.max_wait = max_wait_ms / 1000.0
        # generate and edit requests run different compiled programs, so they
        # batch separately: one FIFO queue per kind, same single worker
        self._queues = {
            "generate": queue.Queue(),
            "edit": queue.Queue(),
        }
        # round-robin start offset between kinds: without it a sustained
        # stream of one kind would always win the poll and starve the other
        self._kinds = list(self._queues)
        self._rr = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats = {
            "batches": 0,
            "images": 0,
            "coalesced_batches": 0,  # batches serving >1 request
            "batch_fill_sum": 0,  # real prompts per batch, for fill-rate
        }

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    def submit(self, prompts: List[str], cond_scales=None,
               negative_prompts=None) -> List[_Pending]:
        """`cond_scales`: optional per-prompt guidance (None entries use the
        pipeline default). `negative_prompts`: optional per-prompt negative
        prompts (None entries = pipeline default / no negative). Requests
        with different scales AND different (or no) negative prompts still
        coalesce into ONE batch — the pipeline passes a per-row scale vector
        and per-row neg embeddings (zero rows = the standard CFG null)."""
        if cond_scales is None:
            cond_scales = [None] * len(prompts)
        if negative_prompts is None:
            negative_prompts = [None] * len(prompts)
        # zip would silently TRUNCATE on a length mismatch — a caller passing
        # one scale for three prompts would lose two requests with no error.
        # ValueError, not assert: request validation must survive python -O
        if not (len(cond_scales) == len(negative_prompts) == len(prompts)):
            raise ValueError(
                f"submit got {len(prompts)} prompts but {len(cond_scales)} "
                f"cond_scales / {len(negative_prompts)} negative_prompts"
            )
        pendings = [
            _Pending(p, cond_scale=s, negative_prompt=ng)
            for p, s, ng in zip(prompts, cond_scales, negative_prompts)
        ]
        for p in pendings:
            self._queues["generate"].put(p)
        return pendings

    def submit_edit(self, prompts, sources, masks, cond_scales=None) -> List[_Pending]:
        if cond_scales is None:
            cond_scales = [None] * len(prompts)
        if not (len(sources) == len(masks) == len(cond_scales) == len(prompts)):
            raise ValueError(
                f"submit_edit got {len(prompts)} prompts but {len(sources)} "
                f"sources / {len(masks)} masks / {len(cond_scales)} "
                "cond_scales (zip would silently drop the excess)"
            )
        pendings = [
            _Pending(p, source=s, mask=m, cond_scale=c)
            for p, s, m, c in zip(prompts, sources, masks, cond_scales)
        ]
        for p in pendings:
            self._queues["edit"].put(p)
        return pendings

    def _collect(self) -> Tuple[str, List[_Pending]]:
        """Block for the first request of either kind, then fill the batch
        from the SAME kind for max_wait (generate and edit batches are
        different compiled programs, so they never mix)."""
        first = kind = None
        deadline_poll = time.monotonic() + 0.1
        while first is None:
            for i in range(len(self._kinds)):
                k = self._kinds[(self._rr + i) % len(self._kinds)]
                try:
                    first = self._queues[k].get_nowait()
                    kind = k
                    # the OTHER kind polls first next round, so neither can
                    # starve under a sustained stream of one kind
                    self._rr = (self._rr + i + 1) % len(self._kinds)
                    break
                except queue.Empty:
                    continue
            if first is None:
                if time.monotonic() >= deadline_poll or self._stop.is_set():
                    return "", []
                time.sleep(0.005)
        q = self._queues[kind]
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        size = self.pipeline.batch_size
        while len(batch) < size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                # batch is going out — but never leave ready work behind
                try:
                    batch.append(q.get_nowait())
                    continue
                except queue.Empty:
                    break
            try:
                batch.append(q.get(timeout=remaining))
            except queue.Empty:
                break
        return kind, batch

    def _run(self):
        while not self._stop.is_set():
            kind, batch = self._collect()
            if not batch:
                continue
            try:
                if kind == "edit":
                    # pass cond_scale only when a request set one: all-default
                    # batches keep the static program (and duck-typed test
                    # pipelines need not accept the kwarg)
                    kw = {}
                    if any(p.cond_scale is not None for p in batch):
                        kw["cond_scale"] = [
                            (
                                p.cond_scale
                                if p.cond_scale is not None
                                else self.pipeline.cond_scale
                            )
                            for p in batch
                        ]
                    images = self.pipeline.edit(
                        np.stack([p.source for p in batch]),
                        np.stack([p.mask for p in batch]),
                        [p.prompt for p in batch],
                        **kw,
                    )
                else:
                    # per-request guidance / negative prompts: when ANY
                    # coalesced request set a custom scale the batch rides
                    # the per-row dynamic program; when any set a negative
                    # prompt it rides the neg_dynamic program (per-row neg
                    # embeds — no-neg rows get the standard null, so mixed
                    # batches stay token-exact vs solo runs). All-default
                    # batches keep the static program.
                    kw = {}
                    if any(p.cond_scale is not None for p in batch):
                        kw["cond_scale"] = [
                            (
                                p.cond_scale
                                if p.cond_scale is not None
                                else self.pipeline.cond_scale
                            )
                            for p in batch
                        ]
                    if any(p.negative_prompt is not None for p in batch):
                        kw["negative_prompts"] = [
                            p.negative_prompt for p in batch
                        ]
                    images = self.pipeline(
                        [p.prompt for p in batch], **kw
                    )  # pipeline pads to batch_size itself
                if self.pipeline.return_pil:
                    images = [np.asarray(im) for im in images]
                for p, im in zip(batch, images):
                    p.image = np.asarray(im)
            except BaseException as e:  # propagate to every waiter
                for p in batch:
                    p.error = e
            finally:
                self.stats["batches"] += 1
                self.stats["images"] += len(batch)
                self.stats["batch_fill_sum"] += len(batch)
                if len(batch) > 1:
                    self.stats["coalesced_batches"] += 1
                for p in batch:
                    p.event.set()


def _png_b64(image: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(image).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _b64_image(b64: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
    return np.asarray(img, np.uint8)


def _b64_mask(b64: str) -> np.ndarray:
    from PIL import Image

    m = Image.open(io.BytesIO(base64.b64decode(b64))).convert("L")
    return np.asarray(m) > 127


class GenerateServer:
    """Threaded HTTP server over a `GeneratePipeline` (see module docstring)."""

    def __init__(
        self,
        pipeline,
        host: str = "127.0.0.1",
        port: int = 8000,
        max_wait_ms: float = 50.0,
        request_timeout_s: float = 600.0,
        warmup=False,
    ):
        """`warmup`: False (no boot compile), True (the "generate" surface),
        "all", or an iterable of surfaces ({"generate", "dynamic_scale",
        "neg_dynamic", "edit", "edit_dynamic_scale"}) — every surface the
        deployment enables should be warmed at boot, or its first live
        request eats the cold compile (GeneratePipeline.warmup)."""
        self.pipeline = pipeline
        self.batcher = DynamicBatcher(pipeline, max_wait_ms=max_wait_ms)
        self.request_timeout_s = request_timeout_s
        self._warm = False
        self._warmup_on_start = warmup
        self._httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self._serve_thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self):
        if self._warmup_on_start:
            self.pipeline.warmup(
                ("generate",)
                if self._warmup_on_start is True
                else self._warmup_on_start
            )
            self._warm = True
        self.batcher.start()
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._serve_thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self.batcher.stop()
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=10)

    # -- request handling -------------------------------------------------

    def _await(self, pendings: List[_Pending]) -> List[str]:
        images = []
        for p in pendings:
            if not p.event.wait(timeout=self.request_timeout_s):
                raise TimeoutError(
                    f"generation timed out after {self.request_timeout_s}s "
                    "(cold compile in progress? warm the server first)"
                )
            if p.error is not None:
                raise p.error
            images.append(_png_b64(p.image))
        self._warm = True
        return images

    def _generate(self, prompts: List[str], cond_scales=None,
                  negative_prompts=None) -> List[str]:
        return self._await(
            self.batcher.submit(prompts, cond_scales, negative_prompts)
        )

    def _edit(self, prompts: List[str], sources, masks, cond_scales=None) -> List[str]:
        return self._await(
            self.batcher.submit_edit(prompts, sources, masks, cond_scales)
        )

    def _handler_class(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            # request handling must never die silently on a broken client
            def log_message(self, fmt, *args):  # quiet by default
                pass

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
                        {
                            "ok": True,
                            "warm": server._warm,
                            "warm_surfaces": sorted(
                                getattr(server.pipeline, "warm_surfaces", ())
                            ),
                            "batch_size": server.pipeline.batch_size,
                            "image_size": server.pipeline.image_size,
                        },
                    )
                elif self.path == "/stats":
                    from muse_maskgit_pytorch_tpu.serving import (
                        backend_compile_count,
                    )

                    stats = dict(server.batcher.stats)
                    if stats["batches"]:
                        stats["avg_batch_fill"] = (
                            stats["batch_fill_sum"] / stats["batches"]
                        )
                    stats["pipeline"] = dict(server.pipeline.stats)
                    stats["backend_compiles"] = backend_compile_count()
                    self._reply(200, stats)
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path not in ("/generate", "/edit"):
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    prompts = req.get("prompts")
                    if isinstance(prompts, str):
                        prompts = [prompts]
                    if not prompts or not all(isinstance(p, str) for p in prompts):
                        self._reply(
                            400, {"error": 'body must be {"prompts": ["...", ...]}'}
                        )
                        return
                    # optional per-request guidance (both endpoints): a
                    # number (applies to every prompt in this request) or
                    # one number per prompt; coalesces with other requests'
                    # scales into one per-row batch
                    scales = req.get("cond_scale")
                    if scales is not None:
                        if isinstance(scales, (int, float)):
                            scales = [float(scales)] * len(prompts)
                        if not (
                            isinstance(scales, list)
                            and len(scales) == len(prompts)
                            and all(isinstance(s, (int, float)) for s in scales)
                        ):
                            self._reply(
                                400,
                                {
                                    "error": "cond_scale must be a number "
                                    "or one number per prompt"
                                },
                            )
                            return
                        scales = [float(s) for s in scales]
                    # optional per-request negative prompting (/generate): a
                    # string (applies to every prompt in this request) or one
                    # entry per prompt where null/None means "no negative for
                    # this row"; mixed neg/no-neg requests still coalesce —
                    # no-neg rows ride the standard CFG null (zero neg embeds)
                    negs = req.get("negative_prompt")
                    if negs is not None:
                        if isinstance(negs, str):
                            negs = [negs] * len(prompts)
                        if not (
                            isinstance(negs, list)
                            and len(negs) == len(prompts)
                            and all(
                                n is None or isinstance(n, str) for n in negs
                            )
                        ):
                            self._reply(
                                400,
                                {
                                    "error": "negative_prompt must be a string "
                                    "or one entry (string or null) per prompt"
                                },
                            )
                            return
                        if all(n is None for n in negs):
                            negs = None
                    if self.path == "/edit":
                        if negs is not None:
                            self._reply(
                                400,
                                {
                                    "error": "negative_prompt is not supported "
                                    "on /edit (generate only)"
                                },
                            )
                            return
                        srcs = req.get("images") or []
                        masks = req.get("masks") or []
                        if not (len(srcs) == len(masks) == len(prompts)):
                            self._reply(
                                400,
                                {
                                    "error": "edit needs equal-length prompts, "
                                    'images (b64 PNG) and masks (b64 grayscale '
                                    "PNG, >127 = regenerate)"
                                },
                            )
                            return
                        sources = [_b64_image(s) for s in srcs]
                        edit_masks = [_b64_mask(m) for m in masks]
                        # validate BEFORE enqueuing: a wrong-size image would
                        # otherwise fail inside the worker's np.stack and
                        # poison every coalesced companion request with a 500
                        size = server.pipeline.image_size
                        for i, (s, m) in enumerate(zip(sources, edit_masks)):
                            if s.shape != (size, size, 3):
                                self._reply(
                                    400,
                                    {
                                        "error": f"images[{i}] is "
                                        f"{s.shape[1]}x{s.shape[0]}, the "
                                        f"pipeline serves {size}x{size}"
                                    },
                                )
                                return
                            if m.shape != (size, size):
                                self._reply(
                                    400,
                                    {
                                        "error": f"masks[{i}] is "
                                        f"{m.shape[1]}x{m.shape[0]}, expected "
                                        f"{size}x{size}"
                                    },
                                )
                                return
                        images = server._edit(prompts, sources, edit_masks, scales)
                    else:
                        images = server._generate(prompts, scales, negs)
                    self._reply(200, {"images": images})
                except TimeoutError as e:
                    self._reply(503, {"error": str(e)})
                except BrokenPipeError:
                    pass  # client went away mid-reply
                except Exception as e:
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        return Handler
