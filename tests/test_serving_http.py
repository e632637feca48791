"""HTTP serving frontend: dynamic batching, endpoints, error paths.

Drives a real ThreadingHTTPServer on an ephemeral port with a tiny model on
the CPU mesh; concurrent requests must coalesce into one fixed-shape device
batch (the TPU-shaped property the layer exists for)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from muse_maskgit_pytorch_tpu.serving import GeneratePipeline
from muse_maskgit_pytorch_tpu.serving_http import DynamicBatcher, GenerateServer

from tests.test_serving import _maskgit


@pytest.fixture(scope="module")
def server():
    pipe = GeneratePipeline(
        _maskgit(), batch_size=4, timesteps=2, text_len=16, compile_cache=False
    )
    # warmup=True compiles the fixed-shape program before serving — the
    # first cold request otherwise eats the whole compile inside its timeout
    srv = GenerateServer(
        pipe, port=0, max_wait_ms=150.0, request_timeout_s=300.0, warmup=True
    )
    srv.start()
    yield srv
    srv.stop()


def _post(port, payload, path="/generate"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return r.status, json.loads(r.read())


def _decode_png(b64):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))


def test_generate_endpoint(server):
    status, out = _post(server.port, {"prompts": ["a cat", "a dog"]})
    assert status == 200
    assert len(out["images"]) == 2
    img = _decode_png(out["images"][0])
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8


def test_healthz_and_stats(server):
    status, health = _get(server.port, "/healthz")
    assert status == 200 and health["ok"] and health["batch_size"] == 4
    _post(server.port, {"prompts": "one string is accepted"})
    status, stats = _get(server.port, "/stats")
    assert status == 200
    assert stats["images"] >= 1 and stats["batches"] >= 1
    assert "pipeline" in stats


def test_concurrent_requests_coalesce(server):
    """The defining property: N concurrent 1-prompt requests share device
    batches instead of each paying a full fixed-shape generate."""
    before = dict(server.batcher.stats)
    results = [None] * 4
    errors = []

    def one(i):
        try:
            results[i] = _post(server.port, {"prompts": [f"prompt {i}"]})
        except Exception as e:  # pragma: no cover - surfaced via errors
            errors.append(e)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    assert all(r is not None and r[0] == 200 for r in results)
    delta_images = server.batcher.stats["images"] - before["images"]
    delta_batches = server.batcher.stats["batches"] - before["batches"]
    assert delta_images == 4
    # 4 requests, batch_size 4, 150 ms window: strictly fewer batches than
    # requests proves coalescing (usually 1, at most 3 under scheduler noise)
    assert delta_batches < 4
    assert server.batcher.stats["coalesced_batches"] >= 1


def test_edit_endpoint(server):
    """POST /edit: b64 PNG sources + grayscale masks -> edited b64 PNGs,
    batched through the same worker; bad payloads get 400."""
    from PIL import Image

    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    mask = np.zeros((16, 16), np.uint8)
    mask[:8, :] = 255  # regenerate the top half

    def b64_of(arr, mode):
        import base64 as b64mod
        import io as iomod

        buf = iomod.BytesIO()
        Image.fromarray(arr, mode).save(buf, format="PNG")
        return b64mod.b64encode(buf.getvalue()).decode()

    payload = {
        "prompts": ["a cat", "a dog"],
        "images": [b64_of(src, "RGB")] * 2,
        "masks": [b64_of(mask, "L")] * 2,
    }
    status, out = _post(server.port, payload, path="/edit")
    assert status == 200
    imgs = [_decode_png(b) for b in out["images"]]
    assert all(i.shape == (16, 16, 3) and i.dtype == np.uint8 for i in imgs)

    status, out = _post(
        server.port, {"prompts": ["x"], "images": [], "masks": []}, path="/edit"
    )
    assert status == 400


def test_bad_requests(server):
    status, out = _post(server.port, {"prompts": []})
    assert status == 400
    status, out = _post(server.port, {"nope": 1})
    assert status == 400
    status, out = _post(server.port, {"prompts": ["x"]}, path="/other")
    assert status == 404
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(f"http://127.0.0.1:{server.port}/missing", timeout=10)


def test_batcher_propagates_worker_errors():
    class Boom:
        batch_size = 2
        return_pil = False

        def __call__(self, prompts):
            raise RuntimeError("device on fire")

    b = DynamicBatcher(Boom(), max_wait_ms=10.0)
    b.start()
    try:
        (p,) = b.submit(["x"])
        assert p.event.wait(timeout=10)
        assert isinstance(p.error, RuntimeError)
    finally:
        b.stop()


def test_submit_length_mismatch_errors():
    """zip() would silently truncate a cond_scales/prompts mismatch —
    programmatic callers must get a loud error, not dropped requests."""
    b = DynamicBatcher(object(), max_wait_ms=1.0)
    # ValueError (not assert): request validation must survive python -O
    with pytest.raises(ValueError, match="cond_scales"):
        b.submit(["a", "b", "c"], cond_scales=[2.0])
    with pytest.raises(ValueError, match="prompts but"):
        b.submit_edit(["a", "b"], sources=[0], masks=[0, 1])
    assert b._queues["generate"].empty() and b._queues["edit"].empty()


def test_edit_wrong_size_rejected_before_batching(server):
    """A wrong-size edit payload must 400 at the handler, NOT enter the
    batch and poison coalesced companion requests with a 500."""
    from PIL import Image

    def b64_of(arr, mode):
        buf = io.BytesIO()
        Image.fromarray(arr, mode).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    rng = np.random.default_rng(9)
    bad = {
        "prompts": ["x"],
        "images": [b64_of(rng.integers(0, 256, (20, 20, 3), dtype=np.uint8), "RGB")],
        "masks": [b64_of(np.zeros((20, 20), np.uint8), "L")],
    }
    good_src = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    good_mask = np.zeros((16, 16), np.uint8)
    good_mask[:8] = 255
    good = {
        "prompts": ["y"],
        "images": [b64_of(good_src, "RGB")],
        "masks": [b64_of(good_mask, "L")],
    }

    results = {}

    def post(name, payload):
        results[name] = _post(server.port, payload, path="/edit")

    threads = [
        threading.Thread(target=post, args=("bad", bad)),
        threading.Thread(target=post, args=("good", good)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    status, out = results["bad"]
    assert status == 400 and "16x16" in out["error"]
    status, out = results["good"]
    assert status == 200 and len(out["images"]) == 1

    # mask-size mismatch is caught too
    bad_mask = dict(good)
    bad_mask["masks"] = [b64_of(np.zeros((20, 20), np.uint8), "L")]
    status, out = _post(server.port, bad_mask, path="/edit")
    assert status == 400 and "masks[0]" in out["error"]


def test_batcher_round_robins_between_kinds():
    """A sustained generate stream must not starve edit requests: after a
    generate batch is served, the edit queue gets first claim."""
    served = []

    class Recorder:
        batch_size = 2
        return_pil = False

        def __call__(self, prompts):
            served.append(("generate", len(prompts)))
            return np.zeros((len(prompts), 2, 2, 3), np.uint8)

        def edit(self, images, masks, prompts):
            served.append(("edit", len(prompts)))
            return np.zeros((len(prompts), 2, 2, 3), np.uint8)

    b = DynamicBatcher(Recorder(), max_wait_ms=10.0)
    # enqueue BEFORE starting the worker: plenty of generates + one edit
    gen = b.submit([f"g{i}" for i in range(6)])
    edit = b.submit_edit(["e0"], [np.zeros((2, 2, 3))], [np.ones((2, 2), bool)])
    b.start()
    try:
        assert edit[0].event.wait(timeout=10)
        for p in gen:
            assert p.event.wait(timeout=10)
    finally:
        b.stop()
    kinds = [k for k, _ in served]
    # the edit batch must run before the LAST generate batch (round-robin),
    # i.e. it did not wait out the whole generate backlog
    assert "edit" in kinds[:-1]


def test_per_request_guidance_token_exact_vs_direct():
    """Requests with DIFFERENT cond_scale coalesce into ONE device batch and
    each still gets its own guidance: the batcher's output must equal a
    direct pipeline call with the same per-row scale vector (same seed)."""
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16,
        compile_cache=False, seed=21,
    )
    batcher = DynamicBatcher(pipe, max_wait_ms=200.0)
    batcher.start()
    try:
        pendings = batcher.submit(["a cat", "a dog"], cond_scales=[2.0, 6.0])
        for p in pendings:
            assert p.event.wait(timeout=300)
            assert p.error is None
    finally:
        batcher.stop()
    assert batcher.stats["coalesced_batches"] >= 1

    direct = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16,
        return_pil=False, compile_cache=False, seed=21,
    )(["a cat", "a dog"], cond_scale=[2.0, 6.0])
    np.testing.assert_array_equal(np.asarray(pendings[0].image), direct[0])
    np.testing.assert_array_equal(np.asarray(pendings[1].image), direct[1])


def test_per_request_negative_prompts_token_exact_vs_direct():
    """Requests with DIFFERENT negative prompts (some with none at all) plus
    different cond_scales coalesce into ONE device batch and each row still
    gets its own negative: the batcher's output must equal a direct pipeline
    call with the same per-row vectors (same seed). No-neg rows ride all-zero
    neg embeddings — the standard CFG null — inside the same compiled
    program."""
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16,
        compile_cache=False, seed=23,
    )
    batcher = DynamicBatcher(pipe, max_wait_ms=200.0)
    batcher.start()
    try:
        pendings = batcher.submit(
            ["a cat", "a dog"],
            cond_scales=[2.0, None],
            negative_prompts=["blurry", None],
        )
        for p in pendings:
            assert p.event.wait(timeout=300)
            assert p.error is None
    finally:
        batcher.stop()
    assert batcher.stats["coalesced_batches"] >= 1

    direct = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16,
        return_pil=False, compile_cache=False, seed=23,
    )(
        ["a cat", "a dog"],
        cond_scale=[2.0, pipe.cond_scale],
        negative_prompts=["blurry", None],
    )
    np.testing.assert_array_equal(np.asarray(pendings[0].image), direct[0])
    np.testing.assert_array_equal(np.asarray(pendings[1].image), direct[1])


def test_negative_prompt_rows_are_independent():
    """Per-row isolation inside the neg program: changing row 0's negative
    prompt must not perturb row 1's image at all (rows share one compiled
    program but no data), and a real negative prompt must actually change
    its own row's output vs no negative."""
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16,
        return_pil=False, compile_cache=False, seed=31,
    )
    a = pipe(["a cat", "a dog"], negative_prompts=["blurry", "low-res"])
    pipe2 = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16,
        return_pil=False, compile_cache=False, seed=31,
    )
    b = pipe2(["a cat", "a dog"], negative_prompts=[None, "low-res"])
    np.testing.assert_array_equal(a[1], b[1])  # row 1 untouched
    assert not np.array_equal(a[0], b[0])  # row 0's neg really applied


def test_generate_endpoint_negative_prompt(server):
    # scalar form applies to every prompt; list form is per-prompt with
    # nulls meaning "no negative for this row"
    status, out = _post(
        server.port, {"prompts": ["a cat"], "negative_prompt": "blurry"}
    )
    assert status == 200 and len(out["images"]) == 1
    status, out = _post(
        server.port,
        {
            "prompts": ["a cat", "a dog"],
            "negative_prompt": ["blurry", None],
            "cond_scale": [1.5, 6.0],
        },
    )
    assert status == 200 and len(out["images"]) == 2
    status, health = _get(server.port, "/healthz")
    assert "neg_dynamic" in health["warm_surfaces"]


def test_generate_endpoint_negative_prompt_validation(server):
    status, out = _post(
        server.port,
        {"prompts": ["a", "b"], "negative_prompt": ["only one"]},
    )
    assert status == 400 and "negative_prompt" in out["error"]
    status, out = _post(
        server.port, {"prompts": ["a"], "negative_prompt": 3}
    )
    assert status == 400
    # /edit does not take negative prompts — reject loudly, don't drop
    status, out = _post(
        server.port,
        {"prompts": ["a"], "images": [], "masks": [],
         "negative_prompt": "x"},
        path="/edit",
    )
    assert status == 400


def test_generate_endpoint_cond_scale(server):
    # scalar form applies to every prompt; list form is per-prompt
    status, out = _post(
        server.port, {"prompts": ["a cat"], "cond_scale": 6.0}
    )
    assert status == 200 and len(out["images"]) == 1
    status, out = _post(
        server.port, {"prompts": ["a cat", "a dog"], "cond_scale": [1.5, 6.0]}
    )
    assert status == 200 and len(out["images"]) == 2


def test_generate_endpoint_cond_scale_validation(server):
    status, out = _post(
        server.port, {"prompts": ["a", "b"], "cond_scale": [1.0]}
    )
    assert status == 400 and "cond_scale" in out["error"]
    status, out = _post(
        server.port, {"prompts": ["a"], "cond_scale": "high"}
    )
    assert status == 400


def test_healthz_reports_warm_surfaces(server):
    status, out = _get(server.port, "/healthz")
    assert status == 200
    assert "generate" in out["warm_surfaces"]


def test_edit_endpoint_cond_scale(server):
    size = server.pipeline.image_size
    img = np.zeros((size, size, 3), np.uint8)
    mask = np.zeros((size, size), np.uint8)
    mask[: size // 2] = 255
    from PIL import Image

    def b64(arr, mode):
        buf = io.BytesIO()
        Image.fromarray(arr, mode).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    status, out = _post(
        server.port,
        {
            "prompts": ["edit me"],
            "images": [b64(img, "RGB")],
            "masks": [b64(mask, "L")],
            "cond_scale": 5.5,
        },
        path="/edit",
    )
    assert status == 200 and len(out["images"]) == 1
