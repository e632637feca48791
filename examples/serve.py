"""Run the HTTP generation server over trained checkpoints.

    python examples/serve.py --base-checkpoint base.ckpt \
        [--superres-checkpoint sr.ckpt] --port 8000 --batch-size 16

Endpoints (see muse_maskgit_pytorch_tpu/serving_http.py):
    POST /generate  {"prompts": ["a cat", ...]}              -> b64 PNGs
    POST /edit      {"prompts", "images", "masks"}  (b64)    -> b64 PNGs
    GET  /healthz, GET /stats
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo-root run without install

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base-checkpoint", required=True)
    p.add_argument("--superres-checkpoint", default=None)
    p.add_argument("--vae-dim", type=int, default=256)
    p.add_argument("--codebook-size", type=int, default=65536)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--t5-name", default="google/t5-v1_1-base")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--timesteps", type=int, default=18)
    p.add_argument("--cond-scale", type=float, default=3.0)
    p.add_argument("--text-len", type=int, default=64)
    p.add_argument("--max-wait-ms", type=float, default=50.0)
    p.add_argument(
        "--rerank", type=int, default=1,
        help="best-of-K re-ranking per prompt (K candidates per request)",
    )
    p.add_argument(
        "--no-warmup", action="store_true",
        help="skip the boot-time compile (first request pays it instead)",
    )
    p.add_argument(
        "--warmup-surfaces", default="generate",
        help="comma list of serving programs to compile at boot: any of "
        "generate,dynamic_scale,edit,edit_dynamic_scale — or 'all'. Every "
        "surface the deployment enables should be here, or its FIRST live "
        "request eats the cold compile (GeneratePipeline.warmup)",
    )
    p.add_argument(
        "--image-size", default=None, metavar="N|HxW",
        help="serve a non-native output resolution — an int, or HxW for a "
        "non-square aspect ratio (base-stage size; a cascade scales it by "
        "its trained ratio). One compiled shape per server, as always.",
    )
    args = p.parse_args()

    from examples.sample import _size, load_maskgit
    from muse_maskgit_pytorch_tpu import GeneratePipeline, GenerateServer, Muse

    base = load_maskgit(
        args.base_checkpoint, args.vae_dim, args.codebook_size, 256, args.dim,
        args.depth, args.t5_name,
    )
    if args.superres_checkpoint:
        sr = load_maskgit(
            args.superres_checkpoint, args.vae_dim, args.codebook_size, 512,
            args.dim, args.depth, args.t5_name, cond_image_size=256,
        )
        model = Muse(base, sr)
    else:
        model = base

    pipe = GeneratePipeline(
        model, batch_size=args.batch_size, timesteps=args.timesteps,
        cond_scale=args.cond_scale, text_len=args.text_len,
        rerank_candidates=args.rerank,
        image_size=_size(args.image_size) if args.image_size else None,
    )
    surfaces = (
        "all"
        if args.warmup_surfaces.strip() == "all"
        else tuple(s.strip() for s in args.warmup_surfaces.split(",") if s.strip())
    )
    server = GenerateServer(
        pipe, host=args.host, port=args.port, max_wait_ms=args.max_wait_ms,
        warmup=False if args.no_warmup else surfaces,
    )
    print(f"warming up and serving on http://{args.host}:{args.port} ...", flush=True)
    server.start()
    print("ready", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
