"""Compute (streaming) FID between two image sets, or between an image set
and a saved reference-statistics file.

The reference repo has no evaluation story at all (SURVEY.md §5: visual
inspection of recon grids only); this drives the framework's streaming-FID
subsystem (`utils/eval.py`: mergeable f64 feature moments + eigh-based
Fréchet distance) from the command line.

Usage:
  # folder vs folder
  python examples/compute_fid.py --real /path/real --fake /path/fake

  # precompute + reuse reference statistics (the expensive half):
  python examples/compute_fid.py --real /path/real --save-stats coco.npz
  python examples/compute_fid.py --stats coco.npz --fake /path/fake

Pretrained-weights caveat (docs/API_PARITY.md): with no egress this uses a
random-init VGG16 extractor unless --vgg-weights points at a converted
checkpoint — still a valid (self-consistent) distribution distance, but not
comparable to published FID numbers.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse

import numpy as np


def _batches(folder, image_size, batch_size):
    from muse_maskgit_pytorch_tpu.training.data import DataLoader, ImageDataset

    ds = ImageDataset(folder, image_size, random_flip=False)  # deterministic eval
    if len(ds) == 0:
        raise SystemExit(f"no images found under {folder}")
    # fixed-shape batches so the jitted extractor compiles once: drop the
    # ragged tail (standard FID practice is a fixed sample count anyway)
    loader = DataLoader(ds, batch_size, shuffle=False)
    for batch in loader:
        if batch.shape[0] == batch_size:
            yield batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real", default=None, help="folder of real images")
    p.add_argument("--fake", default=None, help="folder of generated images")
    p.add_argument("--stats", default=None, help="saved real-set stats (.npz)")
    p.add_argument("--save-stats", default=None, help="write real-set stats here")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--vgg-weights", default=None,
                   help="converted VGG16 checkpoint (utils/convert.py)")
    args = p.parse_args()

    from muse_maskgit_pytorch_tpu.utils.eval import (
        FeatureStats,
        compute_feature_stats,
        fid_score,
        make_vgg_extractor,
    )

    vgg = None
    if args.vgg_weights:
        from flax import nnx

        from muse_maskgit_pytorch_tpu.models.vgg import VGG16
        from muse_maskgit_pytorch_tpu.utils.checkpoint import load_module

        vgg = VGG16(rngs=nnx.Rngs(0))
        load_module(vgg, args.vgg_weights)
    extract = make_vgg_extractor(vgg=vgg)

    if args.stats:
        real_stats = FeatureStats.load(args.stats)
        print(f"loaded real stats: n={real_stats.n}, dim={real_stats.dim}")
    else:
        if not args.real:
            raise SystemExit("need --real or --stats")
        real_stats = compute_feature_stats(
            _batches(args.real, args.image_size, args.batch_size), extract
        )
        print(f"real set: n={real_stats.n}")

    if args.save_stats:
        path = real_stats.save(args.save_stats)
        print(f"saved real stats -> {path}")
        if not args.fake:
            return

    if not args.fake:
        raise SystemExit("need --fake to compute a score")
    fake_stats = compute_feature_stats(
        _batches(args.fake, args.image_size, args.batch_size), extract
    )
    print(f"fake set: n={fake_stats.n}")
    print(f"FID: {fid_score(real_stats, fake_stats):.4f}")


if __name__ == "__main__":
    main()
