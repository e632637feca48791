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

Extractors: `--extractor inception` (default) uses the standard FID tower
shape — torchvision-layout InceptionV3 pool3 features (models/inception.py)
with the pytorch-fid input convention — so with converted torchvision
weights (`--weights`, from examples/fetch_and_convert.py on a connected
machine) the scores are comparable to other torchvision-weight FID
implementations. NOTE on cross-paper comparisons: most published FIDs use
pytorch-fid's TF-ported `pt_inception-2015-12-05` checkpoint, whose weights
and pooling details differ from torchvision's ImageNet inception_v3 —
FID values from the two towers differ systematically, so compare against a
reference set re-measured with THIS tower rather than against a paper's
printed number. `--extractor vgg` uses the in-framework VGG16 fc2 features
(the GAN's perceptual tower).

Pretrained-weights caveat (docs/API_PARITY.md): with no egress and no
--weights the extractor is random-init — still a valid (self-consistent)
distribution distance for ordering models, but not paper-comparable.
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
    p.add_argument("--extractor", choices=("inception", "vgg"), default="inception",
                   help="inception = standard FID pool3 tower (with converted "
                   "weights, comparable across torchvision-weight FID impls; "
                   "see module docstring for the pytorch-fid cross-paper "
                   "caveat); vgg = in-framework perceptual tower")
    p.add_argument("--weights", default=None,
                   help="converted extractor checkpoint (msgpack, via "
                   "utils/checkpoint.save_module after utils/convert.py)")
    p.add_argument("--vgg-weights", default=None,
                   help="deprecated alias for --weights with --extractor vgg")
    args = p.parse_args()

    from muse_maskgit_pytorch_tpu.utils.eval import (
        FeatureStats,
        compute_feature_stats,
        fid_score,
        make_inception_extractor,
        make_vgg_extractor,
    )

    if args.vgg_weights:
        args.extractor, args.weights = "vgg", args.vgg_weights

    tower = None
    if args.weights:
        from flax import nnx

        from muse_maskgit_pytorch_tpu.utils.checkpoint import load_module

        if args.extractor == "vgg":
            from muse_maskgit_pytorch_tpu.models.vgg import VGG16

            tower = VGG16(rngs=nnx.Rngs(0))
        else:
            from muse_maskgit_pytorch_tpu.models.inception import InceptionV3

            tower = InceptionV3(rngs=nnx.Rngs(0))
        load_module(tower, args.weights)
    if args.extractor == "vgg":
        extract = make_vgg_extractor(vgg=tower)
    else:
        extract = make_inception_extractor(inception=tower)

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
