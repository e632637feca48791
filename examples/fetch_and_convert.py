"""One-command pretrained-weights bring-up (run on a machine WITH egress).

The reference downloads `google/t5-v1_1-base` and ImageNet VGG16 from hubs at
runtime (/root/reference/muse_maskgit_pytorch/t5.py:28-30, vqgan_vae.py:382-384);
a zero-egress production host can't. This script turns the standing caveat
into a 10-minute operation: on any connected machine it downloads the
pretrained towers, converts them to this framework's layouts
(utils/convert.py), and writes framework msgpack checkpoints that the
zero-egress host loads with no network at all.

On the CONNECTED machine:
  python examples/fetch_and_convert.py --out /weights \
      --t5 google/t5-v1_1-base --vgg --inception

Every write is recorded in /weights/manifest.json (sha256 + size + per-leaf
shapes). Ship /weights to the serving/training host, then ON THE TARGET:
  python examples/fetch_and_convert.py --out /weights --verify
which fails loudly on any truncated/corrupt/swapped file; `load_module` also
re-verifies automatically whenever a manifest.json sits next to the file.

Then load:
  from muse_maskgit_pytorch_tpu.models.t5 import T5Encoder, get_config, set_model
  from muse_maskgit_pytorch_tpu.utils.checkpoint import load_module
  enc = T5Encoder(get_config(name), rngs=nnx.Rngs(0))
  load_module(enc, "/weights/t5-google-t5-v1_1-base.msgpack")
  set_model(name, enc, tokenizer=...)   # tokenizer dir saved next to it

  # perceptual / FID towers:
  load_module(VGG16(rngs=...), "/weights/vgg16.msgpack")
  load_module(InceptionV3(rngs=...), "/weights/inception_v3.msgpack")

`--dry-run` exercises the whole pipeline with locally built random-weight
models (no network): the converters, checkpoint writes, and reload
verification all run — this is how the zero-egress CI validates the script.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse
from pathlib import Path

import numpy as np


def _save_and_verify(module, build_fresh, path):
    """Write the checkpoint, record it in the out dir's manifest.json
    (sha256 + size + per-leaf shapes — the verification that travels to the
    zero-egress host), then reload into a fresh module THROUGH the manifest
    check and spot-check the values round-tripped (catches silent layout
    mismatches and exercises the exact load path the target host runs)."""
    from muse_maskgit_pytorch_tpu.utils.checkpoint import (
        load_module,
        manifest_entry,
        save_module,
        write_manifest,
    )

    save_module(module, path)
    write_manifest(path.parent, {path.name: manifest_entry(path, module)})
    fresh = build_fresh()
    load_module(fresh, path)  # verifies against the manifest just written
    src = jax_leaves_checksum(module)
    dst = jax_leaves_checksum(fresh)
    assert np.allclose(src, dst), f"reload mismatch for {path}"
    print(f"  wrote + verified {path} (manifest entry recorded)")


def jax_leaves_checksum(module):
    import jax
    from flax import nnx

    leaves = jax.tree.leaves(nnx.state(module))
    return float(sum(float(np.abs(np.asarray(l)).sum()) for l in leaves))


def fetch_t5(name: str, out: Path, dry_run: bool):
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models import t5 as t5mod
    from muse_maskgit_pytorch_tpu.utils import convert as C

    slug = name.replace("/", "-")
    if dry_run:
        # locally built random HF model: converter + save path fully exercised
        import transformers

        cfg = transformers.T5Config(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_heads=4, feed_forward_proj="gated-gelu", dropout_rate=0.0,
        )
        hf = transformers.T5EncoderModel(cfg).eval()
        ours_cfg = t5mod.T5Config(
            d_model=32, d_ff=64, num_heads=4, d_kv=8, num_layers=2,
            gated=True, vocab_size=128,
        )
        enc = t5mod.T5Encoder(ours_cfg, rngs=nnx.Rngs(0))
        C.load_hf_t5_weights(enc, hf)  # accepts an in-memory model
        build = lambda: t5mod.T5Encoder(ours_cfg, rngs=nnx.Rngs(1))
    else:
        cfg = t5mod.get_config(name)
        enc = t5mod.T5Encoder(cfg, rngs=nnx.Rngs(0))
        C.load_hf_t5_weights(enc, name)
        build = lambda: t5mod.T5Encoder(cfg, rngs=nnx.Rngs(1))
        # save the sentencepiece tokenizer next to the weights so the
        # zero-egress host gets the REAL vocabulary too (t5.py byte-level
        # fallback otherwise)
        try:
            import transformers

            tok = transformers.AutoTokenizer.from_pretrained(name)
            tdir = out / f"tokenizer-{slug}"
            tok.save_pretrained(tdir)
            from muse_maskgit_pytorch_tpu.utils.checkpoint import (
                manifest_entry, write_manifest,
            )

            write_manifest(out, {
                f"tokenizer-{slug}/{p.name}": manifest_entry(p)
                for p in sorted(tdir.iterdir()) if p.is_file()
            })
            print(f"  saved tokenizer -> {tdir} (manifest entries recorded)")
        except Exception as e:  # tokenizer optional; weights still useful
            print(f"  tokenizer save skipped: {e}")
    _save_and_verify(enc, build, out / f"t5-{slug}.msgpack")


def fetch_vgg(out: Path, dry_run: bool):
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.vgg import VGG16
    from muse_maskgit_pytorch_tpu.utils.convert import load_torchvision_vgg16

    vgg = VGG16(rngs=nnx.Rngs(0))
    if dry_run:
        import torch

        sd = {}
        idx = 0
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        in_ch = 3
        g = torch.Generator().manual_seed(0)
        for v in cfg:
            if v == "M":
                idx += 1
                continue
            sd[f"features.{idx}.weight"] = 0.05 * torch.randn(v, in_ch, 3, 3, generator=g)
            sd[f"features.{idx}.bias"] = torch.zeros(v)
            in_ch = v
            idx += 2
        sd["classifier.0.weight"] = 0.05 * torch.randn(4096, 512 * 49, generator=g)
        sd["classifier.0.bias"] = torch.zeros(4096)
        sd["classifier.3.weight"] = 0.05 * torch.randn(4096, 4096, generator=g)
        sd["classifier.3.bias"] = torch.zeros(4096)
        load_torchvision_vgg16(vgg, state_dict=sd)
    else:
        load_torchvision_vgg16(vgg)  # downloads via torchvision
    _save_and_verify(vgg, lambda: VGG16(rngs=nnx.Rngs(1)), out / "vgg16.msgpack")


def fetch_inception(out: Path, dry_run: bool):
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.inception import InceptionV3
    from muse_maskgit_pytorch_tpu.utils.convert import (
        _walk_basic_convs,
        load_torchvision_inception_v3,
    )

    inc = InceptionV3(rngs=nnx.Rngs(0))
    if dry_run:
        import torch

        # synthesize a torchvision-layout state_dict from the module's own
        # walked shapes (the converter validates the 94-unit count)
        g = torch.Generator().manual_seed(0)
        sd = {}
        for path, conv in _walk_basic_convs(inc):
            kh, kw, cin, cout = conv.conv.kernel.shape
            sd[f"{path}.conv.weight"] = 0.05 * torch.randn(cout, cin, kh, kw, generator=g)
            sd[f"{path}.bn.weight"] = torch.ones(cout)
            sd[f"{path}.bn.bias"] = torch.zeros(cout)
            sd[f"{path}.bn.running_mean"] = 0.01 * torch.randn(cout, generator=g)
            sd[f"{path}.bn.running_var"] = torch.ones(cout)
        load_torchvision_inception_v3(inc, state_dict=sd)
    else:
        load_torchvision_inception_v3(inc)  # downloads via torchvision
    _save_and_verify(
        inc, lambda: InceptionV3(rngs=nnx.Rngs(1)), out / "inception_v3.msgpack"
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="./weights", help="output directory")
    p.add_argument("--t5", default=None, help="HF T5 name (e.g. google/t5-v1_1-base)")
    p.add_argument("--vgg", action="store_true", help="fetch ImageNet VGG16")
    p.add_argument("--inception", action="store_true",
                   help="fetch InceptionV3 (standard FID tower)")
    p.add_argument("--dry-run", action="store_true",
                   help="no network: exercise converters + checkpoints with "
                   "locally built random models (zero-egress CI mode)")
    p.add_argument("--verify", action="store_true",
                   help="verify every manifest.json entry under --out and "
                   "exit — run this on the TARGET host after transport")
    args = p.parse_args()

    out = Path(args.out)
    if args.verify:
        import json

        from muse_maskgit_pytorch_tpu.utils.checkpoint import (
            MANIFEST_NAME, verify_manifest,
        )

        mpath = out / MANIFEST_NAME
        if not mpath.exists():
            raise SystemExit(f"no {MANIFEST_NAME} in {out}")
        manifest = json.loads(mpath.read_text())
        for name in sorted(manifest):
            verify_manifest(out / name, mpath, require=True)
            print(f"  ok {name}")
        print(f"verified {len(manifest)} entries in {mpath}")
        return

    out.mkdir(parents=True, exist_ok=True)
    did = False
    if args.t5:
        print(f"T5 {args.t5}:")
        fetch_t5(args.t5, out, args.dry_run)
        did = True
    if args.vgg:
        print("VGG16:")
        fetch_vgg(out, args.dry_run)
        did = True
    if args.inception:
        print("InceptionV3:")
        fetch_inception(out, args.dry_run)
        did = True
    if not did:
        raise SystemExit("nothing requested: pass --t5 NAME and/or --vgg / --inception")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
