"""Serving pipeline: shape-stable batching, padding, cascade mode."""

import numpy as np
from flax import nnx
from PIL import Image

from muse_maskgit_pytorch_tpu.models import t5 as t5mod
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit, Muse
from muse_maskgit_pytorch_tpu.models.t5 import T5Config
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
from muse_maskgit_pytorch_tpu.serving import GeneratePipeline

TINY_T5 = "test/tiny-t5"
if TINY_T5 not in t5mod.T5_CONFIGS:
    t5mod.T5_CONFIGS[TINY_T5] = T5Config(32, 64, 2, 16, 2, True)


def _maskgit(image_size=16, cond=None, seed=0):
    vae = VQGanVAE(dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    fmap = image_size // 4
    tr = MaskGitTransformer(
        num_tokens=32, dim=32, seq_len=fmap * fmap, depth=1, dim_head=16, heads=2,
        t5_name=TINY_T5, rngs=nnx.Rngs(seed),
    )
    return MaskGit(
        image_size=image_size, cond_image_size=cond, transformer=tr, vae=vae,
        cond_vae=vae if cond else None,
    )


def test_pipeline_basic():
    pipe = GeneratePipeline(_maskgit(), batch_size=4, timesteps=2, text_len=16)
    compile_s = pipe.warmup()
    assert compile_s > 0

    # more prompts than the batch size: chunks + padding
    images = pipe(["a", "b", "c", "d", "e"])
    assert len(images) == 5
    assert isinstance(images[0], Image.Image)
    assert images[0].size == (16, 16)
    assert pipe.stats["batches"] == 2  # ceil(5 / 4) chunks; warmup not counted
    assert pipe.stats["images"] == 5
    assert pipe.images_per_second is not None


def test_pipeline_single_prompt_array_output():
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False
    )
    out = pipe("hello")
    assert out.shape == (1, 16, 16, 3)
    # images are quantized to uint8 on device before the host fetch (4x less
    # device->host traffic — the serving bottleneck on remote hosts)
    assert out.dtype == np.uint8


def test_pipeline_bf16_vae_production_config():
    """The production recommendation (BASELINE.md r3: VAE dtype=bf16, decode
    stage -17%, max pixel delta 0.0008) must serve correctly end to end."""
    import jax.numpy as jnp

    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False,
        dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    tr = MaskGitTransformer(
        num_tokens=32, dim=32, seq_len=16, depth=1, dim_head=16, heads=2,
        t5_name=TINY_T5, dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    mg = MaskGit(image_size=16, transformer=tr, vae=vae)
    pipe = GeneratePipeline(mg, batch_size=2, timesteps=2, text_len=16, return_pil=False)
    out = pipe(["a cat"])
    assert out.shape == (1, 16, 16, 3)
    assert out.dtype == np.uint8


def test_pipeline_cascade():
    muse = Muse(_maskgit(16), _maskgit(32, cond=16, seed=1))
    pipe = GeneratePipeline(muse, batch_size=2, timesteps=2, text_len=16, return_pil=False)
    out = pipe(["x", "y", "z"])
    assert out.shape == (3, 32, 32, 3)


def test_pipeline_deterministic_stream_advances():
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False
    )
    a = pipe(["same prompt", "same prompt"])
    b = pipe(["same prompt", "same prompt"])
    # key stream advances between calls: outputs differ
    assert not np.allclose(a, b)


def test_pipeline_negative_prompt():
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        negative_prompt="blurry",
    )
    out = pipe(["a", "b"])
    assert out.shape == (2, 16, 16, 3)
