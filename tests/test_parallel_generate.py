"""Data-parallel generation: the jitted decode scan under a mesh with the
batch sharded on the data axis must produce the same tokens as unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
from muse_maskgit_pytorch_tpu.parallel.mesh import create_mesh

CODEBOOK = 32


def _maskgit():
    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=CODEBOOK, use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    tr = MaskGitTransformer(
        num_tokens=CODEBOOK, dim=32, seq_len=16, depth=1, dim_head=16, heads=2,
        text_embed_dim=32, rngs=nnx.Rngs(0),
    )
    return MaskGit(image_size=16, transformer=tr, vae=vae)


def test_generate_sharded_matches_unsharded(rng):
    mg = _maskgit()
    batch = 8
    te = jax.random.normal(rng, (batch, 6, 32))
    tm = jnp.ones((batch, 6), bool)

    ids_ref = np.asarray(
        mg.generate(text_embeds=te, text_mask=tm, rng=rng, timesteps=3, return_ids=True)
    )

    mesh = create_mesh()
    with mesh:
        te_s = jax.device_put(te, NamedSharding(mesh, P("data", None, None)))
        tm_s = jax.device_put(tm, NamedSharding(mesh, P("data", None)))
        ids_sharded = np.asarray(
            mg.generate(
                text_embeds=te_s, text_mask=tm_s, rng=rng, timesteps=3, return_ids=True
            )
        )
    np.testing.assert_array_equal(ids_ref, ids_sharded)
