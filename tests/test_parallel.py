"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 5):
mesh construction, sharding rules, 1-device vs 8-device step equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from muse_maskgit_pytorch_tpu.parallel.mesh import (
    DEFAULT_TP_RULES,
    create_mesh,
    partition_specs_for,
    replicate,
    shard_batch,
    shard_tree,
)


def test_create_mesh_default():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8


def test_create_mesh_inferred_axis():
    mesh = create_mesh({"data": -1, "tensor": 2})
    assert mesh.shape == {"data": 4, "tensor": 2}


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh()
    x = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
    sharded = shard_batch(x, mesh)
    assert sharded.sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(x))


def test_partition_rules_match_transformer_paths():
    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer

    t = MaskGitTransformer(
        num_tokens=32, dim=64, seq_len=16, depth=1, dim_head=16, heads=4,
        text_embed_dim=32, rngs=nnx.Rngs(0),
    )
    _, state = nnx.split(t, nnx.Param)
    pure = state.to_pure_dict()
    specs = partition_specs_for(pure, DEFAULT_TP_RULES)
    flat = jax.tree_util.tree_leaves_with_path(specs, is_leaf=lambda x: isinstance(x, P))
    matched = ["/".join(str(getattr(k, "key", k)) for k in path) for path, spec in flat if spec != P()]
    assert any("to_q" in m for m in matched)
    assert any("to_logits" in m for m in matched)


def test_sharded_forward_matches_single_device(rng):
    """Same jitted forward, replicated params + data-sharded batch over 8
    devices vs single device: identical logits."""
    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer

    t = MaskGitTransformer(
        num_tokens=32, dim=64, seq_len=16, depth=1, dim_head=16, heads=4,
        text_embed_dim=32, rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(t)
    x = jax.random.randint(rng, (8, 16), 0, 32)
    te = jax.random.normal(rng, (8, 5, 32))

    def fwd(state, x, te):
        return nnx.merge(graphdef, state)(x, text_embeds=te)

    ref = jax.jit(fwd)(state, x, te)

    mesh = create_mesh()
    with mesh:
        state_r = replicate(nnx.to_pure_dict(nnx.state(t)), mesh)
        state2 = nnx.state(t)
        state2.replace_by_pure_dict(state_r)
        xs = shard_batch(x, mesh)
        tes = shard_batch(te, mesh)
        out = jax.jit(fwd)(state2, xs, tes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tensor_parallel_forward_matches(rng):
    """TP-sharded params over a 2-way tensor axis: same logits as replicated."""
    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer

    t = MaskGitTransformer(
        num_tokens=32, dim=64, seq_len=16, depth=1, dim_head=16, heads=4,
        text_embed_dim=32, rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(t)
    x = jax.random.randint(rng, (4, 16), 0, 32)
    te = jax.random.normal(rng, (4, 5, 32))

    def fwd(state, x, te):
        return nnx.merge(graphdef, state)(x, text_embeds=te)

    ref = jax.jit(fwd)(state, x, te)

    mesh = create_mesh({"data": 4, "tensor": 2})
    with mesh:
        pure = nnx.to_pure_dict(nnx.state(t))
        pure = shard_tree(pure, mesh, DEFAULT_TP_RULES)
        state2 = nnx.state(t)
        state2.replace_by_pure_dict(pure)
        xs = shard_batch(x, mesh)
        tes = shard_batch(te, mesh)
        out = jax.jit(fwd)(state2, xs, tes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_dp_train_step_equivalence(rng):
    """SURVEY §4.5: identical loss for the same jitted train step under a
    1-device mesh vs the 8-device mesh."""
    from muse_maskgit_pytorch_tpu.models import t5 as t5mod
    from muse_maskgit_pytorch_tpu.models.t5 import T5Config
    from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
    from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
    from muse_maskgit_pytorch_tpu.training.trainers import MaskGitTrainer

    name = "test/tiny-t5"
    if name not in t5mod.T5_CONFIGS:
        t5mod.T5_CONFIGS[name] = T5Config(32, 64, 2, 16, 2, True)

    def build(mesh):
        vae = VQGanVAE(
            dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False, rngs=nnx.Rngs(0)
        )
        tr = MaskGitTransformer(
            num_tokens=32, dim=32, seq_len=16, depth=1, dim_head=16, heads=2,
            t5_name=name, rngs=nnx.Rngs(0),
        )
        mg = MaskGit(image_size=16, transformer=tr, vae=vae)
        return MaskGitTrainer(
            mg, num_train_steps=1, batch_size=8, mesh=mesh,
            results_folder="/tmp/test-dp", save_model_every=10**9, use_ema=False,
        )

    data = np.random.default_rng(0)
    images = data.uniform(size=(1, 8, 16, 16, 3)).astype(np.float32)
    te = data.normal(size=(1, 8, 6, 32)).astype(np.float32)
    tm = np.ones((1, 8, 6), bool)

    t_single = build(create_mesh(devices=jax.devices()[:1]))
    loss1 = t_single.train_step_arrays(images, te, tm)["loss"]

    t_multi = build(create_mesh())
    with t_multi.mesh:
        imgs_s = jax.device_put(
            images, NamedSharding(t_multi.mesh, P(None, "data"))
        )
    loss8 = t_multi.train_step_arrays(imgs_s, te, tm)["loss"]

    assert np.isclose(loss1, loss8, rtol=1e-4), (loss1, loss8)
