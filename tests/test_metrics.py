"""Observability: analytic model-FLOPs accounting (MFU) pinned against
XLA's own cost model, metrics logger basics."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
from muse_maskgit_pytorch_tpu.utils.metrics import (
    maskgit_generate_flops,
    transformer_forward_flops,
)


def test_transformer_forward_flops_matches_xla_cost_model():
    """The analytic matmul count must track XLA's compiled flops estimate
    (which also counts softmax/LN elementwise work, so analytic <= XLA and
    within ~20% at matmul-dominated sizes)."""
    dim, depth, seq, m, vocab, rows = 128, 2, 64, 24, 512, 4
    tr = MaskGitTransformer(
        num_tokens=vocab, dim=dim, seq_len=seq, depth=depth, dim_head=32,
        heads=4, text_embed_dim=dim, rngs=nnx.Rngs(0),  # text proj = identity
    )
    graphdef, state = nnx.split(tr)

    def fwd(state, x, te):
        model = nnx.merge(graphdef, state)
        # return_embed skips the vocab head: isolates the backbone count
        _, embed = model(x, text_embeds=te, return_embed=True)
        return embed

    x = jnp.zeros((rows, seq), jnp.int32)
    te = jnp.ones((rows, m, dim))
    compiled = jax.jit(fwd).lower(state, x, te).compile()
    xla_flops = float(compiled.cost_analysis()["flops"])

    analytic = transformer_forward_flops(
        rows, seq, m, dim=dim, depth=depth, self_cond=False
    )
    assert analytic <= xla_flops * 1.02, (analytic, xla_flops)
    assert analytic >= xla_flops * 0.75, (analytic, xla_flops)


def test_maskgit_generate_flops_structure():
    base = maskgit_generate_flops(
        batch=8, timesteps=4, seq_len=64, text_len=16, dim=64, depth=2,
        vocab=512, cond_scale=3.0, self_cond=False,
    )
    # cond_scale 1: single-batch forwards -> roughly half the doubled cost
    single = maskgit_generate_flops(
        batch=8, timesteps=4, seq_len=64, text_len=16, dim=64, depth=2,
        vocab=512, cond_scale=1.0, self_cond=False,
    )
    assert 0.4 < single / base < 0.62, single / base
    # compact head schedule strictly reduces the count
    compact = maskgit_generate_flops(
        batch=8, timesteps=4, seq_len=64, text_len=16, dim=64, depth=2,
        vocab=512, cond_scale=3.0, self_cond=False,
        head_positions_per_step=[64, 32, 16, 8],
    )
    assert compact < base
    # VAE decode flops pass straight through
    assert (
        maskgit_generate_flops(
            batch=8, timesteps=4, seq_len=64, text_len=16, dim=64, depth=2,
            vocab=512, vae_decode_flops=1e9,
        )
        - maskgit_generate_flops(
            batch=8, timesteps=4, seq_len=64, text_len=16, dim=64, depth=2,
            vocab=512, vae_decode_flops=0,
        )
        == 1e9
    )


def test_maskgit_train_flops_matches_xla_cost_model():
    """fwd+bwd analytic count vs XLA's flops estimate for the exact loss
    the trainer differentiates (self_cond off so no lax.cond ambiguity in
    the cost model; XLA additionally counts softmax/LN/CE elementwise work,
    so analytic <= XLA and within ~30% at matmul-dominated sizes)."""
    from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
    from muse_maskgit_pytorch_tpu.utils.metrics import maskgit_train_flops

    dim, depth, seq, text_len, vocab, batch = 128, 2, 64, 16, 512, 4
    tr = MaskGitTransformer(
        num_tokens=vocab, dim=dim, seq_len=seq, depth=depth, dim_head=32,
        heads=4, text_embed_dim=dim, self_cond=False, rngs=nnx.Rngs(0),
    )
    mg = MaskGit(image_size=64, transformer=tr, vae=None)
    graphdef, state = nnx.split(mg)

    def loss(state, ids, te, tm, key):
        model = nnx.merge(graphdef, state)
        return model(ids, rng=key, text_embeds=te, text_mask=tm)

    ids = jnp.zeros((batch, seq), jnp.int32)
    te = jnp.ones((batch, text_len, dim))
    tm = jnp.ones((batch, text_len), bool)
    key = jax.random.PRNGKey(0)
    compiled = (
        jax.jit(jax.value_and_grad(loss)).lower(state, ids, te, tm, key).compile()
    )
    xla_flops = float(compiled.cost_analysis()["flops"])

    analytic = maskgit_train_flops(
        batch=batch, seq_len=seq, text_len=text_len, dim=dim, depth=depth,
        vocab=vocab, self_cond=False,
    )
    assert analytic <= xla_flops * 1.02, (analytic, xla_flops)
    assert analytic >= xla_flops * 0.70, (analytic, xla_flops)


def test_maskgit_train_flops_structure():
    from muse_maskgit_pytorch_tpu.utils.metrics import maskgit_train_flops

    kw = dict(batch=8, seq_len=64, text_len=16, dim=64, depth=2, vocab=512)
    base = maskgit_train_flops(**kw, self_cond=False)
    # self-cond grows the main forward (its FF) AND adds the expected-value
    # no-grad forward, monotonically in the probability; the extra no-grad
    # forward is < 1/3 of the fwd+bwd cost
    sc0 = maskgit_train_flops(**kw, self_cond=True, self_cond_prob=0.0)
    sc5 = maskgit_train_flops(**kw, self_cond=True, self_cond_prob=0.5)
    sc9 = maskgit_train_flops(**kw, self_cond=True, self_cond_prob=0.9)
    assert base < sc0 < sc5 < sc9 < sc0 * 4 / 3
    # critic roughly doubles the backbone cost (second transformer fwd+bwd)
    with_critic = maskgit_train_flops(**kw, self_cond=False, critic=True)
    assert with_critic > base * 1.3
    # VAE encode flops pass straight through
    assert (
        maskgit_train_flops(**kw, self_cond=False, vae_encode_flops=1e9)
        == base + 1e9
    )


def test_metrics_logger_jsonl(tmp_path):
    import json

    from muse_maskgit_pytorch_tpu.utils.metrics import MetricsLogger

    path = tmp_path / "m.jsonl"
    ml = MetricsLogger(path)
    ml.log(0, loss=1.5)
    ml.log(1, loss=np.float32(1.25), note="x")
    ml.close()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 1
    assert lines[1]["note"] == "x"
