"""Weight-converter parity: our native T5 encoder / VGG16 vs the torch
originals, using locally-instantiated random-weight models (no downloads).

This validates the full frozen-encoder math (SURVEY.md §7 hard part 6):
relative-position-bias attention, RMSNorm, gated-GELU FF for T5; conv/pool
stack, adaptive pool, CHW-flatten classifier for VGG16.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp
from flax import nnx

from muse_maskgit_pytorch_tpu.models.t5 import T5Config, T5Encoder
from muse_maskgit_pytorch_tpu.models.vgg import VGG16
from muse_maskgit_pytorch_tpu.utils.convert import (
    load_torchvision_vgg16,
)


def _tiny_hf_t5(gated=True):
    cfg = transformers.T5Config(
        vocab_size=128,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    return transformers.T5EncoderModel(cfg)


@pytest.mark.parametrize("gated", [True, False])
def test_t5_encoder_matches_hf(gated):
    hf = _tiny_hf_t5(gated).eval()

    ours = T5Encoder(
        T5Config(
            d_model=32, d_ff=64, num_heads=4, d_kv=8, num_layers=2,
            gated=gated, vocab_size=128,
        ),
        rngs=nnx.Rngs(0),
    )
    # convert weights from the in-memory HF model
    from muse_maskgit_pytorch_tpu.utils import convert as C

    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
    ours.token_emb.embedding[...] = C._a(sd["shared.weight"])
    for i, block in enumerate(ours.blocks):
        p = f"encoder.block.{i}"
        block.ln1.weight[...] = C._a(sd[f"{p}.layer.0.layer_norm.weight"])
        block.attn.q.kernel[...] = C._t(sd[f"{p}.layer.0.SelfAttention.q.weight"])
        block.attn.k.kernel[...] = C._t(sd[f"{p}.layer.0.SelfAttention.k.weight"])
        block.attn.v.kernel[...] = C._t(sd[f"{p}.layer.0.SelfAttention.v.weight"])
        block.attn.o.kernel[...] = C._t(sd[f"{p}.layer.0.SelfAttention.o.weight"])
        if block.attn.rel_bias is not None:
            block.attn.rel_bias.embedding[...] = C._a(
                sd[f"{p}.layer.0.SelfAttention.relative_attention_bias.weight"]
            )
        block.ln2.weight[...] = C._a(sd[f"{p}.layer.1.layer_norm.weight"])
        if gated:
            block.ff.wi_0.kernel[...] = C._t(sd[f"{p}.layer.1.DenseReluDense.wi_0.weight"])
            block.ff.wi_1.kernel[...] = C._t(sd[f"{p}.layer.1.DenseReluDense.wi_1.weight"])
        else:
            block.ff.wi.kernel[...] = C._t(sd[f"{p}.layer.1.DenseReluDense.wi.weight"])
        block.ff.wo.kernel[...] = C._t(sd[f"{p}.layer.1.DenseReluDense.wo.weight"])
    ours.final_norm.weight[...] = C._a(sd["encoder.final_layer_norm.weight"])

    ids = np.array([[5, 9, 17, 33, 1, 0, 0, 0], [2, 3, 1, 0, 0, 0, 0, 0]], np.int32)
    mask = ids != 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    out = np.asarray(ours(jnp.asarray(ids), jnp.asarray(mask)))
    # compare only non-padding positions (HF computes padding rows too but
    # they are meaningless; our contract zeroes them later anyway)
    np.testing.assert_allclose(out[mask], ref[mask], atol=2e-4, rtol=1e-3)


def test_load_hf_t5_weights_function():
    """The public converter accepts a name_or_path; exercise it through a
    locally saved tiny model."""
    import tempfile

    from muse_maskgit_pytorch_tpu.utils.convert import load_hf_t5_weights

    hf = _tiny_hf_t5(True).eval()
    with tempfile.TemporaryDirectory() as d:
        hf.save_pretrained(d)
        ours = T5Encoder(
            T5Config(d_model=32, d_ff=64, num_heads=4, d_kv=8, num_layers=2,
                     gated=True, vocab_size=128),
            rngs=nnx.Rngs(1),
        )
        load_hf_t5_weights(ours, d)

    ids = np.array([[5, 9, 17, 1]], np.int32)
    mask = np.ones_like(ids, bool)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    out = np.asarray(ours(jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def _torchvision_vgg16_truncated():
    """torchvision's vgg16 (config "D") restated in pure torch, classifier
    already truncated by 2 (reference vqgan_vae.py:383). torchvision itself is
    not installed in this environment (and there is no network egress for
    pretrained weights), but its vgg16 is a plain Sequential whose state_dict
    layout — features.N.{weight,bias}, classifier.{0,3}.{weight,bias} — this
    module reproduces exactly, so the converter and the forward math are fully
    exercised; only the pretrained VALUES are unavailable (documented in
    docs/API_PARITY.md)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = v

    class TV(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = torch.nn.Sequential(*layers)
            self.avgpool = torch.nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = torch.nn.Sequential(
                torch.nn.Linear(512 * 7 * 7, 4096),
                torch.nn.ReLU(True),
                torch.nn.Dropout(),
                torch.nn.Linear(4096, 4096),
                torch.nn.ReLU(True),
            )

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x)
            return self.classifier(torch.flatten(x, 1))

    return TV()


def test_vgg16_matches_torchvision_layout():
    torch.manual_seed(0)
    tv = _torchvision_vgg16_truncated().eval()

    ours = VGG16(rngs=nnx.Rngs(0))
    load_torchvision_vgg16(ours, state_dict=tv.state_dict())

    x = np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(ours(jnp.asarray(x)))
    assert out.shape == ref.shape == (2, 4096)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)
