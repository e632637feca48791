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


# -- InceptionV3 (standard FID tower) ----------------------------------------


def _torch_inception_v3():
    """torchvision's inception_v3 restated in pure torch (stem through
    Mixed_7c + global average pool — the FID pool3 path; no aux, no fc).
    torchvision is not installed here, but its state_dict layout
    (`Conv2d_1a_3x3.conv.weight`, `Mixed_5b.branch5x5_1.bn.running_mean`,
    ...) is reproduced exactly, so the converter and forward math are fully
    exercised; only pretrained VALUES are unavailable (docs/API_PARITY.md)."""
    nn = torch.nn

    class BC(nn.Module):  # torchvision BasicConv2d
        def __init__(self, i, o, k, s=1, p=0):
            super().__init__()
            self.conv = nn.Conv2d(i, o, k, stride=s, padding=p, bias=False)
            self.bn = nn.BatchNorm2d(o, eps=0.001)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    class A(nn.Module):
        def __init__(self, i, pool):
            super().__init__()
            self.branch1x1 = BC(i, 64, 1)
            self.branch5x5_1 = BC(i, 48, 1)
            self.branch5x5_2 = BC(48, 64, 5, p=2)
            self.branch3x3dbl_1 = BC(i, 64, 1)
            self.branch3x3dbl_2 = BC(64, 96, 3, p=1)
            self.branch3x3dbl_3 = BC(96, 96, 3, p=1)
            self.branch_pool = BC(i, pool, 1)

        def forward(self, x):
            ap = torch.nn.functional.avg_pool2d(x, 3, 1, 1)
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(ap),
            ], 1)

    class B(nn.Module):
        def __init__(self, i):
            super().__init__()
            self.branch3x3 = BC(i, 384, 3, s=2)
            self.branch3x3dbl_1 = BC(i, 64, 1)
            self.branch3x3dbl_2 = BC(64, 96, 3, p=1)
            self.branch3x3dbl_3 = BC(96, 96, 3, s=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                torch.nn.functional.max_pool2d(x, 3, 2),
            ], 1)

    class C(nn.Module):
        def __init__(self, i, c7):
            super().__init__()
            self.branch1x1 = BC(i, 192, 1)
            self.branch7x7_1 = BC(i, c7, 1)
            self.branch7x7_2 = BC(c7, c7, (1, 7), p=(0, 3))
            self.branch7x7_3 = BC(c7, 192, (7, 1), p=(3, 0))
            self.branch7x7dbl_1 = BC(i, c7, 1)
            self.branch7x7dbl_2 = BC(c7, c7, (7, 1), p=(3, 0))
            self.branch7x7dbl_3 = BC(c7, c7, (1, 7), p=(0, 3))
            self.branch7x7dbl_4 = BC(c7, c7, (7, 1), p=(3, 0))
            self.branch7x7dbl_5 = BC(c7, 192, (1, 7), p=(0, 3))
            self.branch_pool = BC(i, 192, 1)

        def forward(self, x):
            d = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            return torch.cat([
                self.branch1x1(x),
                self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
                d,
                self.branch_pool(torch.nn.functional.avg_pool2d(x, 3, 1, 1)),
            ], 1)

    class D(nn.Module):
        def __init__(self, i):
            super().__init__()
            self.branch3x3_1 = BC(i, 192, 1)
            self.branch3x3_2 = BC(192, 320, 3, s=2)
            self.branch7x7x3_1 = BC(i, 192, 1)
            self.branch7x7x3_2 = BC(192, 192, (1, 7), p=(0, 3))
            self.branch7x7x3_3 = BC(192, 192, (7, 1), p=(3, 0))
            self.branch7x7x3_4 = BC(192, 192, 3, s=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(
                    self.branch7x7x3_2(self.branch7x7x3_1(x)))),
                torch.nn.functional.max_pool2d(x, 3, 2),
            ], 1)

    class E(nn.Module):
        def __init__(self, i):
            super().__init__()
            self.branch1x1 = BC(i, 320, 1)
            self.branch3x3_1 = BC(i, 384, 1)
            self.branch3x3_2a = BC(384, 384, (1, 3), p=(0, 1))
            self.branch3x3_2b = BC(384, 384, (3, 1), p=(1, 0))
            self.branch3x3dbl_1 = BC(i, 448, 1)
            self.branch3x3dbl_2 = BC(448, 384, 3, p=1)
            self.branch3x3dbl_3a = BC(384, 384, (1, 3), p=(0, 1))
            self.branch3x3dbl_3b = BC(384, 384, (3, 1), p=(1, 0))
            self.branch_pool = BC(i, 192, 1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            return torch.cat([
                self.branch1x1(x), b3, bd,
                self.branch_pool(torch.nn.functional.avg_pool2d(x, 3, 1, 1)),
            ], 1)

    class TV(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BC(3, 32, 3, s=2)
            self.Conv2d_2a_3x3 = BC(32, 32, 3)
            self.Conv2d_2b_3x3 = BC(32, 64, 3, p=1)
            self.Conv2d_3b_1x1 = BC(64, 80, 1)
            self.Conv2d_4a_3x3 = BC(80, 192, 3)
            self.Mixed_5b = A(192, 32)
            self.Mixed_5c = A(256, 64)
            self.Mixed_5d = A(288, 64)
            self.Mixed_6a = B(288)
            self.Mixed_6b = C(768, 128)
            self.Mixed_6c = C(768, 160)
            self.Mixed_6d = C(768, 160)
            self.Mixed_6e = C(768, 192)
            self.Mixed_7a = D(768)
            self.Mixed_7b = E(1280)
            self.Mixed_7c = E(2048)

        def forward(self, x):
            mp = torch.nn.functional.max_pool2d
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = mp(x, 3, 2)
            x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
            x = mp(x, 3, 2)
            for blk in [self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                        self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                        self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                        self.Mixed_7b, self.Mixed_7c]:
                x = blk(x)
            return x.mean(dim=(2, 3))

    return TV()


def test_inception_v3_matches_torchvision_layout():
    """Converter + forward parity for the standard-FID InceptionV3 against a
    torch restatement with randomized weights AND batchnorm statistics (so
    the BN inference path is genuinely exercised)."""
    from muse_maskgit_pytorch_tpu.models.inception import InceptionV3
    from muse_maskgit_pytorch_tpu.utils.convert import load_torchvision_inception_v3

    torch.manual_seed(0)
    tv = _torch_inception_v3().eval()
    # randomize BN stats away from the (0, 1) init so mean/var conversion
    # is actually validated
    g = torch.Generator().manual_seed(1)
    for m in tv.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(0.05 * torch.randn(m.running_mean.shape, generator=g))
            m.running_var.copy_(1.0 + 0.1 * torch.rand(m.running_var.shape, generator=g))

    ours = InceptionV3(rngs=nnx.Rngs(0))
    load_torchvision_inception_v3(ours, state_dict=tv.state_dict())

    x = np.random.default_rng(0).uniform(-1, 1, size=(2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(ours(jnp.asarray(x)))
    assert out.shape == ref.shape == (2, 2048)
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_inception_extractor_and_fid():
    """make_inception_extractor: resize + [-1,1] rescale + pool3 features;
    FID over its stats separates identical from shifted distributions."""
    from muse_maskgit_pytorch_tpu.utils.eval import (
        FeatureStats,
        fid_score,
        make_inception_extractor,
    )

    extract = make_inception_extractor(seed=0, resize_to=96)
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + 0.25, 0, 1)

    fa = np.asarray(extract(a))
    assert fa.shape == (8, 2048) and np.isfinite(fa).all()

    sa, sb, sa2 = FeatureStats(2048), FeatureStats(2048), FeatureStats(2048)
    sa.update(fa)
    sb.update(np.asarray(extract(b)))
    sa2.update(np.asarray(extract(a)))
    assert fid_score(sa, sa2) < 1e-4
    assert fid_score(sa, sb) > fid_score(sa, sa2)
