"""One-time weight converters: HuggingFace T5 → framework T5Encoder,
torchvision VGG16 → framework VGG16.

SURVEY.md §2.3: the reference leans on pretrained `T5EncoderModel`
(t5.py:28-30) and `torchvision.models.vgg16` (vqgan_vae.py:382-384); this
framework re-implements both natively and converts their weights once. The
converters require `torch`/`transformers` with locally cached weights (this
environment has no egress); when unavailable, callers fall back to random
init (documented in models/t5.py and models/vgg.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


def _t(w) -> jnp.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return jnp.asarray(np.asarray(w).T)


def _a(w) -> jnp.ndarray:
    return jnp.asarray(np.asarray(w))


_HUB_UNREACHABLE = False  # per-process circuit breaker (see below)


def _hf_local_first(fn, name_or_path: str, **kw):
    """Try the local HF cache first: `from_pretrained` without
    `local_files_only` hits huggingface.co with retries of exponential
    backoff when the name is not cached — a ~minute stall per load in an
    egress-less production environment before the random-init fallback even
    gets a chance. Local-first is instant either way; the networked attempt
    still runs second where egress exists — but at most ONCE per process:
    the first connectivity failure trips a circuit breaker so subsequent
    loads fail fast. (Set TRANSFORMERS_OFFLINE=1 to skip network entirely.)
    """
    global _HUB_UNREACHABLE
    try:
        return fn(name_or_path, local_files_only=True, **kw)
    except Exception:
        pass
    if _HUB_UNREACHABLE:
        raise RuntimeError(
            f"{name_or_path!r}: not in the local HF cache and the hub was "
            "unreachable earlier in this process"
        )
    try:
        return fn(name_or_path, **kw)
    except Exception as e:
        if _is_connectivity_error(e):
            _HUB_UNREACHABLE = True
        raise


def _is_connectivity_error(e: BaseException) -> bool:
    """True when an exception (or anything in its cause/context chain) looks
    like hub connectivity trouble rather than a genuinely-missing repo.
    TRANSPORT-LEVEL classes only: generic OSError / RequestException would
    also match a typo'd repo id (transformers raises plain OSError "not a
    valid model identifier"; a hub 404 is RepositoryNotFoundError ⊂
    HTTPError ⊂ RequestException) and poison the breaker for later valid
    loads. Substring fallback covers transformers' own "couldn't connect"
    OSError wrapper."""
    import socket

    conn_types = [ConnectionError, TimeoutError, socket.gaierror]
    try:
        import requests

        conn_types += [
            requests.exceptions.ConnectionError,
            requests.exceptions.Timeout,
            requests.exceptions.SSLError,
            requests.exceptions.ProxyError,
        ]
    except ImportError:
        pass
    try:
        # urllib3's HTTPError base covers only its transport errors
        # (NewConnectionError/MaxRetryError/ProtocolError/...), never 404s
        import urllib3

        conn_types.append(urllib3.exceptions.HTTPError)
    except ImportError:
        pass
    conn_types = tuple(conn_types)

    seen, chain = set(), []
    node: Optional[BaseException] = e
    while node is not None and id(node) not in seen:
        seen.add(id(node))
        chain.append(node)
        node = node.__cause__ or node.__context__
    if any(isinstance(c, conn_types) for c in chain):
        return True
    return any(
        s in repr(e)
        for s in (
            "NameResolutionError",
            "MaxRetryError",
            "ConnectionError",
            "ConnectTimeout",
            "SSLError",
            "ProxyError",
            "OfflineMode",
            "couldn't connect",
        )
    )


def load_hf_t5_weights(model, name_or_path) -> None:
    """Populate a `models.t5.T5Encoder` from a HF `T5EncoderModel` — by hub
    name/path, or directly from an in-memory HF model (offline conversion)."""
    if isinstance(name_or_path, str):
        from transformers import T5EncoderModel

        hf = _hf_local_first(T5EncoderModel.from_pretrained, name_or_path)
    else:
        hf = name_or_path
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}

    model.token_emb.embedding[...] = _a(sd["shared.weight"])
    for i, block in enumerate(model.blocks):
        p = f"encoder.block.{i}"
        block.ln1.weight[...] = _a(sd[f"{p}.layer.0.layer_norm.weight"])
        attn = block.attn
        attn.q.kernel[...] = _t(sd[f"{p}.layer.0.SelfAttention.q.weight"])
        attn.k.kernel[...] = _t(sd[f"{p}.layer.0.SelfAttention.k.weight"])
        attn.v.kernel[...] = _t(sd[f"{p}.layer.0.SelfAttention.v.weight"])
        attn.o.kernel[...] = _t(sd[f"{p}.layer.0.SelfAttention.o.weight"])
        if attn.rel_bias is not None:
            attn.rel_bias.embedding[...] = _a(
                sd[f"{p}.layer.0.SelfAttention.relative_attention_bias.weight"]
            )
        block.ln2.weight[...] = _a(sd[f"{p}.layer.1.layer_norm.weight"])
        ff = block.ff
        if ff.gated:
            ff.wi_0.kernel[...] = _t(sd[f"{p}.layer.1.DenseReluDense.wi_0.weight"])
            ff.wi_1.kernel[...] = _t(sd[f"{p}.layer.1.DenseReluDense.wi_1.weight"])
        else:
            ff.wi.kernel[...] = _t(sd[f"{p}.layer.1.DenseReluDense.wi.weight"])
        ff.wo.kernel[...] = _t(sd[f"{p}.layer.1.DenseReluDense.wo.weight"])
    model.final_norm.weight[...] = _a(sd["encoder.final_layer_norm.weight"])


def load_torchvision_vgg16(model, state_dict=None, weights_path=None) -> None:
    """Populate a `models.vgg.VGG16` from torchvision vgg16 weights.

    Provide either a state_dict (mapping) or a path to a torch checkpoint.
    Conv weights (out, in, kh, kw) -> (kh, kw, in, out); the classifier fc
    weights transpose directly because our flatten follows torch's CHW order
    (models/vgg.py).
    """
    if state_dict is None:
        import torch

        if weights_path is not None:
            state_dict = torch.load(weights_path, map_location="cpu")
        else:
            import torchvision

            state_dict = torchvision.models.vgg16(pretrained=True).state_dict()
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    conv_indices = [k.split(".")[1] for k in sd if k.startswith("features") and k.endswith("weight")]
    conv_indices = sorted(set(int(i) for i in conv_indices))
    assert len(conv_indices) == len(model.convs), (len(conv_indices), len(model.convs))
    for our_conv, idx in zip(model.convs, conv_indices):
        w = sd[f"features.{idx}.weight"]  # (out, in, kh, kw)
        our_conv.kernel[...] = jnp.asarray(w.transpose(2, 3, 1, 0))
        our_conv.bias[...] = jnp.asarray(sd[f"features.{idx}.bias"])

    model.fc1.kernel[...] = _t(sd["classifier.0.weight"])
    model.fc1.bias[...] = _a(sd["classifier.0.bias"])
    model.fc2.kernel[...] = _t(sd["classifier.3.weight"])
    model.fc2.bias[...] = _a(sd["classifier.3.bias"])


def _walk_basic_convs(module, prefix=""):
    """Yield (torchvision_prefix, BasicConv2d) pairs by walking the module
    tree — attribute names in `models.inception` mirror torchvision's
    exactly, so the walked path IS the state_dict prefix."""
    from muse_maskgit_pytorch_tpu.models.inception import BasicConv2d

    for name, child in vars(module).items():
        if name.startswith("_"):
            continue
        path = f"{prefix}.{name}" if prefix else name
        if isinstance(child, BasicConv2d):
            yield path, child
        elif hasattr(child, "__dict__") and not isinstance(child, (int, float, str, tuple, list, dict)):
            yield from _walk_basic_convs(child, path)


def load_torchvision_inception_v3(model, state_dict=None, weights_path=None) -> None:
    """Populate a `models.inception.InceptionV3` from torchvision
    `inception_v3` weights (the standard FID tower).

    Conv weights (out, in, kh, kw) -> (kh, kw, in, out); BatchNorm
    {weight, bias, running_mean, running_var} map to the module's stored
    inference statistics. Aux-classifier (`AuxLogits.*`) and `fc.*` entries
    are ignored — FID's pool3 features never reach them.
    """
    if state_dict is None:
        import torch

        if weights_path is not None:
            state_dict = torch.load(weights_path, map_location="cpu")
        else:
            import torchvision

            state_dict = torchvision.models.inception_v3(pretrained=True).state_dict()
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    n_loaded = 0
    for path, conv in _walk_basic_convs(model):
        w = sd[f"{path}.conv.weight"]  # (out, in, kh, kw)
        conv.conv.kernel[...] = jnp.asarray(w.transpose(2, 3, 1, 0))
        conv.bn_scale[...] = jnp.asarray(sd[f"{path}.bn.weight"])
        conv.bn_bias[...] = jnp.asarray(sd[f"{path}.bn.bias"])
        conv.bn_mean[...] = jnp.asarray(sd[f"{path}.bn.running_mean"])
        conv.bn_var[...] = jnp.asarray(sd[f"{path}.bn.running_var"])
        n_loaded += 1
    assert n_loaded == 94, f"expected 94 BasicConv2d units, walked {n_loaded}"
