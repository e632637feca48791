"""Torch restatement of the reference MaskGit math, as a parity oracle.

The reference's pip deps are not installed here, so the original cannot run;
this fixture re-implements its documented equations (citations below are into
`/root/reference/muse_maskgit_pytorch/muse_maskgit_pytorch.py`) as pure
functions over a weights dict, so an identical-weights, identical-noise run
can be compared token-for-token with this framework's `lax.scan` decoder.
Noise is injected (torch/JAX PRNGs are incompatible — SURVEY.md §7 hard
part 2).
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def layer_norm_g(x, gamma):
    """Bias-free LayerNorm (:63-70)."""
    return F.layer_norm(x, x.shape[-1:], gamma, torch.zeros_like(gamma))


def geglu_ff(x, w):
    """LN -> Linear -> GEGLU -> LN -> Linear (:72-89)."""
    x = layer_norm_g(x, w["norm_gamma"])
    x = x @ w["w_in"]
    a, gate = x.chunk(2, dim=-1)
    x = gate * F.gelu(a)
    x = layer_norm_g(x, w["norm_inner_gamma"])
    return x @ w["w_out"]


def l2norm(t):
    return F.normalize(t, dim=-1)


def attention(x, w, heads, context=None, context_mask=None, scale=8.0):
    """qk-l2norm attention with one null KV per head (:91-162)."""
    b, n, _ = x.shape
    x = layer_norm_g(x, w["norm_gamma"])
    kv_input = context if context is not None else x

    q = x @ w["wq"]
    k, v = (kv_input @ w["wkv"]).chunk(2, dim=-1)
    d = q.shape[-1] // heads

    def split_heads(t):
        return t.reshape(b, -1, heads, d).permute(0, 2, 1, 3)

    q, k, v = map(split_heads, (q, k, v))

    nk, nv = w["null_kv"]  # (heads, 1, d) each
    nk = nk.unsqueeze(0).expand(b, -1, -1, -1)
    nv = nv.unsqueeze(0).expand(b, -1, -1, -1)
    k = torch.cat([nk, k], dim=-2)
    v = torch.cat([nv, v], dim=-2)

    q = l2norm(q) * w["q_scale"]
    k = l2norm(k) * w["k_scale"]

    sim = torch.einsum("bhid,bhjd->bhij", q, k) * scale
    if context_mask is not None:
        cm = F.pad(context_mask, (1, 0), value=True)  # null position (:155-157)
        sim = sim.masked_fill(~cm[:, None, None, :], -torch.finfo(sim.dtype).max)
    attn = sim.softmax(dim=-1)
    out = torch.einsum("bhij,bhjd->bhid", attn, v)
    out = out.permute(0, 2, 1, 3).reshape(b, n, heads * d)
    return out @ w["w_out"]


def transformer_forward(ids, text_embeds, w, heads, context_mask=None,
                        conditioning_token_ids=None):
    """Token transformer forward (:279-348), cond_drop handled by the caller
    zeroing `context_mask` (:308-310); conditioning image tokens join the
    cross-attn context with an always-True mask (:312-318)."""
    b, n = ids.shape
    context = text_embeds @ w["text_proj"] if w.get("text_proj") is not None else text_embeds
    if context_mask is None:
        context_mask = (text_embeds != 0).any(dim=-1)

    if conditioning_token_ids is not None:
        cond_flat = conditioning_token_ids.reshape(b, -1)
        cond_emb = w["token_emb"][cond_flat]
        context = torch.cat([context, cond_emb], dim=-2)
        context_mask = F.pad(context_mask, (0, cond_flat.shape[-1]), value=True)

    x = w["token_emb"][ids] + w["pos_emb"][:n]
    for layer in w["layers"]:
        x = attention(x, layer["self_attn"], heads) + x
        x = attention(x, layer["cross_attn"], heads, context=context, context_mask=context_mask) + x
        x = geglu_ff(x, layer["ff"]) + x
    x = layer_norm_g(x, w["final_norm_gamma"])
    return x @ w["to_logits"]


def forward_with_cond_scale(ids, text_embeds, w, heads, cond_scale,
                            conditioning_token_ids=None):
    """CFG: two sequential forwards, null = zeroed TEXT mask (:240-259);
    conditioning tokens stay attendable in the null pass (:308-318)."""
    logits = transformer_forward(
        ids, text_embeds, w, heads, conditioning_token_ids=conditioning_token_ids
    )
    if cond_scale == 1:
        return logits
    null_mask = torch.zeros(text_embeds.shape[:2], dtype=torch.bool)
    null_logits = transformer_forward(
        ids, text_embeds, w, heads, context_mask=null_mask,
        conditioning_token_ids=conditioning_token_ids,
    )
    return null_logits + (logits - null_logits) * cond_scale


def top_k(logits, thres=0.9):
    """(:413-418)."""
    k = math.ceil((1 - thres) * logits.shape[-1])
    val, ind = logits.topk(k, dim=-1)
    probs = torch.full_like(logits, float("-inf"))
    probs.scatter_(2, ind, val)
    return probs


def reference_generate_loop(
    w,
    heads,
    text_embeds,
    gumbel_noise,  # (timesteps, b, seq_len, vocab) pre-drawn
    mask_id,
    seq_len,
    timesteps=8,
    cond_scale=3.0,
    temperature=1.0,
    topk_filter_thres=0.9,
):
    """The reference's iterative decode (:491-621) with injected noise."""
    b = text_embeds.shape[0]
    ids = torch.full((b, seq_len), mask_id, dtype=torch.long)
    scores = torch.zeros((b, seq_len), dtype=torch.float32)

    for step, (t, steps_until_x0) in enumerate(
        zip(torch.linspace(0, 1, timesteps), reversed(range(timesteps)))
    ):
        rand_mask_prob = math.cos(float(t) * math.pi * 0.5)  # (:422-423)
        num_token_masked = max(int(rand_mask_prob * seq_len), 1)  # (:559)

        masked_indices = scores.topk(num_token_masked, dim=-1).indices  # (:561)
        ids = ids.scatter(1, masked_indices, mask_id)  # (:563)

        logits = forward_with_cond_scale(ids, text_embeds, w, heads, cond_scale)

        filtered = top_k(logits, topk_filter_thres)  # (:576)
        temp = temperature * (steps_until_x0 / timesteps)  # (:578)
        noised = filtered / max(temp, 1e-10) + gumbel_noise[step]  # (:403-411)
        pred_ids = noised.argmax(dim=-1)

        is_mask = ids == mask_id
        ids = torch.where(is_mask, pred_ids, ids)  # (:582-588)

        probs = logits.softmax(dim=-1)  # (:602-606)
        scores = 1 - probs.gather(2, pred_ids[..., None])[..., 0]
        scores = scores.masked_fill(~is_mask, -1e5)  # (:608)

    return ids


def weights_from_jax(transformer) -> dict:
    """Extract a torch weights dict from our NNX MaskGitTransformer."""

    def t(x):
        return torch.tensor(np.asarray(x, np.float32))

    w = {
        "token_emb": t(transformer.token_emb.embedding[...]),
        "pos_emb": t(transformer.pos_emb.embedding[...]),
        "to_logits": t(transformer.to_logits.kernel[...]),
        "final_norm_gamma": t(transformer.transformer_blocks.norm.gamma[...]),
        "text_proj": (
            t(transformer.text_embed_proj.kernel[...])
            if transformer.text_embed_proj is not None
            else None
        ),
        "layers": [],
    }

    def attn_w(a):
        return {
            "norm_gamma": t(a.norm.gamma[...]),
            "wq": t(a.to_q.kernel[...]),
            "wkv": t(a.to_kv.kernel[...]),
            "w_out": t(a.to_out.kernel[...]),
            "null_kv": t(a.null_kv[...]),
            "q_scale": t(a.q_scale[...]),
            "k_scale": t(a.k_scale[...]),
        }

    def ff_w(f):
        return {
            "norm_gamma": t(f.norm.gamma[...]),
            "w_in": t(f.proj_in.kernel[...]),
            "norm_inner_gamma": t(f.norm_inner.gamma[...]),
            "w_out": t(f.proj_out.kernel[...]),
        }

    for self_attn, cross_attn, ff in transformer.transformer_blocks.layers:
        w["layers"].append(
            {
                "self_attn": attn_w(self_attn),
                "cross_attn": attn_w(cross_attn),
                "ff": ff_w(ff),
            }
        )
    return w
