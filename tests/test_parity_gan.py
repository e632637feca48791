"""GAN double-grad parity vs torch (SURVEY.md §7 hard part 1).

The two delicate gradient structures — the R1-style gradient penalty
(grad-of-grad through the discriminator, reference vqgan_vae.py:88-101) and
the adaptive generator weight (per-term grads wrt the last decoder conv,
vqgan_vae.py:517-525) — are property-tested against torch autograd on small
models with IDENTICAL weights on both sides.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from muse_maskgit_pytorch_tpu.models.vqgan_vae import (
    gradient_penalty,
    hinge_discr_loss,
    hinge_gen_loss,
    safe_div,
)


def _conv_pair(seed=0, cin=3, cout=4, k=3):
    """Same conv weights in torch (OIHW) and jax (HWIO)."""
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.3
    b = rng.normal(size=(cout,)).astype(np.float32) * 0.1

    tconv = torch.nn.Conv2d(cin, cout, k, padding=k // 2)
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(w))
        tconv.bias.copy_(torch.tensor(b))

    wj = jnp.asarray(w.transpose(2, 3, 1, 0))  # HWIO
    bj = jnp.asarray(b)

    def jconv(x):  # x: NHWC
        y = jax.lax.conv_general_dilated(
            x, wj, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + bj

    return tconv, jconv


def test_gradient_penalty_matches_torch():
    tconv, jconv = _conv_pair()
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)

    def jdiscr(x):
        return jnp.tanh(jconv(x)).mean(axis=(1, 2, 3), keepdims=True)

    gp_ours = float(gradient_penalty(jnp.asarray(img), jdiscr))

    timg = torch.tensor(img.transpose(0, 3, 1, 2), requires_grad=True)
    tout = torch.tanh(tconv(timg)).mean(dim=(1, 2, 3), keepdim=True)
    grads = torch.autograd.grad(
        outputs=tout, inputs=timg, grad_outputs=torch.ones_like(tout),
        create_graph=True,
    )[0]
    grads = grads.reshape(grads.shape[0], -1)
    gp_ref = float(10 * ((grads.norm(2, dim=1) - 1) ** 2).mean())

    assert np.isclose(gp_ours, gp_ref, rtol=1e-4), (gp_ours, gp_ref)


def test_gradient_penalty_double_backward_matches_torch():
    """d(gp)/d(discriminator weights) — the create_graph=True second order."""
    tconv, jconv = _conv_pair(seed=2)
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)

    # ours: differentiate gp wrt the conv kernel
    w0 = jnp.asarray(
        np.asarray(tconv.weight.detach()).transpose(2, 3, 1, 0)
    )
    b0 = jnp.asarray(np.asarray(tconv.bias.detach()))

    def gp_of_w(w):
        def discr(x):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b0
            return jnp.tanh(y).mean(axis=(1, 2, 3), keepdims=True)

        return gradient_penalty(jnp.asarray(img), discr)

    g_ours = np.asarray(jax.grad(gp_of_w)(w0)).transpose(3, 2, 0, 1)  # -> OIHW

    # torch
    timg = torch.tensor(img.transpose(0, 3, 1, 2), requires_grad=True)
    tout = torch.tanh(tconv(timg)).mean(dim=(1, 2, 3), keepdim=True)
    grads = torch.autograd.grad(
        outputs=tout, inputs=timg, grad_outputs=torch.ones_like(tout),
        create_graph=True,
    )[0].reshape(2, -1)
    gp = 10 * ((grads.norm(2, dim=1) - 1) ** 2).mean()
    gp.backward()
    g_ref = np.asarray(tconv.weight.grad)

    np.testing.assert_allclose(g_ours, g_ref, atol=1e-4, rtol=1e-3)


def test_adaptive_weight_matches_torch():
    """adaptive = ||d perceptual / d w_last|| / ||d gen / d w_last||, clamped
    (reference vqgan_vae.py:517-525) on a miniature decoder+discr stack."""
    rng = np.random.default_rng(4)
    h = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)  # pre-final activations
    w_last = rng.normal(size=(3, 5)).astype(np.float32) * 0.3  # 1x1 conv (out, in)
    target_feats = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)

    tconv_p, jconv_p = _conv_pair(seed=5, cin=3, cout=4)  # "vgg"
    tconv_d, jconv_d = _conv_pair(seed=6, cin=3, cout=1)  # "discriminator"

    # ---- ours
    wj = jnp.asarray(w_last.T)  # (in, out)

    def recon_of_w(w):
        return jnp.einsum("bhwc,co->bhwo", jnp.asarray(h), w)

    def perceptual_of_w(w):
        feats = jconv_p(recon_of_w(w))
        return jnp.mean(jnp.square(feats - jnp.asarray(target_feats)))

    def gen_of_w(w):
        return hinge_gen_loss(jconv_d(recon_of_w(w)))

    g_p = jax.grad(perceptual_of_w)(wj)
    g_g = jax.grad(gen_of_w)(wj)
    ours = float(
        jnp.clip(
            safe_div(jnp.linalg.norm(g_p.reshape(-1)), jnp.linalg.norm(g_g.reshape(-1))),
            max=1e4,
        )
    )

    # ---- torch
    tw = torch.tensor(w_last, requires_grad=True)
    th = torch.tensor(h.transpose(0, 3, 1, 2))  # NCHW, C=5
    recon = torch.einsum("bchw,oc->bohw", th, tw)
    perceptual = ((tconv_p(recon) - torch.tensor(target_feats.transpose(0, 3, 1, 2))) ** 2).mean()
    gen = -tconv_d(recon).mean()

    gp_t = torch.autograd.grad(perceptual, tw, retain_graph=True)[0].norm(p=2)
    gg_t = torch.autograd.grad(gen, tw, retain_graph=True)[0].norm(p=2)
    ref = float((gp_t / gg_t.clamp(min=1e-8)).clamp(max=1e4))

    assert np.isclose(ours, ref, rtol=1e-3), (ours, ref)


def test_hinge_losses_match_torch():
    rng = np.random.default_rng(7)
    fake = rng.normal(size=(4, 5, 5, 1)).astype(np.float32)
    real = rng.normal(size=(4, 5, 5, 1)).astype(np.float32)

    ours_d = float(hinge_discr_loss(jnp.asarray(fake), jnp.asarray(real)))
    ours_g = float(hinge_gen_loss(jnp.asarray(fake)))

    tf, tr = torch.tensor(fake), torch.tensor(real)
    ref_d = float((torch.relu(1 + tf) + torch.relu(1 - tr)).mean())
    ref_g = float(-tf.mean())
    assert np.isclose(ours_d, ref_d, rtol=1e-6)
    assert np.isclose(ours_g, ref_g, rtol=1e-6)
