"""Exponential moving average of a parameter pytree.

Replaces `ema_pytorch.EMA` (reference trainers.py:24,232-236,358-359):
shadow copy with `beta=0.995`, `update_after_step`, `update_every` semantics,
implemented as a pure pytree transform so it lives INSIDE the jitted train
step (the reference calls `.update()` from host python every step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # real copies: the shadow tree must not alias the online buffers, or
    # buffer donation in the jitted step would donate the same buffer twice
    return jax.tree.map(lambda x: jnp.array(x, copy=True), params)


def ema_update(
    ema_params,
    params,
    step,
    beta: float = 0.995,
    update_after_step: int = 0,
    update_every: int = 1,
):
    """Returns updated ema tree. `step` may be traced.

    ema_pytorch semantics: before `update_after_step` the shadow copies the
    online params; afterwards it lerps with decay `beta`, every
    `update_every` steps.
    """
    step = jnp.asarray(step)
    should_update = (step % update_every) == 0
    warm = step > update_after_step
    decay = jnp.where(warm, beta, 0.0)

    def lerp(e, p):
        new = e * decay + p.astype(e.dtype) * (1.0 - decay)
        return jnp.where(should_update, new, e)

    return jax.tree.map(lerp, ema_params, params)
