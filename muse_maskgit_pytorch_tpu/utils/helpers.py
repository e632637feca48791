"""Small generic helpers shared across the framework.

Mirrors the tiny helper vocabulary of the reference
(`/root/reference/muse_maskgit_pytorch/muse_maskgit_pytorch.py:26-39`,
`vqgan_vae.py:60-81`, `trainers.py:31-81`) but in a functional JAX setting.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple


def exists(val: Any) -> bool:
    return val is not None


def default(val: Any, d: Any) -> Any:
    if val is not None:
        return val
    return d() if callable(d) else d


def pair(val):
    return val if isinstance(val, tuple) else (val, val)


def cast_tuple(t):
    return t if isinstance(t, (tuple, list)) else (t,)


def pick_and_pop(keys, d: Dict) -> Dict:
    """Pop `keys` out of d into a new dict (reference vqgan_vae.py:60-62)."""
    return {key: d.pop(key) for key in keys}


# kwarg prefix routing — the reference's entire "config system"
# (reference vqgan_vae.py:60-81): `vq_*` kwargs go to the quantizer,
# `encdec_*` kwargs go to the encoder/decoder, etc.

def group_dict_by_key(cond, d: Dict) -> Tuple[Dict, Dict]:
    matched, unmatched = {}, {}
    for key, value in d.items():
        (matched if cond(key) else unmatched)[key] = value
    return matched, unmatched


def string_begins_with(prefix: str, s: str) -> bool:
    return s.startswith(prefix)


def group_by_key_prefix(prefix: str, d: Dict) -> Tuple[Dict, Dict]:
    return group_dict_by_key(partial(string_begins_with, prefix), d)


def groupby_prefix_and_trim(prefix: str, d: Dict) -> Tuple[Dict, Dict]:
    kwargs_with_prefix, kwargs = group_by_key_prefix(prefix, d)
    kwargs_without_prefix = {k[len(prefix):]: v for k, v in kwargs_with_prefix.items()}
    return kwargs_without_prefix, kwargs


def accum_log(log: Dict, new_logs: Dict) -> Dict:
    """Accumulate scalar logs (reference trainers.py:69-73)."""
    for key, new_value in new_logs.items():
        log[key] = log.get(key, 0.0) + new_value
    return log


def find_index(arr, cond):
    """First index matching cond, else None (reference trainers.py:40-44)."""
    for ind, el in enumerate(arr):
        if cond(el):
            return ind
    return None


def find_and_pop(arr, cond, default_val=None):
    """Pop the first matching element (reference trainers.py:46-55)."""
    ind = find_index(arr, cond)
    if ind is not None:
        return arr.pop(ind)
    return default_val() if callable(default_val) else default_val


def eval_decorator(fn):
    """API-parity shim for the reference's `eval_decorator`
    (muse_maskgit_pytorch.py:32-39, vqgan_vae.py:33-40). Torch flips a global
    `training` flag around sampling; in this framework modules are
    functionally pure and train/eval behavior is an explicit `train=` /
    `rng=` argument, so there is no global mode to save and restore — the
    decorator is the identity, kept so reference-shaped code imports cleanly.
    """
    return fn
