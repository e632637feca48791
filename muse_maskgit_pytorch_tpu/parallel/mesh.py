"""Device mesh + sharding helpers.

TPU-native replacement for the reference's HF-Accelerate/DDP distribution
(`/root/reference/muse_maskgit_pytorch/trainers.py:22,147-159,216-236`):
instead of wrapping the model in DDP and calling NCCL all-reduce in backward
(trainers.py:322), we build a `jax.sharding.Mesh` over the slice, shard the
batch on the `data` axis (and optionally parameters on `tensor`/`fsdp`),
and let XLA emit the collectives over ICI. `jax.process_index()` plays the
role of the Accelerate rank predicates (trainers.py:254,282-292).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TENSOR_AXIS = "tensor"
FSDP_AXIS = "fsdp"


def create_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh. Default: all devices on a single `data` axis.

    `shape` maps axis name -> size; one axis may be -1 (inferred). Example:
    `create_mesh({'data': -1, 'tensor': 2})`.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not shape:
        shape = {DATA_AXIS: n}
    names = tuple(shape.keys())
    sizes = list(shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        assert n % known == 0, f"{n} devices not divisible by {known}"
        sizes[sizes.index(-1)] = n // known
    assert int(np.prod(sizes)) == n, f"mesh {dict(zip(names, sizes))} != {n} devices"
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a host batch with its leading dim sharded over `axis`."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def is_main_process() -> bool:
    """Rank predicate (role of accelerator.is_main_process)."""
    return jax.process_index() == 0


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` (the role of
    Accelerate's process-group setup, reference trainers.py:159). Call once
    per host before building meshes; a no-op if already initialized."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


# ---------------------------------------------------------------------------
# FSDP / ZeRO-style state sharding
# ---------------------------------------------------------------------------


def fsdp_axis_for(mesh: Mesh) -> Optional[str]:
    """The axis train-state shards over: a dedicated `fsdp` axis if the mesh
    has one, else the `data` axis (ZeRO-style: state sharded over the same
    devices that shard the batch)."""
    for ax in (FSDP_AXIS, DATA_AXIS):
        if ax in mesh.shape and mesh.shape[ax] > 1:
            return ax
    return None


def fsdp_partition_specs(
    tree,
    mesh: Mesh,
    axis: Optional[str] = None,
    min_size: int = 16384,
    base_rules=None,
):
    """ZeRO/FSDP partition specs for a train-state pytree: each leaf shards
    its LARGEST evenly-divisible dim over `axis`; small leaves (< `min_size`
    elements — step counters, norms, scales) and leaves with no divisible dim
    replicate. Applied uniformly to params, optimizer moments and EMA (which
    mirror the param shapes, so they land on the same shards).

    `base_rules` (regex TP rules, e.g. `DEFAULT_TP_RULES`) composes tensor
    parallelism with FSDP: a leaf matching a rule keeps its TP dims (when
    they divide) and the fsdp axis shards the largest REMAINING free dim —
    the standard 2D `[fsdp, tensor]` layout for a `{'data': x, 'tensor': y}`
    mesh.

    This replaces what the reference cannot do at all: its distributed story
    replicates the full model+Adam state on every GPU
    (/root/reference/muse_maskgit_pytorch/trainers.py:147-159,322 — DDP).
    Here per-chip state bytes divide by the axis size; XLA's SPMD partitioner
    inserts the all-gathers (params into the forward) and reduce-scatters
    (grads back to shards) over ICI from the shardings alone.
    """
    axis = axis or fsdp_axis_for(mesh)
    if axis is not None:
        assert axis in mesh.shape, f"fsdp axis {axis!r} not in mesh axes {tuple(mesh.shape)}"
    base = partition_specs_for(tree, base_rules) if base_rules else None

    def in_mesh(ax) -> bool:
        axes = ax if isinstance(ax, tuple) else (ax,)
        return all(a in mesh.shape for a in axes)

    def axis_size(ax) -> int:
        if isinstance(ax, tuple):
            return int(np.prod([mesh.shape[a] for a in ax]))
        return mesh.shape[ax]

    def to_spec(parts):
        while parts and parts[-1] is None:
            parts.pop()
        return P(*parts)

    def spec(x, base_spec=None):
        shape = getattr(x, "shape", ())
        parts = [None] * len(shape)
        if base_spec is not None:
            # rules naming axes absent from this mesh replicate (same
            # fall-back contract as partition_specs_for) instead of KeyError
            # — e.g. TP base_rules on a pure-data mesh
            for i, ax in enumerate(tuple(base_spec)[: len(shape)]):
                if ax is not None and in_mesh(ax) and shape[i] % axis_size(ax) == 0:
                    parts[i] = ax
        if axis is None or int(np.prod(shape, initial=1)) < min_size:
            return to_spec(parts)
        n = mesh.shape[axis]
        best, best_dim = -1, -1
        for i, s in enumerate(shape):
            if parts[i] is None and s % n == 0 and s > best:
                best, best_dim = s, i
        if best_dim >= 0:
            parts[best_dim] = axis
        return to_spec(parts)

    if base is None:
        return jax.tree.map(spec, tree)
    return jax.tree.map(spec, tree, base, is_leaf=lambda x: isinstance(x, P))


def state_shardings(tree, mesh: Mesh, axis: Optional[str] = None, base_rules=None):
    """NamedSharding pytree for `fsdp_partition_specs` (jit in/out_shardings)."""
    specs = fsdp_partition_specs(tree, mesh, axis, base_rules=base_rules)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def sharded_state_bytes(tree) -> Tuple[int, int]:
    """(total_bytes, max_per_device_bytes) of a pytree of jax.Arrays —
    the observable FSDP win: per-device ≈ total / axis_size."""
    total, per_dev = 0, 0
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "nbytes"):
            continue
        total += leaf.nbytes
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None:
            shard_elems = int(np.prod(sharding.shard_shape(leaf.shape), initial=1))
            per_dev += shard_elems * leaf.dtype.itemsize
        else:
            per_dev += leaf.nbytes
    return total, per_dev


# ---------------------------------------------------------------------------
# parameter partition rules (tensor parallelism)
# ---------------------------------------------------------------------------

# Default TP rules for the MaskGit transformer: shard attention heads and the
# FF inner dim on the `tensor` axis; embeddings/vocab head sharded on the
# vocab/feature dim. Keys are regexes over '/'-joined state paths.
DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*to_q/kernel$", P(None, TENSOR_AXIS)),
    (r".*to_kv/kernel$", P(None, TENSOR_AXIS)),
    (r".*to_out/kernel$", P(TENSOR_AXIS, None)),
    (r".*proj_in/kernel$", P(None, TENSOR_AXIS)),
    (r".*proj_out/kernel$", P(TENSOR_AXIS, None)),
    (r".*to_logits/kernel$", P(None, TENSOR_AXIS)),
    (r".*token_emb/embedding$", P(TENSOR_AXIS, None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))
        parts.append(str(key))
    return "/".join(parts)


def partition_specs_for(tree, rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    """Map a pytree of arrays to PartitionSpecs via path-regex rules.

    Unmatched leaves are replicated. Rules whose spec does not divide the
    leaf shape fall back to replication (small models on big meshes)."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def assign(path, leaf):
        s = _path_str(path)
        for pat, spec in compiled:
            if pat.match(s):
                if len(spec) <= leaf.ndim:
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(assign, tree)


def shard_tree(tree, mesh: Mesh, rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    """Device-put a pytree with rule-derived shardings over `mesh`."""
    specs = partition_specs_for(tree, rules)

    def put(x, spec):
        # drop specs that don't divide the dims evenly
        fixed = []
        for dim, ax in zip(x.shape, tuple(spec) + (None,) * (x.ndim - len(spec))):
            if ax is None:
                fixed.append(None)
            else:
                size = mesh.shape[ax] if not isinstance(ax, tuple) else int(
                    np.prod([mesh.shape[a] for a in ax])
                )
                fixed.append(ax if dim % size == 0 else None)
        return jax.device_put(x, NamedSharding(mesh, P(*fixed)))

    return jax.tree.map(put, tree, specs)
