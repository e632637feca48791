"""Single-file module checkpointing (msgpack) + Orbax composite train state.

Two tiers, mirroring the reference's two mechanisms (SURVEY.md §5):
  * `save_module` / `load_module` — single-file weights-only save of an NNX
    module, the role of `VQGanVAE.save`/`load` and `MaskGit.save`/`load`
    (reference vqgan_vae.py:413-420, muse_maskgit_pytorch.py:482-489), with
    subtree exclusion for the reference's `remove_vgg` behavior
    (vqgan_vae.py:42-56,405-411).
  * `save_train_state` / `load_train_state` / `latest_step` — Orbax composite
    checkpoints carrying params, EMA, optimizer states, step and PRNG key,
    fixing the reference's lossy trainer checkpoints (its `steps` buffer was
    never saved — trainers.py:253-273).
"""

from __future__ import annotations

import os
import re
import shutil
from pathlib import Path
from typing import Optional, Sequence

import jax
import numpy as np
from flax import nnx
import flax.serialization as ser


def _filter_pure_dict(d, exclude: Sequence[str], _depth=0):
    """Drop top-level keys named in `exclude` (e.g. '_vgg')."""
    return {k: v for k, v in d.items() if k not in exclude}


def _str_keys(tree):
    """msgpack forbids int map keys; nnx.List subtrees index by int."""
    if isinstance(tree, dict):
        return {str(k): _str_keys(v) for k, v in tree.items()}
    return tree


def _unstr_keys(tree):
    if isinstance(tree, dict):
        return {
            (int(k) if isinstance(k, str) and k.isdigit() else k): _unstr_keys(v)
            for k, v in tree.items()
        }
    return tree


def _leaf_to_host(x):
    """Device leaf -> host numpy. A multi-process sharded/replicated leaf
    spans non-addressable devices, where `np.asarray` raises — gather the
    GLOBAL value instead. The gather is a COLLECTIVE: every process must
    reach it in the same order (so `module_state_bytes` runs on all
    processes; only the file write is rank-gated)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def module_state_bytes(module: nnx.Module, exclude: Sequence[str] = ()) -> bytes:
    state = nnx.state(module)
    pure = state.to_pure_dict()
    pure = _filter_pure_dict(pure, exclude)
    pure = jax.tree.map(_leaf_to_host, pure)
    return ser.msgpack_serialize(_str_keys(pure))


def save_module(module: nnx.Module, path, exclude: Sequence[str] = ()) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # all processes serialize (the state gather above is collective);
    # rank 0 writes — concurrent writers on a shared filesystem would race
    # on the same path
    data = module_state_bytes(module, exclude)
    from muse_maskgit_pytorch_tpu.parallel.mesh import is_main_process

    if is_main_process():
        # write-to-tmp + rename: a crash mid-write leaves the old file (or
        # nothing) at the final path, never a truncated checkpoint; os.replace
        # is atomic on POSIX so a concurrent load_module sees old-or-new
        tmp = path.with_name(path.name + ".tmp")
        tmp.write_bytes(data)
        os.replace(tmp, path)
        # leaves recorded only for whole-module saves: with `exclude` the
        # file's contents differ from the live module tree
        _refresh_manifest_entry(path, module if not exclude else None)
    if jax.process_count() > 1:
        # barrier: peers must not load_module(path) before rank 0's rename
        # lands on the shared filesystem
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"save_module:{path.name}")


def load_module(module: nnx.Module, path, exclude: Sequence[str] = ()) -> None:
    path = Path(path)
    assert path.exists(), f"checkpoint not found: {path}"
    verify_manifest(path)  # no-op when no manifest.json sits next to the file
    restored = _unstr_keys(ser.msgpack_restore(path.read_bytes()))
    state = nnx.state(module)
    pure = state.to_pure_dict()
    # keep excluded subtrees (and any missing keys) at current values
    merged = dict(pure)
    for k, v in restored.items():
        if k not in exclude:
            merged[k] = v
    state.replace_by_pure_dict(merged)
    nnx.update(module, state)


# ---------------------------------------------------------------------------
# Checksum manifest — bring-up verification that travels with the files
# ---------------------------------------------------------------------------
# Pretrained-weight conversion happens on a CONNECTED machine where none of
# this repo's tests run (`examples/fetch_and_convert.py`); the manifest is the
# only verification that survives the transport to the zero-egress host. A
# truncated scp / wrong file fails loudly at load time instead of producing
# silently-wrong embeddings.

MANIFEST_NAME = "manifest.json"


def _refresh_manifest_entry(path: Path, module: Optional[nnx.Module]) -> None:
    """Keep an adjacent manifest honest after `save_module` overwrites a file
    it covers: re-saving a fine-tuned module over a bring-up checkpoint must
    not strand a stale sha256 that makes every later `load_module` reject the
    legitimately-updated file. Only touches entries that already exist."""
    import json

    mpath = path.parent / MANIFEST_NAME
    if not mpath.exists():
        return
    try:
        manifest = json.loads(mpath.read_text())
    except (OSError, json.JSONDecodeError):
        return
    try:
        rel = str(path.resolve().relative_to(mpath.parent.resolve()))
    except ValueError:
        rel = path.name
    key = rel if rel in manifest else (path.name if path.name in manifest else None)
    if key is None:
        return
    write_manifest(path.parent, {key: manifest_entry(path, module)})


def manifest_entry(path, module: Optional[nnx.Module] = None) -> dict:
    """sha256 + byte size for a converted checkpoint file, plus per-leaf
    shapes/dtypes when the source `module` is given (human-auditable record of
    what the file contains)."""
    import hashlib

    data = Path(path).read_bytes()
    entry = {"sha256": hashlib.sha256(data).hexdigest(), "bytes": len(data)}
    if module is not None:
        leaves = {}

        def walk(tree, prefix):
            for k, v in sorted(tree.items(), key=lambda kv: str(kv[0])):
                p = f"{prefix}/{k}" if prefix else str(k)
                if isinstance(v, dict):
                    walk(v, p)
                else:
                    a = np.asarray(v)
                    leaves[p] = [list(a.shape), str(a.dtype)]

        walk(_str_keys(nnx.state(module).to_pure_dict()), "")
        entry["leaves"] = leaves
    return entry


def write_manifest(out_dir, entries: dict) -> Path:
    """entries: {file_name: manifest_entry(...)}. Merges into an existing
    manifest so multi-invocation bring-ups (--t5 now, --vgg later) compose."""
    import json

    out = Path(out_dir) / MANIFEST_NAME
    merged = {}
    if out.exists():
        merged = json.loads(out.read_text())
    merged.update(entries)
    tmp = out.with_name(out.name + ".tmp")
    tmp.write_text(json.dumps(merged, indent=1, sort_keys=True))
    os.replace(tmp, out)
    return out


def verify_manifest(path, manifest_path=None, *, require: bool = False) -> bool:
    """Check `path` against the manifest next to it (or `manifest_path`).

    Returns True when verified; False when there is no manifest or no entry
    for this file name (unless `require=True`, which raises instead — use for
    bring-up loads where an unverified file must not be trusted). Any
    size/sha256 mismatch raises ValueError."""
    import hashlib
    import json

    path = Path(path)
    mpath = Path(manifest_path) if manifest_path else path.parent / MANIFEST_NAME
    entry = None
    if mpath.exists():
        manifest = json.loads(mpath.read_text())
        # keys are paths relative to the manifest's directory (subdir files
        # like tokenizer-*/spiece.model) or bare file names
        try:
            rel = str(path.resolve().relative_to(mpath.parent.resolve()))
        except ValueError:
            rel = path.name
        entry = manifest.get(rel, manifest.get(path.name))
    if entry is None:
        if require:
            raise ValueError(f"no manifest entry for {path.name} in {mpath}")
        return False
    data = path.read_bytes()
    if len(data) != entry["bytes"]:
        raise ValueError(
            f"{path.name}: size {len(data)} != manifest {entry['bytes']} "
            "(truncated or wrong file)"
        )
    digest = hashlib.sha256(data).hexdigest()
    if digest != entry["sha256"]:
        raise ValueError(
            f"{path.name}: sha256 {digest[:16]}... != manifest "
            f"{entry['sha256'][:16]}... (corrupt or tampered checkpoint)"
        )
    return True


# ---------------------------------------------------------------------------
# Orbax composite train-state checkpoints
# ---------------------------------------------------------------------------


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


# Orbax async saves block only for the device->host copy, then write to disk
# on a background thread — the train loop resumes while a multi-GB (possibly
# sharded) state serializes. One process-wide AsyncCheckpointer so saves
# serialize against each other and `wait_for_saves` has one place to drain.
_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until all in-flight async checkpoint writes are durable. Call
    before reading a just-written checkpoint in-process and at train end
    (the trainers do both automatically)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


# Finalized checkpoints only: Orbax writes to `step_XXXXXXXX.orbax-checkpoint-
# tmp-<ts>` and renames on commit, so an exact `step_<digits>` name IS durable.
# A process killed mid-save leaves a tmp dir behind — it must neither crash
# step listing (auto_resume) nor be resumed from.
_STEP_RE = re.compile(r"^step_(\d+)$")


def finalized_steps(ckpt_dir) -> list:
    """Sorted list of committed checkpoint steps in `ckpt_dir` (in-flight /
    abandoned Orbax tmp dirs are ignored)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return []
    steps = []
    for p in ckpt_dir.iterdir():
        m = _STEP_RE.match(p.name)
        if m is not None:
            steps.append(int(m.group(1)))
    return sorted(steps)


def save_train_state(
    ckpt_dir, step: int, tree, async_save: bool = False, keep: Optional[int] = None
) -> None:
    """tree: any pytree (params/opt states/ema/step/rng).

    jax.Arrays pass straight to Orbax, which serializes them sharding-aware:
    a multi-device (FSDP) state is written shard-by-shard without first
    gathering 5.8G through one host's RAM — and a multi-host sharded array
    (where `np.asarray` would simply fail) saves correctly with every process
    calling this function. (Replaces the reference's rank-0 `torch.save` of a
    replicated state dict, trainers.py:391-403.)

    async_save=True returns as soon as the state is copied off-device and
    writes on a background thread; donating the same state into the next
    train step is safe immediately (the copy happened), but use
    `wait_for_saves()` before restoring the file or exiting the process.

    keep=N retains only the newest N checkpoints (counting this one): older
    finalized step dirs are pruned after the save is initiated. With
    async_save the single process-wide AsyncCheckpointer has already drained
    any prior in-flight write by the time `save` returns, so every dir the
    prune sees is durable; the in-flight current step still lives under its
    tmp name and is never touched. The retention count is taken over
    FINALIZED steps only — an in-flight async save must not displace a
    durable checkpoint (a crash mid-write would otherwise leave fewer than
    `keep` restorable states); the displaced dir is pruned at the next save,
    once this one has committed."""
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"step_{step:08d}"
    if async_save:
        _async_checkpointer().save(path, tree, force=True)
    else:
        _checkpointer().save(path, tree, force=True)
    if keep is not None:
        prune_checkpoints(ckpt_dir, keep, current_step=step)


def prune_checkpoints(ckpt_dir, keep: int, current_step: Optional[int] = None) -> None:
    """Delete all but the newest `keep` FINALIZED checkpoints (plus
    `current_step`, which may still be an in-flight async write under its
    Orbax tmp name). Counting only finalized dirs means an uncommitted save
    can never displace a durable checkpoint — a crash mid-write always
    leaves `keep` restorable states on disk."""
    assert keep >= 1, f"keep must be >= 1, got {keep}"
    ckpt_dir = Path(ckpt_dir)
    retained = set(finalized_steps(ckpt_dir)[-keep:])
    if current_step is not None:
        retained.add(current_step)
    for s in finalized_steps(ckpt_dir):
        if s not in retained:
            shutil.rmtree(ckpt_dir / f"step_{s:08d}", ignore_errors=True)


def latest_step(ckpt_dir) -> Optional[int]:
    steps = finalized_steps(ckpt_dir)
    return steps[-1] if steps else None


def load_train_state(ckpt_dir, step: Optional[int] = None, target=None, shardings=None):
    """`shardings`: optional pytree of `jax.sharding.Sharding` matching
    `target` — each leaf restores DIRECTLY onto its mesh shards (no
    host-replicated intermediate), so an FSDP state resumes sharded."""
    ckpt_dir = Path(ckpt_dir).absolute()
    if step is None:
        step = latest_step(ckpt_dir)
        assert step is not None, f"no checkpoints in {ckpt_dir}"
    path = ckpt_dir / f"step_{step:08d}"
    if shardings is None:
        restored = _checkpointer().restore(path, item=target)
    else:
        import orbax.checkpoint as ocp

        restore_args = jax.tree.map(
            lambda s: ocp.ArrayRestoreArgs(sharding=s, restore_type=jax.Array),
            shardings,
            is_leaf=lambda x: isinstance(x, jax.sharding.Sharding),
        )
        restored = _checkpointer().restore(
            path, item=target, restore_args=restore_args
        )
    return restored, step
