"""Checksum manifest (utils/checkpoint.py): bring-up verification that
travels with converted weights (VERDICT r4 item 7).

Conversion runs on a connected machine where none of this repo's tests can
run; the manifest is the only check that survives the transport, so
load_module must fail LOUDLY on a truncated or tampered file."""

import numpy as np
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.utils.checkpoint import (
    MANIFEST_NAME,
    load_module,
    manifest_entry,
    save_module,
    verify_manifest,
    write_manifest,
)


class Tiny(nnx.Module):
    def __init__(self, *, rngs: nnx.Rngs):
        self.lin = nnx.Linear(4, 8, rngs=rngs)


def _write(tmp_path, name="tiny.msgpack"):
    m = Tiny(rngs=nnx.Rngs(0))
    path = tmp_path / name
    save_module(m, path)
    write_manifest(tmp_path, {name: manifest_entry(path, m)})
    return m, path


def test_manifest_roundtrip(tmp_path):
    m, path = _write(tmp_path)
    entry = manifest_entry(path, m)
    assert entry["bytes"] == path.stat().st_size
    # per-leaf shapes recorded for auditability
    assert any(v[0] == [4, 8] for v in entry["leaves"].values()), entry["leaves"]
    assert verify_manifest(path) is True
    fresh = Tiny(rngs=nnx.Rngs(1))
    load_module(fresh, path)  # verifies, then restores
    np.testing.assert_array_equal(
        np.asarray(fresh.lin.kernel[...]), np.asarray(m.lin.kernel[...])
    )


def test_manifest_absent_is_noop(tmp_path):
    m = Tiny(rngs=nnx.Rngs(0))
    path = tmp_path / "plain.msgpack"
    save_module(m, path)  # no manifest written
    assert verify_manifest(path) is False
    load_module(Tiny(rngs=nnx.Rngs(1)), path)  # must not require one
    with pytest.raises(ValueError, match="no manifest entry"):
        verify_manifest(path, require=True)


def test_manifest_detects_tamper_and_truncation(tmp_path):
    _, path = _write(tmp_path)
    blob = bytearray(path.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    path.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="sha256"):
        load_module(Tiny(rngs=nnx.Rngs(1)), path)

    path.write_bytes(bytes(blob[:-7]))  # truncated transport
    with pytest.raises(ValueError, match="size"):
        verify_manifest(path)


def test_manifest_merges_and_keys_by_relpath(tmp_path):
    _, path = _write(tmp_path)
    sub = tmp_path / "tokenizer-x"
    sub.mkdir()
    vocab = sub / "spiece.model"
    vocab.write_bytes(b"not a real sentencepiece model")
    write_manifest(tmp_path, {"tokenizer-x/spiece.model": manifest_entry(vocab)})
    # earlier entries survive the merge; subdir files verify by relative path
    assert verify_manifest(path) is True
    assert verify_manifest(vocab, tmp_path / MANIFEST_NAME) is True
    vocab.write_bytes(b"swapped vocabulary!!")
    with pytest.raises(ValueError):
        verify_manifest(vocab, tmp_path / MANIFEST_NAME)


def test_save_module_refreshes_stale_manifest_entry(tmp_path):
    """Re-saving a module over a manifest-covered file must refresh the
    entry: a fine-tune that overwrites a bring-up checkpoint would otherwise
    strand a stale sha256 and every later load_module would reject the
    legitimately-updated file."""
    m, path = _write(tmp_path)
    # mutate the weights and re-save over the SAME covered path
    m.lin.kernel[...] = m.lin.kernel[...] + 1.0
    save_module(m, path)
    assert verify_manifest(path) is True  # entry refreshed, not stale
    fresh = Tiny(rngs=nnx.Rngs(1))
    load_module(fresh, path)
    np.testing.assert_array_equal(
        np.asarray(fresh.lin.kernel[...]), np.asarray(m.lin.kernel[...])
    )
    # files the manifest does NOT cover stay uncovered (no surprise entries)
    other = tmp_path / "uncovered.msgpack"
    save_module(m, other)
    assert verify_manifest(other) is False
