"""Native C++ shard loader: build, roundtrip, shuffle determinism, threading."""

import numpy as np
import pytest

from muse_maskgit_pytorch_tpu.training.shard_loader import ShardLoader, write_shard


@pytest.fixture
def shards(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([10, 7, 13]):
        tokens = rng.integers(0, 1000, size=(n, 16), dtype=np.int32)
        p = tmp_path / f"shard{i}.bin"
        write_shard(p, tokens)
        paths.append(p)
    return paths


def test_loader_metadata(shards):
    dl = ShardLoader(shards, batch_size=4, seed=0)
    assert dl.seq_len == 16
    assert dl.num_seqs == 30
    assert dl.batches_per_epoch == 7  # drop_last: 30 // 4
    dl.close()


def test_batches_cover_all_sequences(tmp_path):
    tokens = np.arange(20 * 8, dtype=np.int32).reshape(20, 8)
    p = tmp_path / "s.bin"
    write_shard(p, tokens)
    dl = ShardLoader([p], batch_size=5, seed=1, drop_last=True)
    seen = set()
    for _ in range(4):  # one epoch
        batch = dl.next_batch()
        assert batch.shape == (5, 8)
        for row in batch:
            seen.add(int(row[0]) // 8)
    assert seen == set(range(20))  # every sequence exactly once per epoch
    dl.close()


def test_shuffle_deterministic_per_seed(shards):
    def first_batches(seed):
        dl = ShardLoader(shards, batch_size=4, seed=seed, num_threads=1)
        out = [dl.next_batch().copy() for _ in range(3)]
        dl.close()
        return np.concatenate(out)

    a, b = first_batches(7), first_batches(7)
    np.testing.assert_array_equal(a, b)
    c = first_batches(8)
    assert not np.array_equal(a, c)


def test_epochs_auto_advance(tmp_path):
    write_shard(tmp_path / "s.bin", np.zeros((6, 4), np.int32))
    dl = ShardLoader([tmp_path / "s.bin"], batch_size=4, seed=0)
    for _ in range(10):  # runs past several epoch boundaries without error
        assert dl.next_batch().shape == (4, 4)
    dl.close()


def test_multithreaded_no_duplication_within_epoch(tmp_path):
    n = 64
    tokens = (np.arange(n, dtype=np.int32)[:, None] * np.ones((1, 4), np.int32))
    write_shard(tmp_path / "s.bin", tokens)
    dl = ShardLoader([tmp_path / "s.bin"], batch_size=8, seed=0, num_threads=4)
    ids = []
    for _ in range(n // 8):
        ids.extend(int(r[0]) for r in dl.next_batch())
    assert sorted(ids) == list(range(n))
    dl.close()


def test_rejects_corrupt_shard(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"NOTMAGIC" + b"\0" * 64)
    with pytest.raises(ValueError):
        ShardLoader([p], batch_size=2)


def test_multihost_shard_partitioning(tmp_path):
    """process_index/process_count: each host sees a disjoint shard subset."""
    paths = []
    for i in range(4):
        tokens = np.full((6, 4), i, np.int32)
        p = tmp_path / f"s{i}.bin"
        write_shard(p, tokens)
        paths.append(p)

    seen = []
    for rank in range(2):
        dl = ShardLoader(paths, batch_size=3, seed=0, process_index=rank, process_count=2)
        assert dl.num_seqs == 12  # 2 of 4 shards
        vals = set()
        for _ in range(4):
            vals.update(int(v) for v in dl.next_batch()[:, 0])
        seen.append(vals)
        dl.close()
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == {0, 1, 2, 3}


def test_resume_is_deterministic_mid_epoch(shards):
    """state_dict + skip_batches continues the exact shuffle stream: batch k
    of a resumed loader == batch k of an uninterrupted run (num_threads=1 for
    deterministic delivery order)."""
    full = ShardLoader(shards, batch_size=4, seed=3, num_threads=1)
    reference = [full.next_batch().copy() for _ in range(12)]  # crosses epoch wrap (7/epoch)
    full.close()

    part = ShardLoader(shards, batch_size=4, seed=3, num_threads=1)
    for _ in range(5):
        part.next_batch()
    state = part.state_dict()
    part.close()
    assert state == {"delivered_batches": 5}

    resumed = ShardLoader(
        shards, batch_size=4, seed=3, num_threads=1,
        skip_batches=state["delivered_batches"],
    )
    assert resumed.delivered_batches == 5
    for k in range(5, 12):
        np.testing.assert_array_equal(resumed.next_batch(), reference[k])
    resumed.close()


def test_resume_across_epoch_boundary(tmp_path):
    """Fast-forward replays epoch wraps + reshuffles exactly."""
    rng = np.random.default_rng(1)
    write_shard(tmp_path / "s.bin", rng.integers(0, 99, size=(9, 4), dtype=np.int32))
    full = ShardLoader([tmp_path / "s.bin"], batch_size=2, seed=11, num_threads=1)
    reference = [full.next_batch().copy() for _ in range(10)]  # 4 batches/epoch
    assert full.epoch >= 2
    full.close()

    resumed = ShardLoader(
        [tmp_path / "s.bin"], batch_size=2, seed=11, num_threads=1, skip_batches=6
    )
    for k in range(6, 10):
        np.testing.assert_array_equal(resumed.next_batch(), reference[k])
    resumed.close()


def test_caption_sidecar_roundtrip_and_provenance(tmp_path):
    """next_batch_meta provenance indexes the right rows; captioned() joins
    the sidecar exactly (incl. unicode + embedded newlines)."""
    rng = np.random.default_rng(2)
    paths, all_tokens, all_caps = [], [], []
    for s, n in enumerate([6, 5]):
        tokens = rng.integers(0, 100, size=(n, 4), dtype=np.int32)
        caps = [f"shard{s} row{r}\nsecond line é{r}" for r in range(n)]
        p = tmp_path / f"s{s}.bin"
        write_shard(p, tokens, captions=caps)
        paths.append(p)
        all_tokens.append(tokens)
        all_caps.append(caps)
    assert (tmp_path / "s0.bin.captions").exists()

    dl = ShardLoader(paths, batch_size=3, seed=4, num_threads=1)
    tokens, si, ri = dl.next_batch_meta()
    for r in range(3):
        np.testing.assert_array_equal(tokens[r], all_tokens[si[r]][ri[r]])
    dl.close()

    dl = ShardLoader(paths, batch_size=3, seed=4, num_threads=1)
    it = dl.captioned()
    seen = set()
    for _ in range(3):  # one epoch (drop_last: 11 // 3)
        toks, caps = next(it)
        assert len(caps) == 3
        for r, c in enumerate(caps):
            s = 0 if c.startswith("shard0") else 1
            row = int(c.split("row")[1].split("\n")[0])
            np.testing.assert_array_equal(toks[r], all_tokens[s][row])
            seen.add((s, row))
    assert len(seen) == 9  # no duplicates within the epoch
    dl.close()


def test_caption_store_rejects_missing_sidecar(tmp_path):
    write_shard(tmp_path / "s.bin", np.zeros((4, 4), np.int32))
    from muse_maskgit_pytorch_tpu.training.shard_loader import CaptionStore

    with pytest.raises(FileNotFoundError):
        CaptionStore([tmp_path / "s.bin"])
