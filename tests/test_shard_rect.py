"""Aspect-bucketed rectangular data pipeline: v2 shard grid metadata,
bucketed train_from_shards (one static shape per bucket), rect ImageDataset,
and the tokenize_dataset.py bucketing CLI.

The model side (3-D (b, fh, fw) ids -> resized positional grid) landed in r3;
this pins the DATA side that feeds it (VERDICT r4 item 3). Reference anchor:
the reference trains square-only (trainers.py:85-113); rectangular training
is a beyond-reference feature gated by models/maskgit.py's grid contract."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.models import t5 as t5mod
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
from muse_maskgit_pytorch_tpu.models.t5 import T5Config
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
from muse_maskgit_pytorch_tpu.training.data import ImageDataset
from muse_maskgit_pytorch_tpu.training.shard_loader import (
    ShardLoader,
    read_shard_header,
    write_shard,
)
from muse_maskgit_pytorch_tpu.training.trainers import MaskGitTrainer

TINY_T5 = "test/tiny-t5"
if TINY_T5 not in t5mod.T5_CONFIGS:
    t5mod.T5_CONFIGS[TINY_T5] = T5Config(32, 64, 2, 16, 2, True)


def test_v2_shard_roundtrip(tmp_path):
    tokens = np.arange(5 * 24, dtype=np.int32).reshape(5, 24)
    path = tmp_path / "rect.bin"
    write_shard(path, tokens, grid=(3, 8))

    hdr = read_shard_header(path)
    assert hdr == {"num_seqs": 5, "seq_len": 24, "grid": (3, 8)}

    loader = ShardLoader([path], batch_size=5, seed=0, num_threads=1)
    assert loader.grid == (3, 8) and loader.seq_len == 24
    batch = loader.next_batch()
    # same rows, shuffled: sort by first element to compare content
    np.testing.assert_array_equal(
        batch[np.argsort(batch[:, 0])], tokens
    )
    loader.close()


def test_v1_shard_reports_no_grid(tmp_path):
    tokens = np.zeros((3, 16), np.int32)
    path = tmp_path / "flat.bin"
    write_shard(path, tokens)  # v1: no grid metadata
    assert read_shard_header(path)["grid"] is None
    loader = ShardLoader([path], batch_size=3, seed=0, num_threads=1)
    assert loader.grid is None
    loader.close()


def test_grid_must_fit_rows(tmp_path):
    with pytest.raises(ValueError):
        write_shard(tmp_path / "bad.bin", np.zeros((2, 16), np.int32), grid=(5, 5))


def test_one_loader_rejects_mixed_grids(tmp_path):
    """One loader = one static shape: same seq_len but different grids must
    be split into separate buckets, never silently mixed."""
    write_shard(tmp_path / "a.bin", np.zeros((4, 16), np.int32), grid=(2, 8))
    write_shard(tmp_path / "b.bin", np.zeros((4, 16), np.int32), grid=(4, 4))
    with pytest.raises(ValueError):
        ShardLoader([tmp_path / "a.bin", tmp_path / "b.bin"], batch_size=2)


def _rect_trainer(tmp_path, folder, **kw):
    return MaskGitTrainer(
        MaskGit(
            image_size=16,
            transformer=MaskGitTransformer(
                num_tokens=32, dim=32, seq_len=16, depth=1,
                dim_head=16, heads=2, t5_name=TINY_T5, rngs=nnx.Rngs(0),
            ),
        ),
        batch_size=4,
        results_folder=str(tmp_path / folder),
        use_ema=False,
        **kw,
    )


def _two_buckets(tmp_path):
    """Bucket A: 8 rows of (2, 8) grids; bucket B: 12 rows of (4, 8) grids
    (different seq_len -> different compiled step shapes)."""
    rng = np.random.default_rng(0)
    a = rng.integers(0, 32, size=(8, 16)).astype(np.int32)
    b = rng.integers(0, 32, size=(12, 32)).astype(np.int32)
    pa, pb = tmp_path / "a.bin", tmp_path / "b.bin"
    write_shard(pa, a, grid=(2, 8), captions=[f"wide {i}" for i in range(8)])
    write_shard(pb, b, grid=(4, 8), captions=[f"tall {i}" for i in range(12)])
    return [pa, pb]


def test_bucketed_training_two_grids(tmp_path):
    """Mixed-grid shard lists group into per-bucket loaders; every step
    trains one bucket's (b, fh, fw) ids under its own static shape."""
    paths = _two_buckets(tmp_path)
    t = _rect_trainer(tmp_path, "run", num_train_steps=4, save_model_every=10**9)
    losses = []
    t.train_from_shards(
        paths, use_captions=True, loader_seed=3, num_threads=1,
        log_fn=lambda logs: losses.append(logs["loss"]),
    )
    assert t.steps == 4 and len(losses) == 4
    assert all(np.isfinite(l) for l in losses)

    # the seeded schedule is public contract: replaying it must visit both
    # buckets within these 4 steps (weights 8/20 and 12/20, seed 3)
    sched = np.random.default_rng(3)
    draws = [int(sched.choice(2, p=[8 / 20, 12 / 20])) for _ in range(4)]
    assert set(draws) == {0, 1}


def test_bucketed_resume_matches_uninterrupted(tmp_path):
    """Crash/restart mid-run: the replayed bucket schedule + per-bucket skip
    counts continue the EXACT data stream — the resumed run's remaining
    losses equal the uninterrupted run's (num_threads=1 determinism)."""
    paths = _two_buckets(tmp_path)

    straight = []
    t1 = _rect_trainer(tmp_path, "s", num_train_steps=6, save_model_every=10**9)
    t1.train_from_shards(
        paths, use_captions=True, loader_seed=5, num_threads=1,
        log_fn=lambda logs: straight.append(logs["loss"]),
    )

    t2 = _rect_trainer(tmp_path, "r", num_train_steps=3, save_model_every=1)
    t2.train_from_shards(paths, use_captions=True, loader_seed=5, num_threads=1)
    assert t2.steps == 3
    t3 = _rect_trainer(tmp_path, "r", num_train_steps=6, auto_resume=True,
                       save_model_every=10**9)
    assert t3.steps == 3
    resumed = []
    t3.train_from_shards(
        paths, use_captions=True, loader_seed=5, num_threads=1,
        log_fn=lambda logs: resumed.append(logs["loss"]),
    )
    np.testing.assert_allclose(resumed, straight[3:], rtol=1e-5)


def test_rect_grid_with_paired_cond(tmp_path):
    """v2 grid composes with the paired super-res layout: each row carries
    [fh*fw target ids ++ cond ids]; the trainer splits the cond suffix FIRST,
    then reshapes the target to the grid (the header check only requires
    grid_h*grid_w <= seq_len for exactly this reason)."""
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 32, size=(10, 20)).astype(np.int32)  # 16 target + 4 cond
    p = tmp_path / "paired_rect.bin"
    write_shard(p, rows, grid=(2, 8))
    assert read_shard_header(p) == {"num_seqs": 10, "seq_len": 20, "grid": (2, 8)}

    t = _rect_trainer(tmp_path, "pc", num_train_steps=2, save_model_every=10**9)
    losses = []
    t.train_from_shards(
        [p], cond_token_len=4, num_threads=1,
        log_fn=lambda logs: losses.append(logs["loss"]),
    )
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_image_dataset_rect(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for i, (w, h) in enumerate([(64, 40), (30, 50), (48, 48)]):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img{i}.png")

    ds = ImageDataset(tmp_path, (32, 48), random_flip=False)
    for i in range(3):
        assert ds[i].shape == (32, 48, 3)
        assert ds[i].dtype == np.float32

    # square int still follows the reference's short-side semantics
    ds_sq = ImageDataset(tmp_path, 32, random_flip=False)
    assert ds_sq[0].shape == (32, 32, 3)


@pytest.mark.slow
def test_tokenize_cli_auto_bucket(tmp_path):
    """examples/tokenize_dataset.py --auto-bucket: wide and tall images land
    in different buckets, each shard carrying its grid metadata."""
    from PIL import Image

    from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        w, h = (64, 32) if i % 2 == 0 else (32, 64)
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img{i}.png")
        (folder / f"img{i}.txt").write_text(f"caption {i}")

    vae = VQGanVAE(dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False,
                   rngs=nnx.Rngs(0))
    ckpt = tmp_path / "vae.msgpack"
    vae.save(ckpt)

    repo = Path(__file__).resolve().parents[1]
    out = tmp_path / "tokens" / "shard"
    res = subprocess.run(
        [
            sys.executable, str(repo / "examples" / "tokenize_dataset.py"),
            "--folder", str(folder), "--vae-checkpoint", str(ckpt),
            "--vae-dim", "16", "--vae-layers", "2", "--codebook-size", "32",
            "--image-size", "16x16", "--auto-bucket", "2",
            "--batch-size", "2", "--captions", "--out-prefix", str(out),
        ],
        capture_output=True, text=True, timeout=420,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "HF_HUB_OFFLINE": "1"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    shards = sorted((tmp_path / "tokens").glob("*.bin"))
    assert len(shards) == 2, [s.name for s in shards]
    grids = sorted(read_shard_header(s)["grid"] for s in shards)
    # VAE divisor 4 at ~16x16 area: one wide bucket, one tall bucket
    assert grids[0][0] < grids[0][1] and grids[1][0] > grids[1][1], grids
    for s in shards:  # captions sidecar rode along
        assert s.with_name(s.name + ".captions").exists()


def test_bucket_smaller_than_batch_fails_loudly(tmp_path):
    """A bucket with fewer sequences than batch_size can never fill its
    static shape (the native loader's drop_last still yields a PARTIAL batch
    after the epoch wrap) — train_from_shards must reject it at open time,
    not surprise the jitted step with a new shape mid-run."""
    rng = np.random.default_rng(0)
    big = rng.integers(0, 32, size=(8, 16)).astype(np.int32)
    tiny = rng.integers(0, 32, size=(2, 32)).astype(np.int32)  # < batch_size 4
    pa, pb = tmp_path / "big.bin", tmp_path / "tiny.bin"
    write_shard(pa, big, grid=(2, 8))
    write_shard(pb, tiny, grid=(4, 8))
    t = _rect_trainer(tmp_path, "run-tiny", num_train_steps=2, save_model_every=10**9)
    with pytest.raises(ValueError, match="fewer than batch_size"):
        t.train_from_shards([pa, pb], loader_seed=3, num_threads=1)
