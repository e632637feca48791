"""Toy-scale run of the full text->pixels semantic demo (VERDICT r4 item 1;
examples/e2e_demo.py) on the CPU mesh: dataset on disk -> VQGanVAE from the
folder -> caption shards -> MaskGit via train_from_shards -> generate ->
PIXEL-space assertions. The full-scale TPU numbers live in BASELINE.md r5
(caption match 1.000 / uncond 0.06 / shuffled-vs-original 0.0); this pins
the same qualitative gates at a scale the suite can afford.

Reference anchor: the end-to-end workflow the reference documents as its
purpose (/root/reference/README.md:19-135) but never tests."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
from e2e_demo import run_demo  # noqa: E402


@pytest.mark.slow
def test_text_to_pixels_semantics(tmp_path):
    report = run_demo(
        tmp_path / "demo",
        image_size=24,
        n_images=256,
        vae_steps=1200,
        maskgit_steps=1500,
        vae_dim=24,
        codebook_size=256,
        mg_dim=96,
        mg_depth=2,
        batch_size=32,
        gen_per_caption=2,
        timesteps=6,
        seed=0,
        log=lambda *a: None,
    )
    # the VAE must reconstruct well enough that the pixel readout works
    # (sanity floor, not a quality bar: chance is 1/16; this seed measures
    # 0.766 at the suite's 24px/1200-step toy scale, r5)
    assert report["recon_classifier_match"] >= 0.7, report
    # generated pixels MEAN what the prompt said...
    assert report["caption_match"] >= 0.6, report
    # ...which is conditioning, not dataset bias: unconditional is ~chance
    assert report["unconditional_match"] <= report["caption_match"] - 0.3, report
    # ...and the model follows the caption GIVEN, so shuffled captions
    # collapse the match against the original prompts
    assert report["shuffled_match_vs_original"] <= 0.25, report
    assert (tmp_path / "demo" / "samples.png").exists()
