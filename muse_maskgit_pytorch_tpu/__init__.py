"""muse_maskgit_pytorch_tpu — TPU-native Muse / MaskGit text-to-image.

Public API mirrors the reference package exports
(`/root/reference/muse_maskgit_pytorch/__init__.py:1-4`): `VQGanVAE`,
`Transformer`, `MaskGit`, `Muse`, `MaskGitTransformer`, `TokenCritic`,
`VQGanVAETrainer` — plus the framework-native extras (`SelfCritic`, `FSQ`, `LFQ`,
`VectorQuantizeEMA`, `MaskGitTrainer`, sharding helpers).
"""

from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
from muse_maskgit_pytorch_tpu.models.transformer import (
    Transformer,
    MaskGitTransformer,
    TokenCritic,
    SelfCritic,
)
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit, Muse
from muse_maskgit_pytorch_tpu.models.quantizers import FSQ, LFQ, VectorQuantizeEMA
from muse_maskgit_pytorch_tpu.training.trainers import VQGanVAETrainer, MaskGitTrainer
from muse_maskgit_pytorch_tpu.serving import (
    ExportedPipeline,
    GeneratePipeline,
    export_pipeline,
    load_exported_pipeline,
)
from muse_maskgit_pytorch_tpu.serving_http import GenerateServer
from muse_maskgit_pytorch_tpu.utils.eval import (
    FeatureStats,
    compute_feature_stats,
    fid_score,
    frechet_distance,
    make_inception_extractor,
    make_vgg_extractor,
)

__version__ = "0.1.0"

__all__ = [
    "VQGanVAE",
    "Transformer",
    "MaskGitTransformer",
    "TokenCritic",
    "SelfCritic",
    "MaskGit",
    "Muse",
    "FSQ",
    "LFQ",
    "VectorQuantizeEMA",
    "VQGanVAETrainer",
    "MaskGitTrainer",
    "GeneratePipeline",
    "ExportedPipeline",
    "export_pipeline",
    "load_exported_pipeline",
    "GenerateServer",
    "FeatureStats",
    "compute_feature_stats",
    "fid_score",
    "frechet_distance",
    "make_inception_extractor",
    "make_vgg_extractor",
]
