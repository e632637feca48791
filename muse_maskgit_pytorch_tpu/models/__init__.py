from muse_maskgit_pytorch_tpu.models.vqgan_vae import (
    VQGanVAE,
    ResnetEncDec,
    Discriminator,
)
from muse_maskgit_pytorch_tpu.models.quantizers import LFQ, VectorQuantizeEMA
from muse_maskgit_pytorch_tpu.models.transformer import (
    Transformer,
    MaskGitTransformer,
    TokenCritic,
    SelfCritic,
    Attention,
    FeedForward,
    LayerNorm,
    TransformerBlocks,
)
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit, Muse
from muse_maskgit_pytorch_tpu.models.t5 import (
    T5Encoder,
    t5_encode_text,
    t5_encode_text_with_mask,
    get_encoded_dim,
    DEFAULT_T5_NAME,
    MAX_LENGTH,
)
from muse_maskgit_pytorch_tpu.models.vgg import VGG16
