from muse_maskgit_pytorch_tpu.ops.attention import attend, xla_attention
from muse_maskgit_pytorch_tpu.ops.vq import (
    nearest_code,
    nearest_code_pallas,
    nearest_code_xla,
)
