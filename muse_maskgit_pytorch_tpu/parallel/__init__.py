from muse_maskgit_pytorch_tpu.parallel.mesh import (
    DATA_AXIS,
    TENSOR_AXIS,
    FSDP_AXIS,
    DEFAULT_TP_RULES,
    create_mesh,
    shard_batch,
    shard_tree,
    replicate,
    partition_specs_for,
    is_main_process,
    init_distributed,
)
