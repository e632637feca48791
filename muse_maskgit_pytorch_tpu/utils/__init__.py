from muse_maskgit_pytorch_tpu.utils.helpers import (
    exists,
    default,
    pair,
    cast_tuple,
    group_dict_by_key,
    group_by_key_prefix,
    groupby_prefix_and_trim,
    accum_log,
)
from muse_maskgit_pytorch_tpu.utils.sampling import (
    cosine_schedule,
    linear_schedule,
    NOISE_SCHEDULES,
    log,
    gumbel_noise,
    gumbel_sample,
    top_k,
    uniform,
    prob_mask_like,
    get_mask_subset_prob,
    batch_random_mask,
    mask_by_topk_scores,
)
