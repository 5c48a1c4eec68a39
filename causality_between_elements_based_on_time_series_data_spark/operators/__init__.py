from .asof import asof_lookup
from .dedup import dedup_exact, lsh_candidate_pairs, minhash_signatures, simhash64
from .ivf import ivf_cosine_topk
from .multimodal import decode_raw_rgb, to_media_table, to_raw_rgb_media
from .similarity import brute_force_cosine_topk, lsh_cosine_topk
from .skew import salted_agg
from .tensorize import steps_from_timestamps, tensorize
from .upsert import merge_upsert, scd2_apply

__all__ = [
    "asof_lookup",
    "brute_force_cosine_topk",
    "decode_raw_rgb",
    "dedup_exact",
    "ivf_cosine_topk",
    "lsh_candidate_pairs",
    "lsh_cosine_topk",
    "merge_upsert",
    "minhash_signatures",
    "salted_agg",
    "scd2_apply",
    "simhash64",
    "steps_from_timestamps",
    "tensorize",
    "to_media_table",
    "to_raw_rgb_media",
]
