from .asof import asof_lookup
from .dedup import dedup_exact, minhash_signatures, simhash64
from .similarity import brute_force_cosine_topk
from .tensorize import tensorize

__all__ = [
    "asof_lookup",
    "brute_force_cosine_topk",
    "dedup_exact",
    "minhash_signatures",
    "simhash64",
    "tensorize",
]
