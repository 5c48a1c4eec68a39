from .arrays import cosine_similarity, det_vector, dot_product, dot_with_const, l2_norm
from .scalar import sigmoid, sigmoid_cross_entropy, softmax_over
from .text import punct_count, stopword_hits, token_count

__all__ = [
    "cosine_similarity",
    "det_vector",
    "dot_product",
    "dot_with_const",
    "l2_norm",
    "punct_count",
    "sigmoid",
    "sigmoid_cross_entropy",
    "softmax_over",
    "stopword_hits",
    "token_count",
]
