from mapreduce__spark.functions.vectors import cosine_sim, dot_product, l2_norm
from mapreduce__spark.functions.text import (
    tokenize,
    word_ngrams,
    stopword_hits,
    lang_id_expr,
)

__all__ = [
    "cosine_sim",
    "dot_product",
    "l2_norm",
    "tokenize",
    "word_ngrams",
    "stopword_hits",
    "lang_id_expr",
]
