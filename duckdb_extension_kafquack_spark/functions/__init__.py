from .hashing import duck_hash64, duck_seeded_md5, spark_hash64, spark_seeded_md5
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "spark_hash64",
    "spark_seeded_md5",
    "duck_hash64",
    "duck_seeded_md5",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
