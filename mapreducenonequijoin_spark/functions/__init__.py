from .text import shingles_expr, simhash_frame, words_expr
from .vectors import dot_expr

__all__ = ["words_expr", "shingles_expr", "simhash_frame", "dot_expr"]
