from .text import TOKEN_PATTERN, tokens, words_exploded
from .vectors import cosine_sim, dot, l2_norm

__all__ = ["TOKEN_PATTERN", "tokens", "words_exploded", "cosine_sim", "dot", "l2_norm"]
