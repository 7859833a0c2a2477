from .normalize import (  # noqa: F401
    KEY_PUNCT_REGEX,
    brand_model_split,
    merge_last_wins,
    strip_trailing_underscores,
    to_key,
    url_dequery,
    value_unit_concat,
)
from .text import (  # noqa: F401
    char_ngrams,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_ngrams,
)
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401
