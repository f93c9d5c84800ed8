"""Spark Column-level functions over 64-bit hashes and sketch states."""

from .hashing import jump_bucket_col, wang64_col  # noqa: F401
from .estimates import (  # noqa: F401
    bloom_cardinality_col,
    bloom_contains_col,
    cms_query_col,
    ddsum_col,
    hll_card_col,
    hll_card_orig_col,
    hll_merge_col,
    kll_quantiles_col,
    tdigest_quantiles_col,
)
