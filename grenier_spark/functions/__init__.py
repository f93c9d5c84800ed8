"""Spark Column-level functions over 64-bit hashes and sketch states."""

from .hashing import hrw_bucket_col, jump_bucket_col, wang64_col  # noqa: F401
from .estimates import (  # noqa: F401
    bloom_cardinality_col,
    bloom_contains_col,
    cuckoo_contains_col,
    cuckoo_delete_col,
    cuckoo_stats_col,
    cms_query_col,
    csk_f2_col,
    csk_inner_col,
    ddsum_col,
    fd_guarantees_col,
    hll_card_col,
    hll_card_orig_col,
    hll_merge_col,
    kll_quantiles_col,
    kmv_a_not_b_col,
    kmv_est_col,
    kmv_jaccard_col,
    kmv_stats_col,
    moments_col,
    tdigest_quantiles_col,
)
from .aggregates import (  # noqa: F401
    bloom_agg_col,
    cms_agg_col,
    csk_agg_col,
    ddsum_agg_col,
    fd_agg_col,
    hll_agg_col,
    kll_agg_col,
    kmv_agg_col,
    mom_agg_col,
    register_sql_aggregates,
    sketch_agg_col,
    tdigest_agg_col,
)
