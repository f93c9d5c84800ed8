"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget batches.

LLM training consumes documents in batches bounded by a token budget
(sequence packing); the pipeline-side job is a DETERMINISTIC, distributed
assignment doc -> (batch_id, offset) that downstream loaders can replay.
Two strategies, each one shuffle on the group column:

* ``pack_greedy_contiguous`` — docs in ``order_col`` order fill batches
  contiguously; a doc that would overflow the budget starts the next
  batch. This is the streaming-order packing a sequential loader performs;
  the running-capacity recursion is solved per group with a numpy
  batch-boundary scan (one ``searchsorted`` per BATCH, not per doc) in an
  Arrow-batched grouped map.
* ``pack_fixed_chunks`` — batch = ``floor(cumulative_tokens / budget)``:
  docs are split across chunk boundaries (the loss-less "concat then
  chunk" regime of GPT-style pretraining, where a document may straddle
  two sequences). Emits the straddle flag per doc.

At 100 TB both are a single window pass per group partition: the window
runs inside one Exchange keyed on the group column, and groups (sources /
shards) are the parallelism unit — the same partitioning discipline as
``operators.sessions``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_fixed_chunks(df: DataFrame, budget: int,
                      group_col: str = "source",
                      order_col: str = "doc_id",
                      ntok_col: str = "n_tok") -> DataFrame:
    """Concat-then-chunk packing: per group, docs ordered by ``order_col``
    form one token stream; chunk ``i`` holds stream positions
    ``[i*budget, (i+1)*budget)``. Returns the input columns plus

    * ``tok_start`` — the doc's first token's stream offset
    * ``batch_id`` — chunk of ``tok_start``
    * ``end_batch_id`` — chunk of the doc's LAST token
    * ``straddles`` — doc crosses a chunk boundary

    Pure window plan: one cumulative sum over the group partition.
    ``order_col`` ties: the explicit ROWS frame makes peers accumulate
    one-by-one (the default RANGE frame would give tied rows the SAME
    cumulative sum — overlapping token offsets that no longer tile the
    stream); WHICH peer packs first is engine-chosen, so use a unique
    order key when byte-stable output matters (every caller here does).
    """
    w = (Window.partitionBy(group_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum(ntok_col).over(w) - F.col(ntok_col)).alias("tok_start")
    out = df.withColumn("tok_start", start)
    return (out
            .withColumn("batch_id",
                        F.floor(F.col("tok_start") / budget).cast("long"))
            # greatest() pins a ZERO-token doc's last chunk to its first
            # chunk: without it the numerator tok_start + n_tok - 1 goes
            # negative for a zero-token doc at stream position 0 and
            # floor(-1/budget) = -1 (DuckDB's // truncates toward zero and
            # would emit 0 — a cross-engine gate breaker on empty docs)
            .withColumn("end_batch_id",
                        F.greatest(
                            F.col("batch_id"),
                            F.floor((F.col("tok_start") + F.col(ntok_col)
                                     - 1) / budget).cast("long")))
            .withColumn("straddles",
                        F.col("end_batch_id") > F.col("batch_id")))


def pack_greedy_contiguous(df: DataFrame, budget: int,
                           group_col: str = "source",
                           order_col: str = "doc_id",
                           ntok_col: str = "n_tok") -> DataFrame:
    """Greedy whole-doc packing: per group, docs in ``order_col`` order go
    into the current batch while they fit; a doc that would overflow opens
    the next batch. Docs longer than ``budget`` get a batch of their own
    (they can never fit — same contract as a loader that truncates them).

    The recursion ``fill' = fill + n if fill + n <= budget else n`` is not
    a plain window sum, but over the PREFIX-SUM domain a batch is just a
    maximal run of docs whose cumulative sum stays within ``start +
    budget`` — so the whole group packs with ONE ``np.searchsorted`` per
    BATCH over the cumsum array (not per doc: a group of D docs in B
    batches costs B·log D, and every per-doc quantity falls out of
    vectorized indexing). Runs as an Arrow-batched grouped map: one
    Exchange on the group column, groups (sources / shards) are the
    parallelism unit. Group cardinality bounds the in-memory arrays
    (documents per source shard); for groups too large for one worker,
    pre-chunk with :func:`pack_fixed_chunks` on a super-budget first.

    Returns (group, order, n_tok, batch_id, fill_after) rows.
    """
    import numpy as np
    import pandas as pd

    g_t = df.schema[group_col].dataType.simpleString()
    id_t = df.schema[order_col].dataType.simpleString()
    schema = (f"{group_col} {g_t}, {order_col} {id_t}, "
              f"{ntok_col} long, batch_id long, fill_after long")

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # same order as the old array_sort(struct(o, n)) fold: by order
        # col, ties by token count (order col is normally unique)
        pdf = pdf.sort_values([order_col, ntok_col], kind="mergesort")
        n = pdf[ntok_col].fillna(0).to_numpy(dtype=np.int64)
        cum = np.cumsum(n)
        batch = np.empty(len(n), dtype=np.int64)
        j, b = 0, 0
        while j < len(n):
            before = int(cum[j - 1]) if j else 0
            # largest e with cum[e-1] <= before + budget: docs j..e-1 fit
            e = int(np.searchsorted(cum, before + budget, side="right"))
            # max(): a doc alone exceeding the budget gets its own batch;
            # and a NEGATIVE n_tok (corrupt row) makes cum non-monotonic,
            # where searchsorted may return e < j — without the clamp the
            # cursor moves backwards and the executor loops forever
            e = max(e, j + 1)
            batch[j:e] = b
            b += 1
            j = e
        starts = np.flatnonzero(np.diff(batch, prepend=-1))
        batch_before = np.where(starts > 0, cum[starts - 1], 0)
        fill_after = cum - batch_before[batch]
        return pd.DataFrame({
            group_col: pdf[group_col].to_numpy(),
            order_col: pdf[order_col].to_numpy(),
            ntok_col: n, "batch_id": batch, "fill_after": fill_after})

    return df.groupBy(group_col).applyInPandas(pack, schema)


def sliding_windows(df: DataFrame, max_len: int, stride: int,
                    ntok_col: str = "n_tok") -> DataFrame:
    """Per-doc sliding context windows — the BERT/long-doc splitting move
    (Devlin et al. 2019 §A; every LLM SFT pipeline's long-sample rule):
    window ``j`` covers token positions ``[j*stride, j*stride + max_len)``
    with the LAST window clamped to end exactly at ``n_tok``, so every
    token is covered, INTERIOR neighbours overlap by exactly
    ``max_len - stride`` (the clamped final window may overlap its
    predecessor by more), and no window hangs past the doc.

    * ``n_tok <= max_len``     -> one window ``[0, n_tok)``
    * else ``n_windows = ceil((n_tok - max_len) / stride) + 1`` and
      ``win_start(j) = min(j * stride, n_tok - max_len)``

    Returns the input rows exploded to (.., win_idx, win_start, win_len);
    docs with ``n_tok <= 0`` emit no windows. Pure JVM integer arithmetic
    in the scan stage (transform + posexplode, zero shuffle, zero Python)
    with an exact DuckDB twin (:func:`sliding_windows_sql`). ``stride >
    max_len`` would leave token gaps — fail loudly instead.
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")
    if max_len < stride:
        raise ValueError("max_len must be >= stride (gaps otherwise)")
    n = F.col(ntok_col).cast("long")
    # true 64-bit integer division (SQL DIV), matching DuckDB's // exactly
    # at any magnitude — Column `/` would be IEEE double division
    ceil_div = F.expr(
        f"(CAST(`{ntok_col}` AS BIGINT) - {max_len} + {stride - 1}) "
        f"DIV {stride}")
    n_win = (F.when(n <= 0, F.lit(0)).when(n <= max_len, F.lit(1))
             .otherwise(ceil_div + 1)
             .cast("long"))
    # greatest(..., 0): the single-window branch has n - max_len <= 0
    start = lambda j: F.greatest(  # noqa: E731
        F.least(j * stride, n - max_len), F.lit(0))
    wins = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda j: F.struct(
            start(j).cast("long").alias("s"),
            F.least(F.lit(max_len), n - start(j)).cast("long").alias("l")))
    wins = F.when(n_win >= 1, wins).otherwise(
        F.array().cast("array<struct<s:bigint,l:bigint>>"))
    return (df.select("*", F.posexplode(wins).alias("win_idx", "_win"))
            .select("*",
                    F.col("_win.s").alias("win_start"),
                    F.col("_win.l").alias("win_len"))
            .drop("_win")
            .withColumn("win_idx", F.col("win_idx").cast("long")))


def sliding_windows_sql(table_sql: str, max_len: int, stride: int,
                        ntok_col: str = "n_tok",
                        cols: str = "*") -> str:
    """DuckDB twin of :func:`sliding_windows`: same window count, clamped
    starts and lengths in pure integer arithmetic."""
    return f"""
SELECT {cols},
       j::BIGINT AS win_idx,
       greatest(least(j * {stride}, {ntok_col} - {max_len}), 0)::BIGINT
         AS win_start,
       least({max_len}, {ntok_col}
             - greatest(least(j * {stride}, {ntok_col} - {max_len}), 0))
         ::BIGINT AS win_len
FROM (
  SELECT t.*, unnest(range(
    CASE WHEN {ntok_col} <= 0 THEN 0
         WHEN {ntok_col} <= {max_len} THEN 1
         ELSE ({ntok_col} - {max_len} + {stride} - 1) // {stride} + 1
    END)) AS j
  FROM ({table_sql}) t)"""
