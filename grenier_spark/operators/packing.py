"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget batches.

LLM training consumes documents in batches bounded by a token budget
(sequence packing); the pipeline-side job is a DETERMINISTIC, distributed
assignment doc -> (batch_id, offset) that downstream loaders can replay.
Two strategies, both pure JVM window/aggregate plans (no UDFs, one shuffle
on the group column):

* ``pack_greedy_contiguous`` — docs in ``order_col`` order fill batches
  contiguously; a doc that would overflow the budget starts the next
  batch. This is the streaming-order packing a sequential loader performs,
  expressed as a running-capacity recursion.
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
    """
    w = Window.partitionBy(group_col).orderBy(order_col)
    start = (F.sum(ntok_col).over(w) - F.col(ntok_col)).alias("tok_start")
    out = df.withColumn("tok_start", start)
    return (out
            .withColumn("batch_id",
                        F.floor(F.col("tok_start") / budget).cast("long"))
            .withColumn("end_batch_id",
                        F.floor((F.col("tok_start") + F.col(ntok_col) - 1)
                                / budget).cast("long"))
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
    a plain window sum, but it has a closed form over the PREFIX-SUM
    domain: a doc STARTS a new batch iff its greedy fill would overflow,
    and between two consecutive batch starts the fill is just the
    difference of prefix sums. Spark-side we compute it with one
    ``aggregate`` fold over the group's (ordered) token-count array —
    still a single Exchange + per-group linear scan, no Python. Group
    cardinality bounds the array (documents per source shard); for
    groups too large for one array, pre-chunk with
    :func:`pack_fixed_chunks` on a super-budget first.

    Returns (group, order, n_tok, batch_id, fill_after) rows.
    """
    id_t = df.schema[order_col].dataType.simpleString()
    grouped = (df.groupBy(group_col)
               .agg(F.array_sort(F.collect_list(
                   F.struct(F.col(order_col).alias("o"),
                            F.col(ntok_col).alias("n"))))
                   .alias("docs")))
    # fold state: array of (o, n, batch_id, fill_after); batch increments
    # when fill would exceed the budget
    fold = F.aggregate(
        "docs",
        F.expr(f"CAST(array() AS array<struct<o:{id_t},n:long,"
               "batch_id:long,fill_after:long>>)"),
        lambda acc, d: F.concat(
            acc,
            F.array(F.struct(
                d["o"].alias("o"),
                d["n"].cast("long").alias("n"),
                F.when(F.size(acc) == 0, F.lit(0).cast("long"))
                .when(F.element_at(acc, -1)["fill_after"]
                      + d["n"].cast("long") <= F.lit(budget),
                      F.element_at(acc, -1)["batch_id"])
                .otherwise(F.element_at(acc, -1)["batch_id"] + 1)
                .alias("batch_id"),
                F.when((F.size(acc) != 0)
                       & (F.element_at(acc, -1)["fill_after"]
                          + d["n"].cast("long") <= F.lit(budget)),
                       F.element_at(acc, -1)["fill_after"]
                       + d["n"].cast("long"))
                .otherwise(d["n"].cast("long"))
                .alias("fill_after")))))
    packed = grouped.select(group_col, F.explode(fold).alias("p"))
    return packed.select(
        group_col,
        F.col("p.o").alias(order_col),
        F.col("p.n").alias(ntok_col),
        F.col("p.batch_id").alias("batch_id"),
        F.col("p.fill_after").alias("fill_after"))
