"""One-pass dataset profiling and declarative data-quality checks.

A training-data pipeline ingesting 100 TB needs to LOOK at the table before
(and after) every transformation: per-column null rates, distinct counts,
value/length ranges, plus pass/fail constraint gates (completeness,
uniqueness, ranges, allowed value sets) in the style of Deequ/
great-expectations — but engine-native: everything below is ONE wide
aggregate over a single scan (Catalyst plans map-side partial aggregation;
the shuffled state is a few hundred bytes regardless of input size), no
Python anywhere.

Integer discipline: every emitted statistic is integer-derived (counts,
integer min/max, exact BIGINT sums; string columns profile their LENGTHS)
so the cross-engine oracle agrees bit-for-bit — means are
``round(sum/n, 6)`` computed from exact BIGINT sums on both engines.

Exact ``count(distinct)`` per column costs one Expand (rows x n_cols)
before the partial aggregate — fine into the terabytes, and the right
default because it is oracle-exact. At 10^12 rows switch
``approx_distinct_profile``: per-column HLL sketches from the library's
own distributed build (operators/sketch_build.py — token-scale data never
shuffles), one spec per column over the SAME single scan, estimates within
the published 1.04/sqrt(2^p) bound.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["column_profile", "approx_distinct_profile",
           "equidepth_histogram",
           "Check", "completeness", "uniqueness", "in_range", "in_set",
           "min_rows", "run_checks"]

_STRINGY = ("string",)
_INTY = ("tinyint", "smallint", "int", "bigint", "long")


def _value_expr(df: DataFrame, c: str) -> Optional[Column]:
    """The integer the column profiles: its value for integer columns, its
    length for strings, None (no value stats) otherwise."""
    t = dict(df.dtypes)[c]
    if t in _INTY:
        return F.col(c).cast("long")
    if t in _STRINGY:
        return F.length(F.col(c)).cast("long")
    return None


def column_profile(df: DataFrame,
                   columns: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-column stats in one aggregate pass.

    Output (one row per column):
      column, n_rows, n_nulls, n_distinct (exact),
      min_v / max_v / sum_v  — value for integer columns, length for
      strings, -1 for other types (and for all-null columns),
      mean_v — round(sum_v / non-null count, 6), -1.0 when undefined.
    """
    cols = list(columns) if columns is not None else [
        c for c in df.columns]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        v = _value_expr(df, c)
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{i}"))
        if v is not None:
            aggs += [F.min(v).alias(f"__mn_{i}"), F.max(v).alias(f"__mx_{i}"),
                     F.sum(v).alias(f"__sm_{i}")]
        else:
            aggs += [F.lit(None).cast("long").alias(f"__mn_{i}"),
                     F.lit(None).cast("long").alias(f"__mx_{i}"),
                     F.lit(None).cast("long").alias(f"__sm_{i}")]
    one = df.agg(*aggs)

    rows = []
    for i, c in enumerate(cols):
        nn = F.col(f"__nn_{i}")
        rows.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            (F.col("__n") - nn).cast("long").alias("n_nulls"),
            F.col(f"__nd_{i}").cast("long").alias("n_distinct"),
            F.coalesce(F.col(f"__mn_{i}"), F.lit(-1)).cast("long")
            .alias("min_v"),
            F.coalesce(F.col(f"__mx_{i}"), F.lit(-1)).cast("long")
            .alias("max_v"),
            F.coalesce(F.col(f"__sm_{i}"), F.lit(-1)).cast("long")
            .alias("sum_v"),
            F.coalesce(
                F.round(F.col(f"__sm_{i}").cast("double")
                        / nn.cast("double"), 6),
                F.lit(-1.0)).alias("mean_v"),
        ))
    return (one.select(F.explode(F.array(*rows)).alias("s"))
            .select("s.*"))


def approx_distinct_profile(df: DataFrame,
                            columns: Optional[Sequence[str]] = None,
                            p: int = 14) -> DataFrame:
    """Per-column approximate distinct counts via the library's own HLL
    (grenier wire format, reference hll/hll.ml) — the 10^12-row path:
    no Expand, no exact-distinct shuffle; one spec per column over one
    scan. Strings hash to md5-low64 first (same id chain as the
    cross-engine oracles). Output: column, n_rows, approx_distinct."""
    from grenier_spark.functions.estimates import hll_card_col
    from grenier_spark.operators.sketch_build import (SketchSpec,
                                                      build_sketches)

    cols = list(columns) if columns is not None else list(df.columns)
    sel, specs = [], []
    for i, c in enumerate(cols):
        t = dict(df.dtypes)[c]
        if t in _INTY:
            sel.append(F.col(c).cast("long").alias(f"__v_{i}"))
        else:
            sel.append(F.conv(F.substring(F.md5(F.col(c).cast("string")),
                                          1, 16), 16, -10)
                       .cast("long").alias(f"__v_{i}"))
        specs.append(SketchSpec.of(f"col_{i}", "hll", f"__v_{i}", p=p))
    sk = build_sketches(df.select(*sel), specs)
    est = (sk.select("sketch_name", "n_rows",
                     hll_card_col("sketch").alias("approx_distinct")))
    name_map = F.create_map(
        *[x for i, c in enumerate(cols)
          for x in (F.lit(f"col_{i}"), F.lit(c))])
    return est.select(name_map[F.col("sketch_name")].alias("column"),
                      F.col("n_rows").cast("long"),
                      F.col("approx_distinct").cast("double"))


def equidepth_histogram(df: DataFrame, value_col: str, n_buckets: int,
                        group_cols: Optional[Sequence[str]] = None,
                        k: int = 200) -> DataFrame:
    """Equi-depth (equal-height) histogram per group from ONE KLL pass —
    the optimizer-statistics / dashboard surface for columns too large to
    sort: boundaries at the sketch's i/B quantiles, per-bucket counts from
    the sketch's own rank mass scaled by the EXACT row count. NULLs drop
    (they have no place on the value axis).

    Scale shape: values never shuffle (sketch partials are built in the
    scan stage, operators/sketch_build.py); the exchange carries one KB
    blob per group and the histogram explode touches B rows per group.
    Guarantee: each bucket's ``est_count`` is within ~2*eps*n of n/B and
    each boundary's true rank is within eps of i/B (eps ~ 2/k, FOCS'16) —
    gate-asserted in the `value_histogram_kll` driver query.

    Returns (group_cols..., bucket 1..B, lo, hi, est_count, n) rows.
    KLL compaction is order-sensitive: boundaries are deterministic per
    partitioning, estimate-level gated (same contract as the quantile
    surfaces)."""
    from grenier_spark.functions.estimates import kll_histogram_col
    from grenier_spark.operators.sketch_build import (SketchSpec,
                                                      build_sketches)

    gcols = list(group_cols or [])
    src = df.where(F.col(value_col).isNotNull())
    res = build_sketches(src, [SketchSpec.of("h", "kll", value_col, k=k)],
                         group_cols=gcols)
    return (res.select(*gcols, F.col("n_values").alias("n"),
                       F.explode(kll_histogram_col("sketch", n_buckets))
                       .alias("b"))
            .select(*gcols,
                    F.col("b.bucket").alias("bucket"),
                    F.col("b.lo").alias("lo"), F.col("b.hi").alias("hi"),
                    F.col("b.est_count").alias("est_count"),
                    F.col("n").cast("long").alias("n")))


def key_skew_profile(df: DataFrame, col: str, top: int = 20) -> DataFrame:
    """The 'will this key shuffle well?' probe: exact per-key counts
    (one partial-aggregated pass over the rows), then the ``top`` heaviest
    keys with their corpus share and the global skew factor
    ``max_count / mean_count`` — the multiplier the fullest reducer pays
    over the average, i.e. the number AQE skew handling or salting has to
    beat.

    Ranking reuses the salt-split bounded min-K over the KEY-count rows
    (struct(-n, key) ascending == count desc, key asc — deterministic
    ties), so even a column with 10^9 distinct keys never pins a
    row_number window to one task. Output (one row per top key):
    key (string), n_rows, share = round(n/total, 6), rank,
    skew_factor = round(max/mean, 6) (repeated on every row)."""
    from .similarity import _bounded_topk

    counts = (df.groupBy(F.col(col).cast("string").alias("key"))
              .agg(F.count(F.lit(1)).alias("n_rows"))
              .persist())  # consumed by the top-k AND the totals
    totals = counts.agg(
        F.sum("n_rows").alias("__tot"),
        F.count(F.lit(1)).alias("__nk"),
        F.max("n_rows").alias("__mx")).withColumn("__one", F.lit(0))
    ranked = _bounded_topk(
        counts.withColumn("__one", F.lit(0))
        .withColumn("__negn", -F.col("n_rows")),
        "__one", "key", "__negn", top)
    out = (ranked.join(F.broadcast(totals), "__one")
           .select("key",
                   (-F.col("__negn")).cast("long").alias("n_rows"),
                   F.round(-F.col("__negn")
                           / F.col("__tot").cast("double"), 6)
                   .alias("share"),
                   F.col("rank").cast("long").alias("rank"),
                   F.round(F.col("__mx").cast("double")
                           / (F.col("__tot").cast("double")
                              / F.col("__nk").cast("double")), 6)
                   .alias("skew_factor")))
    # the result is <= `top` rows: materialize it eagerly (localCheckpoint
    # truncates the plan) so the per-key counts cache can be released
    # here instead of leaking out of the call
    out = out.localCheckpoint()
    counts.unpersist()
    return out


@dataclass(frozen=True)
class Check:
    """One constraint: ``metric`` is an aggregate Column (BIGINT-valued for
    cross-engine exactness); ``passed`` maps the metric (and n_rows) to the
    verdict."""
    name: str
    metric: Column
    passed: Callable[[Column, Column], Column]


def completeness(col: str) -> Check:
    """metric = null count; passes when zero nulls."""
    m = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
    return Check(f"complete({col})", m, lambda v, n: v == 0)


def uniqueness(col: str) -> Check:
    """metric = n_rows - n_distinct (duplicate surplus); passes at zero.
    NULLs count as rows but not distinct values, so a NULL fails it."""
    m = F.count(F.lit(1)) - F.count_distinct(F.col(col))
    return Check(f"unique({col})", m, lambda v, n: v == 0)


def in_range(col: str, lo: int, hi: int) -> Check:
    """metric = rows outside [lo, hi] (NULL counts as outside)."""
    ok = F.col(col).isNotNull() & F.col(col).between(lo, hi)
    m = F.sum(F.when(ok, 0).otherwise(1))
    return Check(f"range({col},{lo},{hi})", m, lambda v, n: v == 0)


def in_set(col: str, values: Sequence[str]) -> Check:
    """metric = rows with a value outside ``values`` (NULL is outside)."""
    ok = F.col(col).isin(list(values))
    m = F.sum(F.when(ok, 0).otherwise(1))
    vs = ",".join(sorted(str(v) for v in values))
    return Check(f"in_set({col},[{vs}])", m, lambda v, n: v == 0)


def min_rows(n_min: int) -> Check:
    """metric = row count; passes at >= n_min."""
    return Check(f"min_rows({n_min})", F.count(F.lit(1)),
                 lambda v, n: v >= n_min)


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all checks in ONE aggregate pass over one scan.

    Output (one row per check): check, metric BIGINT, passed BOOLEAN.
    All metrics are exact integers, so the verdicts are reproducible on
    any engine — the oracle recomputes both, no float thresholds."""
    checks = list(checks)
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [c.metric.cast("long").alias(f"__m_{i}")
             for i, c in enumerate(checks)]
    one = df.agg(*aggs)
    rows = [F.struct(
        F.lit(c.name).alias("check"),
        F.col(f"__m_{i}").alias("metric"),
        c.passed(F.col(f"__m_{i}"), F.col("__n")).alias("passed"))
        for i, c in enumerate(checks)]
    return (one.select(F.explode(F.array(*rows)).alias("s"))
            .select("s.*"))
