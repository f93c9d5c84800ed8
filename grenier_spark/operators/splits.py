"""Deterministic train/val/test splitting and stratified sampling.

A training-data pipeline needs split assignment that is (a) deterministic
per document (re-runs, retries and AQE re-execution must not move a doc
between train and val — ``df.sample`` gives none of that), (b) seedable
(rotating the seed produces a fresh split), and (c) cheap at 100 TB.

Mechanism: ``hash = substr(md5(id || ':' || seed), 1, 16)`` compared
against PRECOMPUTED 16-digit hex thresholds (one per cumulative split
boundary, ``floor(cum_fraction * 2^64)`` rendered as zero-padded lowercase
hex). Fixed-width lowercase-hex string comparison IS unsigned numeric
comparison, so the whole assignment is a md5 + substring + string compare —
pure JVM column expressions in the scan stage, NO shuffle, no UDF, and
bit-identical across engines (the thresholds are Python-computed literals
embedded in both the Spark plan and the DuckDB oracle, so engine float
arithmetic never runs).

At 100 TB: split assignment is a narrow projection fused into the parquet
scan (only the id column is read if downstream prunes); a seeded re-split
touches no state. Expected fractions hold to binomial deviation
(md5 is uniform); exactness-in-expectation is the standard contract for
hash partitioning of web corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_thresholds(weights: "dict[str, float]") -> "list[tuple[str, str]]":
    """[(split_name, upper_hex_threshold_exclusive)] for cumulative weight
    boundaries; the LAST split has no threshold (catches the remainder, so
    rounding can never orphan a row). Weights are normalized to sum 1."""
    names = list(weights)
    if len(names) < 2:
        raise ValueError("need at least 2 splits")
    total = float(sum(weights.values()))
    out, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, format(min(int(cum * 2.0**64), 2**64 - 1), "016x")))
    out.append((names[-1], None))
    return out


def _hash_hex(id_col: str, seed: int) -> Column:
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
        1, 16)


def hash_hex_sql(id_expr: str, seed: int) -> str:
    """DuckDB twin of the Spark hash expression (md5 hex is lowercase on
    both engines; BIGINT::VARCHAR matches Spark's long->string cast)."""
    return f"substr(md5({id_expr}::VARCHAR || ':{seed}'), 1, 16)"


def assign_split(df: DataFrame, weights: "dict[str, float]",
                 id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Adds a ``split`` column: the first split whose cumulative-weight hex
    threshold exceeds the doc's hash (hash < t1 -> split1, ...; remainder ->
    last split). Every row gets exactly one split."""
    h = _hash_hex(id_col, seed)
    expr = None
    for name, thr in split_thresholds(weights):
        if thr is None:
            expr = expr.otherwise(F.lit(name))
        elif expr is None:
            expr = F.when(h < F.lit(thr), F.lit(name))
        else:
            expr = expr.when(h < F.lit(thr), F.lit(name))
    return df.withColumn("split", expr)


def assign_split_sql(id_expr: str, weights: "dict[str, float]",
                     seed: int = 0) -> str:
    """The oracle-side CASE expression with the SAME literal thresholds."""
    h = hash_hex_sql(id_expr, seed)
    parts = []
    for name, thr in split_thresholds(weights):
        if thr is None:
            parts.append(f"ELSE '{name}'")
        else:
            parts.append(f"WHEN {h} < '{thr}' THEN '{name}'")
    return "CASE " + " ".join(parts) + " END"


def stratified_sample(df: DataFrame, fraction: float,
                      id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample: keep iff hash < threshold.
    Retry/AQE-stable (unlike ``df.sample``) and a pure scan-stage filter:
    Catalyst pushes it below projections, so at 100 TB the dropped rows
    never leave the scan."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = format(min(int(fraction * 2.0**64), 2**64 - 1), "016x")
    return df.where(_hash_hex(id_col, seed) < F.lit(thr))


def stratified_sample_sql_pred(id_expr: str, fraction: float,
                               seed: int = 0) -> str:
    thr = format(min(int(fraction * 2.0**64), 2**64 - 1), "016x")
    return f"{hash_hex_sql(id_expr, seed)} < '{thr}'"
