"""Deterministic global shuffle for training order.

After mixing (splits.mixture_resample) and before packing, a training
pipeline needs a global shuffle that is (a) reproducible — re-running the
job, retrying a task, or resuming from checkpoint must yield the SAME
example order, or data-parallel ranks disagree about what step N contains;
(b) seedable per epoch; and (c) cheap at 100 TB — a true global sort of
10^12 rows is one giant range-exchange, so the order key must be computable
in the scan stage and the shard layout must let downstream consumers read
shards independently.

Mechanism (pure JVM, zero Exchange):

* ``order_key`` = first 16 hex digits of ``md5(id[:rep]:seed)`` — a
  fixed-width lowercase hex string whose lexicographic order IS unsigned
  64-bit numeric order, so "sort by order_key" is a uniform deterministic
  shuffle of the corpus (Fisher–Yates in expectation; md5 collisions at
  10^12 docs are ~3e-8 per corpus and only perturb adjacent order).
* ``shard`` = ``(hi32(order_key) * n_shards) >> 32`` — exact integer
  arithmetic on the TOP 32 hash bits, so shard boundaries are equal slices
  of the hash space: shard assignment agrees with order_key ranges
  (shard 0 holds the lowest keys), shards are balanced to binomial
  deviation, and BOTH engines compute the same integer with no floats.

The trainer's contract: read shards in shard order, each shard sorted by
order_key — that equals the one global order, but each shard is an
independent sort of ~1/n_shards of the data (repartition on the
already-computed ``shard`` column + sortWithinPartitions; no sampled
range-partitioner, whose boundaries are nondeterministic across runs).

Reference analog: grenier's jump-hash assigns stable buckets for
relocation-minimal scaling (jmphash/jmphash.mli:6-17); here stability
across RUNS (not across resizes) is the contract, so a seeded md5 slice —
already the engine's cross-engine-exact chain — is the right hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _order_hex(id_col: str, seed: int, rep_col: "str | None") -> Column:
    parts = [F.col(id_col).cast("string")]
    if rep_col is not None:
        parts += [F.lit(":"), F.col(rep_col).cast("string")]
    parts += [F.lit(f":{seed}")]
    return F.substring(F.md5(F.concat(*parts)), 1, 16)


def _order_hex_sql(id_expr: str, seed: int, rep_expr: "str | None") -> str:
    mid = f" || ':' || {rep_expr}::VARCHAR" if rep_expr is not None else ""
    return f"substr(md5({id_expr}::VARCHAR{mid} || ':{seed}'), 1, 16)"


def shuffle_order(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                  rep_col: "str | None" = None, seed: int = 0) -> DataFrame:
    """Adds ``order_key`` (16-hex-digit global shuffle key) and ``shard``
    (long in [0, n_shards)). Pass ``rep_col`` when upstream mixture
    replication emitted duplicate ids, so each replica lands at its own
    position. Narrow projection — composes with any downstream
    ``repartition('shard').sortWithinPartitions('order_key')`` writer."""
    if not 1 <= n_shards <= 2**31:
        raise ValueError("n_shards must be in [1, 2^31]")
    h = _order_hex(id_col, seed, rep_col)
    hi32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return (df.withColumn("order_key", h)
            .withColumn("shard",
                        F.shiftright(hi32 * F.lit(n_shards), 32)
                        .cast("long")))


def shuffle_order_sql(id_expr: str, n_shards: int, seed: int = 0,
                      rep_expr: "str | None" = None
                      ) -> "tuple[str, str]":
    """DuckDB twins of (order_key, shard): same md5 slice, same top-32-bit
    integer arithmetic (``// 2^32`` == arithmetic shift for nonnegative)."""
    h = _order_hex_sql(id_expr, seed, rep_expr)
    hi32 = f"('0x' || substr({h}, 1, 8))::BIGINT"
    return h, f"(({hi32}) * {n_shards}) // 4294967296"


# -- sharded corpus writer --------------------------------------------------

def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          token_col: "str | None" = None) -> dict:
    """Write a shuffled corpus (``shuffle_order`` output) as
    ``shard=K/`` parquet directories plus an atomic ``_manifest.json``.

    The ONE shuffle of the pipeline happens here: repartition on the
    precomputed ``shard`` column (deterministic hash of a small int — no
    sampled range partitioner, so task retries and re-runs produce the
    identical layout) + ``sortWithinPartitions(shard, order_key)`` so every
    shard file is internally in training order; reading shard dirs in
    shard order replays the exact global shuffle.

    The manifest is computed FROM THE WRITTEN FILES (a metadata-cheap
    re-read: counts come from parquet row-group footers, min/max from the
    order_key column only), so it certifies the bytes on disk, and it is
    committed atomically AFTER the data — a crash mid-write leaves data
    dirs without a manifest, which :func:`read_training_shards` treats as
    "no table", the same orphan-is-invisible discipline as
    plans/checkpoint.py. Returns the manifest dict."""
    import json
    import os
    import uuid

    for c in ("shard", "order_key"):
        if c not in df.columns:
            raise ValueError(f"df must carry '{c}' (run shuffle_order first)")
    (df.repartition(n_shards, F.col("shard"))
       .sortWithinPartitions("shard", "order_key")
       .write.partitionBy("shard").mode("error").parquet(path))

    spark = df.sparkSession
    written = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows"),
            F.min("order_key").alias("min_key"),
            F.max("order_key").alias("max_key")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    stats = (written.groupBy("shard").agg(*aggs)
             .orderBy("shard").collect())  # n_shards KB-sized rows
    manifest = {"n_shards": n_shards, "token_col": token_col,
                "shards": [r.asDict() for r in stats]}
    tmp = os.path.join(path, f"_manifest.json.tmp.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=int)
    os.replace(tmp, os.path.join(path, "_manifest.json"))
    return manifest


def read_training_shards(spark, path: str, verify: bool = True) -> DataFrame:
    """Read a sharded corpus; with ``verify`` (default), recount rows per
    shard from parquet metadata and fail LOUDLY on any mismatch with the
    manifest — a lost/truncated shard file must not silently shorten an
    epoch. Returns the frame with its ``shard`` partition column."""
    import json
    import os

    mpath = os.path.join(path, "_manifest.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{path} has no _manifest.json — incomplete/crashed write")
    df = spark.read.parquet(path)
    if verify:
        manifest = json.load(open(mpath))
        want = {int(s["shard"]): s["n_rows"] for s in manifest["shards"]}
        got = {r["shard"]: r["n"] for r in
               df.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
        if {int(k): v for k, v in got.items()} != want:
            raise RuntimeError(
                f"shard row counts diverge from manifest: {got} != {want}")
    return df
