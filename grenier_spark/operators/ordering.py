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
    # the ``ord`` domain tag keeps this chain independent of every other
    # md5(id...) hash in the engine — in particular splits.mixture_resample's
    # keep-hash: without the tag, a same-seed mixture's surviving fractional
    # replicas (keep-hash < threshold) would BE the lowest order keys and
    # cluster at the front of the "uniform" shuffle
    parts = [F.col(id_col).cast("string")]
    if rep_col is not None:
        parts += [F.lit(":"), F.col(rep_col).cast("string")]
    parts += [F.lit(f":ord{seed}")]
    return F.substring(F.md5(F.concat(*parts)), 1, 16)


def _order_hex_sql(id_expr: str, seed: int, rep_expr: "str | None") -> str:
    mid = f" || ':' || {rep_expr}::VARCHAR" if rep_expr is not None else ""
    return f"substr(md5({id_expr}::VARCHAR{mid} || ':ord{seed}'), 1, 16)"


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


# -- weighted stride interleaving -------------------------------------------

_STRIDE_SCALE = 2**20


def _strides(weights: "dict[str, float]", default_weight: float):
    def one(w):
        if w <= 0:
            raise ValueError(
                "interleave weight must be > 0 (drop a source with "
                "mixture_resample weight 0 instead)")
        return max(1, round(_STRIDE_SCALE / w))
    return {s: one(w) for s, w in weights.items()}, one(default_weight)


def stride_interleave(df: DataFrame, weights: "dict[str, float]",
                      source_col: str = "source", id_col: str = "doc_id",
                      rep_col: "str | None" = None,
                      default_weight: float = 1.0, seed: int = 0,
                      rank_buckets: "int | None" = None) -> DataFrame:
    """Deterministic curriculum interleaving: sorting by the returned
    ``pos`` yields a stream where source i appears every ~1/w_i positions
    UNIFORMLY — any prefix of P stride units holds exactly
    ``floor(P / stride_i)`` docs of source i (stride scheduling), unlike the
    hash shuffle whose mixing holds only in expectation. Within a source,
    docs run in seeded-hash order (a per-epoch shuffle of the source).

    ``pos = rank_within_source * stride_s`` with
    ``stride_s = round(2^20 / w_s)`` — strides are Python-computed integer
    LITERALS, the rank is a row_number window, so the position is exact
    64-bit arithmetic on both engines (no float comparisons). Positions
    stay in int64 while ``n_docs(source) * stride < 2^63`` — at stride
    2^20 that is 8.7e12 docs per unit-weight source, above the 10^12-doc
    design point; raise the weight floor rather than _STRIDE_SCALE if a
    source must sit below w ~ 1e-6.

    Cost: ONE hash Exchange (the per-source window). The global sort by
    ``pos`` is the consumer's (writer's) range shuffle, same as
    ``shuffle_order``'s contract. Ties cannot happen across sources at
    co-prime-ish strides but ARE possible (equal strides); sort consumers
    should tie-break on (pos, {source_col}, {id_col}).

    SKEW AT SCALE: a plain per-source window ranks each source on ONE
    task — fatal when a single source holds 10^12 rows. Pass
    ``rank_buckets=B`` to switch to an exact two-pass rank: the seeded
    hash's top 32 bits split every source into B hex-RANGE buckets (so
    bucket order == hash order), local row_numbers run per
    (source, bucket) — B-way parallel per source — and the driver
    broadcasts the per-bucket prefix-count offsets (B x n_sources tiny
    rows). The positions are IDENTICAL to the single-window path
    (asserted in tests); only the physical rank computation changes.
    """
    from pyspark.sql import Window

    per_src, dstride = _strides(weights, default_weight)
    stride_c = F.lit(dstride)
    for s, st in per_src.items():
        stride_c = F.when(F.col(source_col) == s, F.lit(st)).otherwise(
            stride_c)
    h = _order_hex(id_col, seed, rep_col)
    order = [h.asc(), F.col(id_col).asc()]
    if rep_col is not None:
        order.append(F.col(rep_col).asc())

    if rank_buckets is None:
        w = Window.partitionBy(source_col).orderBy(*order)
        return df.withColumn(
            "pos",
            (F.row_number().over(w).cast("long") * stride_c.cast("long")))

    if not 1 <= rank_buckets <= (1 << 20):
        # two constraints: hi32 * rank_buckets must fit int64 (wraps
        # negative past 2^31, silently diverging bucket order from hash
        # order), and pass 1 collects n_sources * rank_buckets occupancy
        # rows to the driver — 2^20 buckets * ~100 sources is ~10^8 rows,
        # already the practical driver-memory ceiling. 2^20-way
        # parallelism per source covers the 10^12-row design point
        # (~10^6 rows/bucket); beyond that, shard the source upstream.
        raise ValueError(
            "rank_buckets must be in [1, 2^20] (pass 1 collects "
            "n_sources * rank_buckets occupancy rows to the driver)")
    hi32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    bucketed = df.withColumn(
        "_rbkt", F.shiftright(hi32 * F.lit(rank_buckets), 32).cast("long"))
    # pass 1: bucket occupancy -> prefix offsets per source, in bucket
    # (== hash) order; tiny (n_sources * B rows), computed on the driver
    counts = (bucketed.groupBy(source_col, "_rbkt")
              .agg(F.count(F.lit(1)).alias("_n")).collect())
    by_src: dict = {}
    for r in counts:
        by_src.setdefault(r[source_col], {})[r["_rbkt"]] = r["_n"]
    off_rows = []
    for s, bkts in by_src.items():
        run = 0
        for b in sorted(bkts):
            off_rows.append((s, b, run))
            run += bkts[b]
    # offsets schema mirrors the REAL source-column type (an int source
    # column would crash a hardcoded string schema); simpleString() keeps
    # nested/decimal types intact
    src_type = df.schema[source_col].dataType.simpleString()
    offsets = df.sparkSession.createDataFrame(
        off_rows, schema=f"_osrc {src_type}, _orbkt long, _off long")
    # pass 2: local rank within (source, bucket) + broadcast offset.
    # NULL-SAFE source equality: a NULL source is a legitimate window
    # partition on the single-window path, so the bucketed rewrite must
    # keep those rows too, not drop them in a null-unsafe inner join
    w = Window.partitionBy(source_col, "_rbkt").orderBy(*order)
    return (bucketed
            .join(F.broadcast(offsets),
                  F.col(source_col).eqNullSafe(F.col("_osrc"))
                  & (F.col("_rbkt") == F.col("_orbkt")))
            .withColumn("pos",
                        ((F.row_number().over(w).cast("long") + F.col("_off"))
                         * stride_c.cast("long")))
            .drop("_rbkt", "_osrc", "_orbkt", "_off"))


def stride_interleave_sql(table_sql: str, weights: "dict[str, float]",
                          source_col: str = "source", id_col: str = "doc_id",
                          rep_expr: "str | None" = None,
                          default_weight: float = 1.0, seed: int = 0,
                          cols: str = "*") -> str:
    """DuckDB twin: identical stride literals, identical window order."""
    from .splits import _case_or_literal

    per_src, dstride = _strides(weights, default_weight)
    case = _case_or_literal(
        [f"WHEN {source_col} = '{s}' THEN {st}"
         for s, st in per_src.items()], str(dstride))
    h = _order_hex_sql(id_expr=id_col, seed=seed, rep_expr=rep_expr)
    tie = f", {rep_expr}" if rep_expr is not None else ""
    return f"""
SELECT {cols},
       (row_number() OVER (PARTITION BY {source_col}
                           ORDER BY {h}, {id_col}{tie}))::BIGINT
       * ({case})::BIGINT AS pos
FROM ({table_sql}) t"""


# -- sharded corpus writer --------------------------------------------------

def _footer_shard_stats(path: str) -> "list[dict]":
    """Per-shard (n_rows, min/max order_key) from parquet FOOTERS only —
    pyarrow metadata, zero data pages read. Raises if any file lacks
    order_key min/max statistics (writers always emit them for plain
    string columns; absence means the file wasn't written by this
    pipeline)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for d in sorted(glob.glob(os.path.join(path, "shard=*")),
                    key=lambda p: int(p.rsplit("=", 1)[1])):
        n_rows, mins, maxs = 0, [], []
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            n_rows += md.num_rows
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in (rg.column(i) for i in range(rg.num_columns)):
                    if c.path_in_schema == "order_key":
                        st = c.statistics
                        if st is None or not st.has_min_max:
                            raise RuntimeError(
                                f"{f} row group {g} lacks order_key "
                                "min/max statistics")
                        mins.append(st.min)
                        maxs.append(st.max)
        out.append({"shard": int(d.rsplit("=", 1)[1]), "n_rows": n_rows,
                    "min_key": min(mins), "max_key": max(maxs)})
    return out


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          token_col: "str | None" = None,
                          stats: str = "scan") -> dict:
    """Write a shuffled corpus (``shuffle_order`` output) as
    ``shard=K/`` parquet directories plus an atomic ``_manifest.json``.

    The ONE shuffle of the pipeline happens here: repartition on the
    precomputed ``shard`` column (deterministic hash of a small int — no
    sampled range partitioner, so task retries and re-runs produce the
    identical layout) + ``sortWithinPartitions(shard, order_key)`` so every
    shard file is internally in training order; reading shard dirs in
    shard order replays the exact global shuffle.

    The manifest is computed FROM THE WRITTEN FILES — deliberately: it
    certifies the bytes on disk, not the plan that wrote them. Two modes:
    ``stats="scan"`` (default) re-reads the ``order_key`` column (~16
    bytes/row, one narrow scan) and can also sum ``token_col``;
    ``stats="footer"`` reads ONLY parquet row-group footers via pyarrow
    (zero data pages — the at-scale mode; local/NFS paths, and
    ``token_col`` sums are unavailable because footers don't store sums).
    Both produce identical n_rows/min/max (asserted in tests). It is
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

    if stats not in ("scan", "footer"):
        raise ValueError("stats must be 'scan' or 'footer'")
    if stats == "footer":
        if token_col is not None:
            raise ValueError("token_col sums need stats='scan' "
                             "(footers carry no sums)")
        shard_stats = _footer_shard_stats(path)
    else:
        spark = df.sparkSession
        written = spark.read.parquet(path)
        aggs = [F.count(F.lit(1)).alias("n_rows"),
                F.min("order_key").alias("min_key"),
                F.max("order_key").alias("max_key")]
        if token_col is not None:
            aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
        shard_stats = [r.asDict() for r in
                       (written.groupBy("shard").agg(*aggs)
                        .orderBy("shard").collect())]  # KB-sized
    manifest = {"n_shards": n_shards, "token_col": token_col,
                "shards": shard_stats}
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
