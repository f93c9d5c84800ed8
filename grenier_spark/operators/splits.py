"""Deterministic train/val/test splitting and stratified sampling.

A training-data pipeline needs split assignment that is (a) deterministic
per document (re-runs, retries and AQE re-execution must not move a doc
between train and val — ``df.sample`` gives none of that), (b) seedable
(rotating the seed produces a fresh split), and (c) cheap at 100 TB.

Mechanism: ``hash = substr(md5(id || '<tag>:' || seed), 1, 16)`` (tag =
``:spl`` for splits, ``:smp`` for sampling — disjoint chains) compared
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
    if any(w < 0 for w in weights.values()):
        # a negative weight silently shifts every later cumulative
        # threshold backwards (unreachable splits) — fail loudly
        raise ValueError("split weights must be >= 0")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    out, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, format(min(int(cum * 2.0**64), 2**64 - 1), "016x")))
    out.append((names[-1], None))
    return out


def _hash_hex(id_col: str, seed: int, tag: str = "") -> Column:
    """``tag`` is the DOMAIN separator (":spl" for splits, ":smp" for
    sampling): without it, same-seed composition of assign_split and
    stratified_sample shares one hash chain, so a 10% sample feeds 100%
    into the lowest-threshold split — the correlation the ':ord'/':mix'/
    ':prio' tags elsewhere exist to prevent."""
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"),
                       F.lit(f"{tag}:{seed}"))),
        1, 16)


def hash_hex_sql(id_expr: str, seed: int, tag: str = "") -> str:
    """DuckDB twin of the Spark hash expression (md5 hex is lowercase on
    both engines; BIGINT::VARCHAR matches Spark's long->string cast)."""
    return f"substr(md5({id_expr}::VARCHAR || '{tag}:{seed}'), 1, 16)"


def assign_split(df: DataFrame, weights: "dict[str, float]",
                 id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Adds a ``split`` column: the first split whose cumulative-weight hex
    threshold exceeds the doc's hash (hash < t1 -> split1, ...; remainder ->
    last split). Every row gets exactly one split."""
    h = _hash_hex(id_col, seed, ":spl")
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
    h = hash_hex_sql(id_expr, seed, ":spl")
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
    return df.where(_hash_hex(id_col, seed, ":smp") < F.lit(thr))


def stratified_sample_sql_pred(id_expr: str, fraction: float,
                               seed: int = 0) -> str:
    thr = format(min(int(fraction * 2.0**64), 2**64 - 1), "016x")
    return f"{hash_hex_sql(id_expr, seed, ':smp')} < '{thr}'"


def quota_sample(df: DataFrame, k: int, group_col: str = "source",
                 id_col: str = "doc_id", seed: int = 0,
                 n_salts: int = 64) -> DataFrame:
    """Exact-quota stratified sample: exactly ``min(k, |group|)`` rows per
    group — the k smallest values of the ``:quo``-tagged hash chain, so
    the draw is seeded, uniform, and retry/AQE-stable (a Bernoulli
    fraction only hits quotas in expectation; curriculum mixtures and
    eval carve-outs want them exact).

    NO per-group window: rides the salt-split two-stage min-K
    (similarity._bounded_topk), so one 10^9-row group spreads over
    ``n_salts`` stage-1 reducers instead of pinning a single
    row_number task — the same skew discipline as the dedup family.

    Output: (group_col, id_col, sample_hash, rank 1..k ordered by the
    hash) — join back on ``id_col`` for payload columns."""
    from .similarity import _bounded_topk

    rows = (df.select(group_col, id_col)
            .withColumn("__qh", _hash_hex(id_col, seed, ":quo")))
    top = _bounded_topk(rows, group_col, id_col, "__qh", k,
                        n_salts=n_salts)
    return top.withColumnRenamed("__qh", "sample_hash")


# -- weighted sampling without replacement (priority sampling) --------------

_P52 = float(1 << 52)  # exact power of two; scaling by it never rounds


def _priority_inputs(id_col: str, weight_col: str, seed: int):
    """(h52, priority) Columns for :func:`priority_sample`.

    Priority sampling (Duffield-Lund-Thorup, JACM 2007): draw u_i uniform
    in (0, 1], give item i priority q_i = w_i / u_i, keep the k largest.
    Inclusion probability ~ min(1, w_i/tau) for the k-th largest threshold
    tau — the standard weighted-sample-without-replacement for streams.

    Determinism + cross-engine bit-exactness: u_i comes from 52 bits of
    md5 (hex chars 4..16 of the ``id:prio<seed>`` digest), so
    u = (h52+1)/2^52 in (0, 1] and q = w * 2^52 / (h52+1). Every operand
    is exactly representable (h52+1 <= 2^52, integer weights < 2^52), the
    2^52 scaling only shifts the exponent, and IEEE division is correctly
    rounded — so Spark and DuckDB produce the SAME double bit-for-bit and
    the SAME ranking, with no transcendental (ln/pow) whose libm rounding
    could differ between engines. The ``prio`` domain tag keeps this hash
    chain disjoint from the split/mixture/order chains.
    """
    h52 = F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"),
                       F.lit(f":prio{seed}"))), 4, 13), 16, 10).cast("long")
    prio = (F.col(weight_col).cast("double") * F.lit(_P52)
            / (h52 + F.lit(1)).cast("double"))
    return h52, prio


def priority_sample(df: DataFrame, k: int, weight_col: str,
                    group_col: str = "source", id_col: str = "doc_id",
                    seed: int = 0) -> DataFrame:
    """Per-group weighted sample WITHOUT replacement: the k items with the
    largest deterministic priorities w/u (see :func:`_priority_inputs`).
    Adds ``sample_rank`` (1-based, by descending priority, ties by id).

    Plan shape: weight/id projection + hash in the scan stage, then ONE
    window Exchange on ``group_col`` over (group, id, w) triples — the
    corpus payload never shuffles (project first at the call site, or let
    Catalyst prune). At 10^12 rows the exact per-group top-k via window is
    the bottleneck only if a group is a significant fraction of the input;
    for that regime pre-prune per partition (groupBy(group, pid) top-k,
    then the global window over <= k * n_partitions survivors) — the
    two-pass shape of ordering.stride_interleave's rank_buckets.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    _, prio = _priority_inputs(id_col, weight_col, seed)
    w = (Window.partitionBy(group_col)
         .orderBy(F.desc("_prio"), F.col(id_col).asc()))
    return (df.withColumn("_prio", prio)
            .withColumn("sample_rank",
                        F.row_number().over(w).cast("long"))
            .where(F.col("sample_rank") <= k)
            .drop("_prio"))


def priority_sample_sql(table_sql: str, k: int, weight_col: str,
                        group_col: str = "source", id_col: str = "doc_id",
                        seed: int = 0,
                        cols: str = "* EXCLUDE (_prio)") -> str:
    """DuckDB twin: identical md5-52-bit chain and exact-double priority
    arithmetic, so ranks match bit-for-bit (see :func:`_priority_inputs`)."""
    h52 = (f"('0x' || substr(md5({id_col}::VARCHAR || ':prio{seed}'), "
           f"4, 13))::UBIGINT")
    prio = (f"({weight_col}::DOUBLE * {_P52!r}) / "
            f"(({h52} + 1)::DOUBLE)")
    return f"""
SELECT {cols} FROM (
  SELECT t.*, {prio} AS _prio,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {prio} DESC, {id_col} ASC)::BIGINT
           AS sample_rank
  FROM ({table_sql}) t)
WHERE sample_rank <= {k}"""


def priority_sample_estimate(df: DataFrame, k: int, weight_col: str,
                             group_col: str = "source",
                             id_col: str = "doc_id",
                             seed: int = 0) -> DataFrame:
    """The SUBSET-SUM ESTIMATOR face of :func:`priority_sample` — what
    makes the k-sample a SKETCH rather than just a sample (Duffield-Lund-
    Thorup, JACM 2007 Thm. 1): keep the k highest-priority items plus the
    per-group threshold ``tau`` = the (k+1)-th largest priority (0.0 when
    the group has <= k items, making the sample exact), and give each
    sampled item the adjusted weight ``w_hat = max(w, tau)``. For ANY
    item subset S fixed independently of the randomness,
    ``sum(w_hat over sampled items in S)`` is an UNBIASED estimator of
    the true ``sum(w over S)`` with near-optimal variance — so one stored
    k-row sample per group answers arbitrary later "how many tokens do
    docs like X hold" questions without rescanning the corpus.

    Deterministic md5-driven priorities (see :func:`_priority_inputs`)
    make tau, every w_hat, and therefore every subset estimate value-
    exactly reproducible in DuckDB (:func:`priority_sample_estimate_sql`).
    Mergeable by the order-statistic contract: the global top-(k+1) is
    the top-(k+1) of the union of per-partition top-(k+1) lists
    (test_splits.py asserts the fold).

    Output: sampled rows (sample_rank <= k) with ``tau`` (double,
    group-constant) and ``w_hat`` (double) appended; the per-group join
    that attaches tau broadcasts a groups-sized frame (KB at any corpus
    scale). Same window posture at 10^12 rows as priority_sample: pre-
    prune per partition to k+1 survivors if one group dominates input."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    _, prio = _priority_inputs(id_col, weight_col, seed)
    w = (Window.partitionBy(group_col)
         .orderBy(F.desc("_prio"), F.col(id_col).asc()))
    top = (df.withColumn("_prio", prio)
           .withColumn("sample_rank",
                       F.row_number().over(w).cast("long"))
           .where(F.col("sample_rank") <= k + 1))
    taus = (top.groupBy(group_col)
            .agg(F.coalesce(
                F.max(F.when(F.col("sample_rank") == k + 1,
                             F.col("_prio"))),
                F.lit(0.0)).alias("tau")))
    return (top.where(F.col("sample_rank") <= k)
            .join(F.broadcast(taus), group_col)
            .withColumn("w_hat",
                        F.greatest(F.col(weight_col).cast("double"),
                                   F.col("tau")))
            .drop("_prio"))


def priority_sample_estimate_sql(table_sql: str, k: int, weight_col: str,
                                 group_col: str = "source",
                                 id_col: str = "doc_id",
                                 seed: int = 0,
                                 cols: str = "ranked.* EXCLUDE (_prio)"
                                 ) -> str:
    """DuckDB twin of :func:`priority_sample_estimate`: identical md5
    chain, exact-double priorities, the same (k+1)-th-order-statistic tau
    and ``greatest(w, tau)`` adjusted weights — every subset-sum estimate
    downstream is value-exact cross-engine. ``cols`` must select from
    ``ranked`` (tau/w_hat are appended by this builder)."""
    h52 = (f"('0x' || substr(md5({id_col}::VARCHAR || ':prio{seed}'), "
           f"4, 13))::UBIGINT")
    prio = (f"({weight_col}::DOUBLE * {_P52!r}) / "
            f"(({h52} + 1)::DOUBLE)")
    return f"""
WITH ranked AS (
  SELECT t.*, {prio} AS _prio,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {prio} DESC, {id_col} ASC)::BIGINT
           AS sample_rank
  FROM ({table_sql}) t
  QUALIFY sample_rank <= {k + 1}
), tau AS (
  SELECT {group_col},
         COALESCE(MAX(CASE WHEN sample_rank = {k + 1} THEN _prio END),
                  0.0) AS tau
  FROM ranked GROUP BY {group_col}
)
SELECT {cols}, tau,
       greatest({weight_col}::DOUBLE, tau) AS w_hat
FROM ranked JOIN tau USING ({group_col})
WHERE sample_rank <= {k}"""


# -- source-mixture resampling ---------------------------------------------

def _mixture_parts(weights: "dict[str, float]", default_weight: float):
    """Per-source (full_copies, fractional_hex_threshold, seq_upper) plus
    the default, computed ONCE in Python so the Spark plan and the SQL
    oracle carry identical literals. ``seq_upper`` is the replica-sequence
    upper bound: ``full`` when a fractional copy must be coin-flipped,
    ``full - 1`` for integer weights (no doomed always-filtered replica —
    at 10^12 rows a w=1.0 source must not explode+hash 2x its rows), and
    ``-1`` for w=0 (an EMPTY sequence, dropping the source in the
    explode on both engines)."""
    def split_w(w):
        if w < 0:
            raise ValueError("mixture weight must be >= 0")
        full = int(w)
        frac = w - full
        thr = format(min(int(frac * 2.0**64), 2**64 - 1), "016x")
        return full, thr, (full if frac > 0 else full - 1)
    return ({s: split_w(w) for s, w in weights.items()},
            split_w(default_weight))


def mixture_resample(df: DataFrame, weights: "dict[str, float]",
                     source_col: str = "source", id_col: str = "doc_id",
                     default_weight: float = 1.0, seed: int = 0) -> DataFrame:
    """Dataset mixing: resample each source to its weight. ``w = 2.5``
    emits every doc twice (``rep`` 0 and 1) plus a third copy with
    probability 0.5; ``w = 0.25`` keeps a quarter of the docs — the
    epoch-weighting scheme of mixture-trained corpora, deterministic per
    (doc, rep, seed) so a re-run (or a retried task) reproduces the exact
    same replica set.

    Pure JVM plan: a CASE over the (small, literal) weight map picks the
    per-source replica sequence (integer weights emit EXACTLY their copies
    — no doomed extra replica is ever exploded or hashed), and the
    fractional copy survives iff md5(id:rep:mix-seed) hex falls under the
    source's precomputed threshold. The hashed string carries a ``mix``
    domain tag so this keep-hash can NEVER alias the order-key chain of
    :mod:`.ordering` — without it, surviving fractional replicas would
    all sit below the keep threshold and cluster at the front of a
    same-seed global shuffle. No shuffle, no UDF; output rows carry
    ``rep`` (replica index) so downstream packing/shuffling can fold it
    into the order key.
    """
    per_src, (dfull, dthr, dub) = _mixture_parts(weights, default_weight)

    def seq_for(ub: int):
        if ub < 0:
            return F.array().cast("array<int>")
        return F.sequence(F.lit(0), F.lit(ub))

    full_c, thr_c, seq_c = F.lit(dfull), F.lit(dthr), seq_for(dub)
    for s, (full, thr, ub) in per_src.items():
        is_s = F.col(source_col) == s
        full_c = F.when(is_s, F.lit(full)).otherwise(full_c)
        thr_c = F.when(is_s, F.lit(thr)).otherwise(thr_c)
        seq_c = F.when(is_s, seq_for(ub)).otherwise(seq_c)
    out = (df.withColumn("_full", full_c)
           .withColumn("rep", F.explode(seq_c)))
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"),
                       F.col("rep").cast("string"), F.lit(f":mix{seed}"))),
        1, 16)
    return (out.where((F.col("rep") < F.col("_full")) | (h < thr_c))
            .drop("_full"))


# -- temperature-based mixture weights --------------------------------------

def temperature_weights(sizes: "dict[str, float]", temperature: float,
                        budget: "float | None" = None,
                        max_weight: "float | None" = None
                        ) -> "dict[str, float]":
    """Mixture weights realizing temperature-scaled source sampling — the
    standard multi-source training recipe: sampling share
    ``q_i = n_i^(1/T) / sum_j n_j^(1/T)`` (T=1 proportional/pass-through,
    T→inf uniform shares — upweights small sources), realized as
    per-source replica factors ``w_i = budget * q_i / n_i`` for
    :func:`mixture_resample`, so the expected OUTPUT volume follows q.
    ``budget`` is the target output volume in the same units as ``sizes``
    (docs or tokens; defaults to the input total — a reshuffled same-size
    epoch). ``max_weight`` caps repetition of tiny sources (the "don't
    epoch a small source 100x" guard); capping redistributes nothing —
    callers wanting exact budgets should renormalize or accept the
    shortfall (documented, deterministic).
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    if any(n <= 0 for n in sizes.values()):
        raise ValueError("source sizes must be > 0")
    total = float(sum(sizes.values()))
    if budget is None:
        budget = total
    inv_t = 1.0 / temperature
    powered = {s: float(n) ** inv_t for s, n in sizes.items()}
    z = sum(powered.values())
    out = {}
    for s, n in sizes.items():
        w = budget * (powered[s] / z) / float(n)
        if max_weight is not None:
            w = min(w, max_weight)
        out[s] = w
    return out


def annealed_temperature_schedule(sizes: "dict[str, float]",
                                  t_start: float, t_end: float,
                                  n_epochs: int,
                                  budget: "float | None" = None,
                                  max_weight: "float | None" = None
                                  ) -> "list[dict[str, float]]":
    """Per-epoch weight maps interpolating 1/T linearly from ``t_start``
    to ``t_end`` — the curriculum shape "start near-uniform over sources,
    end proportional to size" (or the reverse). Feed epoch e's map to
    ``mixture_resample(..., weights=schedule[e], seed=e)``: the seed
    rotation re-draws the fractional replicas each epoch while the
    schedule moves the mix."""
    if n_epochs < 1:
        raise ValueError("n_epochs must be >= 1")
    if n_epochs == 1:
        return [temperature_weights(sizes, t_start, budget, max_weight)]
    a, b = 1.0 / t_start, 1.0 / t_end
    return [temperature_weights(
        sizes, 1.0 / (a + (b - a) * e / (n_epochs - 1)), budget, max_weight)
        for e in range(n_epochs)]


def _case_or_literal(arms: "list[str]", default: str) -> str:
    """``CASE WHEN ... ELSE d END`` — or the bare default when the weight
    map is empty (``CASE ELSE d END`` is a DuckDB parse error)."""
    if not arms:
        return default
    return "CASE " + " ".join(arms) + f" ELSE {default} END"


def mixture_resample_sql(table_sql: str, weights: "dict[str, float]",
                         source_col: str = "source", id_col: str = "doc_id",
                         default_weight: float = 1.0, seed: int = 0,
                         cols: str = "* EXCLUDE (_thr, _full)") -> str:
    """DuckDB twin: same literals, same domain-tagged md5 chain, same
    sequence bounds (``generate_series(0, -1)`` is empty on DuckDB, so
    w=0 sources drop in the unnest exactly like Spark's empty-array
    explode), same keep rule. ``cols`` selects from the replicated inner
    frame (original columns + ``rep``); the default drops only the helper
    columns."""
    per_src, (dfull, dthr, dub) = _mixture_parts(weights, default_weight)
    full_case = _case_or_literal(
        [f"WHEN {source_col} = '{s}' THEN {full}"
         for s, (full, _, _) in per_src.items()], str(dfull))
    thr_case = _case_or_literal(
        [f"WHEN {source_col} = '{s}' THEN '{thr}'"
         for s, (_, thr, _) in per_src.items()], f"'{dthr}'")
    ub_case = _case_or_literal(
        [f"WHEN {source_col} = '{s}' THEN {ub}"
         for s, (_, _, ub) in per_src.items()], str(dub))
    h = (f"substr(md5({id_col}::VARCHAR || ':' || rep::VARCHAR || "
         f"':mix{seed}'), 1, 16)")
    return f"""
SELECT {cols} FROM (
  SELECT t.*, unnest(generate_series(0, {ub_case})) AS rep,
         {thr_case} AS _thr,
         {full_case} AS _full
  FROM ({table_sql}) t)
WHERE rep < _full OR {h} < _thr"""
