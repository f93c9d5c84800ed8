"""Custom stateful streaming operator: per-key sketch state maintained in
the Structured Streaming state store via ``applyInPandasWithState``.

Complements streaming/incremental.py (foreachBatch + checkpoint table):
here the serialized sketch lives IN the state store, keyed by the group
column, and every trigger emits the refreshed estimate per key — the shape
you want for a live "distinct tokens per source" dashboard over a document
firehose. State is the grenier wire format (KB-sized), so the state store
stays tiny regardless of token volume; updates are the same vectorized
kernels as the batch path.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd

from ..core import hll
from ..core.bits import U64, wang64


def _exact_int64(series: pd.Series, where: str, name: str) -> np.ndarray:
    """Convert a notna-filtered pandas column to int64, LOUDLY.

    Spark's Arrow->pandas hop promotes a nullable bigint column to
    float64; values >= 2^53 then lose low bits before user code ever
    sees them — and the mangled float still round-trips cleanly, so
    exactness at that magnitude is UNPROVABLE from here. An int64 dtype
    passes straight through; a float dtype is accepted only when every
    |value| < 2^53 (where int->float->int is injective) and the
    round-trip is exact (rejects non-integral values); otherwise raise
    rather than silently corrupt the sketch."""
    arr = series.to_numpy()
    if arr.dtype.kind == "i":
        return arr.astype(np.int64, copy=False)
    if arr.dtype.kind == "u":
        # unsigned values >= 2^63 would wrap negative through the int64
        # cast — the same silent corruption this helper exists to stop
        if len(arr) and int(arr.max()) > np.iinfo(np.int64).max:
            raise ValueError(
                f"{where}: column {name!r} holds unsigned values >= 2^63 "
                "that cannot be represented as int64")
        return arr.astype(np.int64, copy=False)
    if np.any(np.abs(arr) >= float(1 << 53)):
        raise ValueError(
            f"{where}: column {name!r} arrived float64 (pandas NULL "
            "promotion) with |values| >= 2^53 — low bits may already be "
            "lost upstream and exactness cannot be verified here; keep "
            "the column below 2^53 or make it non-nullable upstream")
    as_int = arr.astype(np.int64)
    if not np.array_equal(as_int.astype(arr.dtype), arr):
        raise ValueError(
            f"{where}: column {name!r} holds non-integral float values")
    return as_int


def hll_state_stream(stream_df, group_col: str, tokens_col: str = "tokens",
                     p: int = 12):
    """(group, est_distinct, n_docs, n_tokens) per trigger per updated key.

    Usage::

        out = hll_state_stream(stream, "source", "tokens", p=12)
        q = (out.writeStream.outputMode("update").format("memory")
                .queryName("live").start())
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{group_col} string, est_distinct double, "
                  "n_docs bigint, n_tokens bigint")
    state_schema = "sketch binary, n_docs bigint, n_tokens bigint"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            blob, n_docs, n_tokens = state.get
            t = hll.from_bytes(bytes(blob))
        else:
            t, n_docs, n_tokens = hll.make_p(p), 0, 0
        for pdf in pdfs:
            # NULL tokens cells: np.asarray(None) is 0-d and concatenate
            # raises — and a poison row would be REPLAYED from the
            # checkpoint on every restart, wedging the stream. Skip them
            # (same guard as lossy_state_stream below).
            arrs = [np.asarray(v, dtype=np.int64)
                    for v in pdf[tokens_col] if v is not None]
            toks = (np.concatenate(arrs) if arrs
                    else np.empty(0, dtype=np.int64))
            if len(toks):
                hll.add_batch(t, wang64(toks.view(U64)))
            n_docs += len(pdf)
            n_tokens += len(toks)
        state.update((hll.to_bytes(t), n_docs, n_tokens))
        yield pd.DataFrame({group_col: [key[0]],
                            "est_distinct": [hll.card(t)],
                            "n_docs": [n_docs], "n_tokens": [n_tokens]})

    return (stream_df.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def lossy_state_stream(stream_df, group_col: str, tokens_col: str = "tokens",
                       support: float = 0.01,
                       error_tolerance: float = 0.001,
                       order_col: str = "doc_id"):
    """Streaming heavy hitters: per-group single-stream lossy counting
    (reference countish/lossy.ml semantics, core/countish.py quirks kept)
    whose summary lives in the state store as parallel (token, f, delta)
    arrays + n — KB-sized regardless of token volume.

    Each trigger extends the SAME counter, so the state after k triggers
    equals a batch counter fed the concatenated stream (asserted vs the
    numpy counter in tests, including across a query restart). Rows within
    a trigger are processed in ``order_col`` order, making the per-trigger
    update deterministic under Arrow chunking; emission per trigger is the
    current report: tokens with ``(f + delta)/n >= support`` as
    (group, token, est_freq, f, n) in update mode.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.countish import LossyCounter

    out_schema = (f"{group_col} string, token bigint, est_freq double, "
                  "f bigint, n bigint")
    state_schema = ("tokens array<bigint>, fs array<double>, "
                    "deltas array<double>, n bigint")

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        lc = LossyCounter(support, error_tolerance)
        if state.exists:
            toks, fs, deltas, n = state.get
            lc.n = int(n)
            lc.f = {int(t): float(v) for t, v in zip(toks, fs)}
            lc.delta = {int(t): float(v) for t, v in zip(toks, deltas)}
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            rows = pd.concat(chunks, ignore_index=True)
            if order_col in rows.columns:
                rows = rows.sort_values(order_col, kind="stable")
            flat = [np.asarray(v, dtype=np.int64)
                    for v in rows[tokens_col] if v is not None]
            if flat:
                lc.observe_batch(np.concatenate(flat))
        items = sorted(lc.f.keys())
        state.update(([int(t) for t in items],
                      [float(lc.f[t]) for t in items],
                      [float(lc.delta[t]) for t in items], lc.n))
        n = float(lc.n) if lc.n else 1.0
        rep = [(t, (lc.f[t] + lc.delta[t]) / n, int(lc.f[t]), lc.n)
               for t in items if (lc.f[t] + lc.delta[t]) / n >= support]
        yield pd.DataFrame({group_col: [key[0]] * len(rep),
                            "token": [r[0] for r in rep],
                            "est_freq": [r[1] for r in rep],
                            "f": [r[2] for r in rep],
                            "n": [r[3] for r in rep]})

    return (stream_df.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def moments_state_stream(stream_df, group_col: str,
                         value_col: str = "value",
                         order_col: str = "event_id"):
    """Streaming running moments: per-group count + error-free dd sums of
    x..x^4 (core/doubledouble.Moments) living in the state store — the
    76-byte streaming profile of a value column (live mean / variance /
    skew / kurtosis per key), exactly-once via the engine's state
    checkpointing.

    Each trigger extends the SAME summary, so after k triggers the state
    equals a batch Moments fed the concatenated per-trigger streams
    (asserted byte-for-byte in tests — ``order_col`` sorts rows within a
    trigger so the dd reduction order is deterministic under Arrow
    chunking; NULL values drop, matching the batch build). Emission per
    trigger: (group, n, mean, variance, skew, kurtosis) in update mode.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.doubledouble import Moments

    if order_col not in stream_df.columns:
        raise ValueError(
            f"moments_state_stream: order_col {order_col!r} not in the "
            f"stream ({stream_df.columns}) — the dd reduction order would "
            f"silently depend on Arrow chunking")
    out_schema = (f"{group_col} string, n bigint, mean double, "
                  "variance double, skew double, kurtosis double")
    state_schema = "n bigint, s array<double>"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        m = Moments()
        if state.exists:
            n, s = state.get
            m = Moments(int(n), np.asarray(s, dtype=np.float64))
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            rows = pd.concat(chunks, ignore_index=True)
            if order_col in rows.columns:
                rows = rows.sort_values(order_col, kind="stable")
            vals = rows[value_col].dropna().to_numpy(dtype=np.float64)
            if len(vals):
                m.update_batch(vals)
        state.update((int(m.n), [float(x) for x in m.s.ravel()]))
        n, mean, var, skew, kurt = m.stats()
        yield pd.DataFrame({group_col: [key[0]], "n": [n],
                            "mean": [mean], "variance": [var],
                            "skew": [skew], "kurtosis": [kurt]})

    return (stream_df.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def ddsketch_state_stream(stream_df, group_col: str,
                          value_col: str = "value", alpha: float = 0.01,
                          qs: "tuple[float, ...]" = (0.25, 0.5, 0.9),
                          emit_state: bool = False):
    """Streaming running quantiles: one DDSketch (core/ddsketch.py,
    Masson et al. VLDB 2019) per group living in the state store.

    DDSketch is the ORDER-INSENSITIVE quantile kind — its state is a pure
    log-bucket histogram and merge is bucket-wise count addition — so
    after any number of triggers the state bytes are EXACTLY the batch
    build over the concatenated stream (asserted byte-for-byte in
    tests/test_ddsketch.py): no order column, no Arrow-chunk sensitivity,
    unlike the kll/tdigest kinds whose compactions are order-dependent.
    Consequently every emitted estimate is the one
    ``sql_oracles.dd_quantile_sql`` recomputes value-exactly — the only
    streaming quantile surface whose numbers a SQL engine can reproduce
    bit-for-bit.

    Emission per trigger: one row per requested quantile
    ``(group, n, q, est)``. NULL values drop (matching the batch build's
    isNotNull filter); a group whose values so far are all NULL keeps its
    state but emits nothing (quantiles of an empty sketch are undefined).
    State size is bounded by log_gamma(max/min) buckets (~KB at
    alpha=0.01) regardless of stream length. ``emit_state=True``
    additionally emits the serialized sketch bytes on every row — the
    byte-identity claim is asserted against the batch build through this
    surface in tests."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.ddsketch import DDSketch

    out_schema = f"{group_col} string, n bigint, q double, est double"
    if emit_state:
        out_schema += ", sketch binary"
    state_schema = "sketch binary"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            (blob,) = state.get
            s = DDSketch.from_bytes(bytes(blob))
        else:
            s = DDSketch(alpha)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            vals = (pd.concat(chunks, ignore_index=True)[value_col]
                    .dropna().to_numpy(dtype=np.float64))
            # DDSketch.update_batch raises on negative / non-finite input;
            # in a stream that would wedge the query forever (the
            # checkpointed batch retries and re-fails), so drop those
            # records here instead — the batch path keeps the loud raise
            vals = vals[np.isfinite(vals) & (vals >= 0)]
            if len(vals):
                s.update_batch(vals)
        wire = s.to_bytes()
        state.update((wire,))
        if s.n:
            out = {group_col: key[0], "n": s.n, "q": list(qs),
                   "est": [s.quantile(q) for q in qs]}
            if emit_state:
                out["sketch"] = [wire] * len(qs)
            yield pd.DataFrame(out)

    return (stream_df.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def req_state_stream(stream_df, group_col: str, value_col: str = "value",
                     k: int = 32, qs: "tuple[float, ...]" = (0.9, 0.99),
                     order_col: str = "event_id",
                     emit_state: bool = False):
    """Streaming TAIL quantiles: one REQ sketch (core/req.py, PODS 2021)
    per group in the state store — the live p99/p999 surface whose rank
    error shrinks multiplicatively toward the tail and whose running
    maximum is EXACT.

    REQ compaction is order-sensitive (like kll, unlike dd), so
    ``order_col`` sorts rows within each trigger to pin the update order
    under Arrow chunking; the result is deterministic given the trigger
    split, and the PODS'21 rank guarantee holds for the concatenated
    stream regardless (gated in the driver query by multiplicative
    rank-band booleans against the exact batch quantiles). NULL values
    drop, matching the batch build. Emission per trigger: one row per
    requested quantile ``(group, n, q, est)``; ``emit_state=True`` adds
    the serialized sketch bytes per row so tests can assert the
    state == order-pinned batch twin byte contract directly."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.req import REQ

    if order_col not in stream_df.columns:
        raise ValueError(
            f"req_state_stream: order_col {order_col!r} not in the stream "
            f"({stream_df.columns}) — the compaction order would silently "
            f"depend on Arrow chunking, breaking the batch-twin contract")
    out_schema = f"{group_col} string, n bigint, q double, est double"
    if emit_state:
        out_schema += ", sketch binary"
    state_schema = "sketch binary"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            (blob,) = state.get
            s = REQ.from_bytes(bytes(blob))
        else:
            s = REQ(k)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            rows = pd.concat(chunks, ignore_index=True)
            if order_col in rows.columns:
                rows = rows.sort_values(order_col, kind="stable")
            vals = rows[value_col].dropna().to_numpy(dtype=np.float64)
            if len(vals):
                s.update_batch(vals)
        wire = s.to_bytes()
        state.update((wire,))
        if s.n:
            out = {group_col: key[0], "n": s.n, "q": list(qs),
                   "est": s.quantiles(list(qs))}
            if emit_state:
                out["sketch"] = [wire] * len(qs)
            yield pd.DataFrame(out)

    return (stream_df.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def windowed_hll_stream(stream_df, ts_col: str, group_col: str,
                        key_col: str, window: str = "1 hour",
                        watermark: str = "10 minutes", p: int = 12):
    """Event-time tumbling-window distinct estimates with WATERMARK-driven
    finalization: state is keyed by (group, window); when the watermark
    passes a window's end, its sketch is finalized, emitted once (append
    mode) and evicted from the state store. Late rows behind the watermark
    are dropped by Spark before they reach the operator — the standard
    late-data contract, here applied to a custom sketch aggregate.

    Returns an append-mode stream of
    (group, win_start, win_end, est_distinct, n_rows).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # Window bounds reach the state function as NAIVE datetimes rendered in
    # the SESSION timezone (withWatermark only accepts TIMESTAMP — Spark
    # rejects TIMESTAMP_NTZ event time with EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    # TYPE, so LTZ is the only case). datetime.timestamp() would interpret
    # them in the worker's OS timezone instead; localize explicitly with
    # the session tz captured on the driver. Offset styles ('+08:00',
    # 'GMT+8') are valid session tzs that ZoneInfo rejects, hence the
    # fallback parser.
    import datetime as _dt
    import re as _re

    try:
        session_tz = stream_df.sparkSession.conf.get(
            "spark.sql.session.timeZone")
    except Exception:
        session_tz = None

    def _tzinfo(name):
        try:
            from zoneinfo import ZoneInfo

            return ZoneInfo(name)
        except Exception:
            m = _re.fullmatch(r"(?:GMT|UTC)?([+-])(\d{1,2})(?::?(\d{2}))?",
                              name or "")
            if m:
                sign = 1 if m.group(1) == "+" else -1
                return _dt.timezone(sign * _dt.timedelta(
                    hours=int(m.group(2)), minutes=int(m.group(3) or 0)))
            if name in ("UTC", "GMT", "Z", "Etc/UTC"):
                return _dt.timezone.utc
            # fail FAST on the driver: a silent UTC fallback would finalize
            # every window hours off (or crash workers on a timeout below
            # the watermark)
            raise ValueError(
                f"cannot resolve session timezone {name!r} for event-time "
                f"timeouts (no tzdata?); set spark.sql.session.timeZone to "
                f"a resolvable zone or a fixed offset")

    tz = _tzinfo(session_tz) if session_tz else _dt.timezone.utc

    def _epoch_ms(naive_dt) -> int:
        # fold=1: at a DST fall-back the naive window end is ambiguous
        # (two instants, 1h apart). Resolve to the LATER one — a timeout
        # an hour late just delays the append emission by an hour once a
        # year, while the earlier instant would fire BEFORE the watermark
        # truly passed (emitting a window missing an hour of data, or
        # crashing on setTimeoutTimestamp-below-watermark when the state
        # is recreated).
        return int(naive_dt.replace(tzinfo=tz, fold=1).timestamp() * 1000)

    # the watermarked event-time column must survive into the stateful
    # operator's child plan, so keep ts_col in the projection
    src = (stream_df
           .withWatermark(ts_col, watermark)
           .withColumn("win", F.window(ts_col, window))
           .select(group_col, F.col("win.start").alias("win_start"),
                   F.col("win.end").alias("win_end"), key_col, ts_col))

    out_schema = (f"{group_col} string, win_start timestamp, "
                  "win_end timestamp, est_distinct double, n_rows bigint")
    state_schema = "sketch binary, n_rows bigint"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        group, win_start, win_end = key
        if state.hasTimedOut:
            blob, n_rows = state.get
            t = hll.from_bytes(bytes(blob))
            state.remove()
            yield pd.DataFrame({group_col: [group],
                                "win_start": [win_start],
                                "win_end": [win_end],
                                "est_distinct": [hll.card(t)],
                                "n_rows": [n_rows]})
            return
        if state.exists:
            blob, n_rows = state.get
            t = hll.from_bytes(bytes(blob))
        else:
            t, n_rows = hll.make_p(p), 0
        for pdf in pdfs:
            col = pdf[key_col]
            if col.isna().any():
                # one NULL promotes the batch to float64: NaN would cast
                # to garbage INT64_MIN and full-range keys above 2^53
                # would round — drop the NULLs and refuse lossy batches
                # (same contract as operators/dedup.bloom_probe_udf)
                col = col.dropna()
                f = col.to_numpy(dtype=np.float64)
                if len(f) and (np.abs(f) >= 2.0 ** 53).any():
                    raise ValueError(
                        "windowed_hll_stream: NULL keys promoted the "
                        "batch to float64 and keys exceed 2^53 — filter "
                        "NULL keys upstream to keep the column int64")
            vals = col.to_numpy(dtype=np.int64)
            if len(vals):
                hll.add_batch(t, wang64(vals.view(U64)))
            n_rows += len(pdf)
        state.update((hll.to_bytes(t), n_rows))
        # finalize when the event-time watermark passes the window end
        state.setTimeoutTimestamp(_epoch_ms(win_end))

    return (src.groupBy(group_col, "win_start", "win_end")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))


def kll_drift_stream(stream_df, group_col: str, baseline: "dict[str, bytes]",
                     value_col: str = "value", k: int = 200):
    """Live distribution-drift monitor — the streaming face of
    ``operators/drift.py``: one KLL per group lives in the state store;
    every trigger emits the two-sample KS statistic between the group's
    LIVE sketch and a pinned BASELINE sketch (``baseline``: group key ->
    serialized KLL blob, e.g. a ``build_sketches`` pass over the
    reference corpus). The ingest-monitoring question "has this source's
    value distribution moved off the reference" answered per micro-batch
    with the KLL rank-guarantee error budget
    ``|ks - ks_exact| <= eps_live + eps_baseline``.

    Emission per trigger: ``(group, n, ks)`` for groups present in the
    baseline (a group with no baseline accumulates state silently — it
    has nothing to compare against; pin a baseline and the next trigger
    starts emitting). NULL/NaN values drop (KLL skips NaN); +/-inf drops
    here too — in a stream a poisoned tail quantile would wedge every
    subsequent KS, the same loud-batch/quiet-stream split as
    ``ddsketch_state_stream``. The baseline dict rides the task closure:
    KB per group, so bound the group count (~10^4 keys = ~10 MB) — for
    larger keyspaces broadcast a map-side join table instead.

    KLL compaction is order-sensitive, so the state bytes are
    deterministic per trigger schedule, not byte-stable across replans —
    the emitted KS is ESTIMATE-level gated (the guarantee band), exactly
    like the batch ``ks_sketch_report``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.kll import KLL
    from ..operators.drift import kll_ks

    out_schema = f"{group_col} string, n bigint, ks double"
    state_schema = "sketch binary"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            (blob,) = state.get
            s = KLL.from_bytes(bytes(blob))
        else:
            s = KLL(k=k, seed=7)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            vals = (pd.concat(chunks, ignore_index=True)[value_col]
                    .dropna().to_numpy(dtype=np.float64))
            vals = vals[np.isfinite(vals)]
            if len(vals):
                s.update_batch(vals)
        wire = s.to_bytes()
        state.update((wire,))
        base = baseline.get(key[0])
        if s.n and base is not None:
            yield pd.DataFrame({group_col: [key[0]], "n": [s.n],
                                "ks": [kll_ks(wire, base)]})

    return (stream_df.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def dd_psi_stream(stream_df, group_col: str, baseline: "dict[str, bytes]",
                  value_col: str = "value", alpha: float = 0.25,
                  smooth: float = 0.5):
    """Live PSI monitor — the streaming face of
    ``operators/drift.py psi_sketch_report``: one DDSketch per group in
    the state store; every trigger emits the Population Stability Index
    between the group's LIVE histogram and a pinned BASELINE blob
    (group key -> serialized DDSketch at the SAME alpha). Because
    DDSketch merges are order-insensitive and bucket counts are exact
    integers, the live state equals a batch build over everything
    ingested so far — the streamed PSI is the EXACT PSI of the
    alpha-binning, not an estimate (value-gated round-6 in the driver
    query, unlike the band-gated KLL/KS stream).

    Same contracts as ``kll_drift_stream``: no-baseline groups
    accumulate silently; NULL/NaN/±inf AND negative values drop
    (DDSketch raises on them — in a stream that wedges the checkpointed
    batch forever, the ddsketch_state_stream posture); the baseline
    dict rides the task closure (KB per group — bound the keyspace).
    Emits ``(group, n, n_bins, psi)`` per trigger."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.ddsketch import DDSketch
    from ..operators.drift import dd_psi_pair

    out_schema = f"{group_col} string, n bigint, n_bins bigint, psi double"
    state_schema = "sketch binary"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            (blob,) = state.get
            s = DDSketch.from_bytes(bytes(blob))
        else:
            s = DDSketch(alpha)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            vals = (pd.concat(chunks, ignore_index=True)[value_col]
                    .dropna().to_numpy(dtype=np.float64))
            vals = vals[np.isfinite(vals) & (vals >= 0)]
            if len(vals):
                s.update_batch(vals)
        state.update((s.to_bytes(),))
        base = baseline.get(key[0])
        if s.n and base is not None:
            n_bins, psi = dd_psi_pair(s, DDSketch.from_bytes(bytes(base)),
                                      smooth)
            yield pd.DataFrame({group_col: [key[0]], "n": [int(s.n)],
                                "n_bins": [n_bins], "psi": [psi]})

    return (stream_df.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def priority_sample_stream(stream_df, group_col: str, k: int,
                           weight_col: str = "w", id_col: str = "doc_id",
                           seed: int = 0):
    """Live mergeable weighted sample — the streaming face of
    ``sketch_build.build_priority_sample``: one PrioritySample top-(k+1)
    state (core/prioritysample.py) per group in the state store.
    Priorities are the SAME deterministic JVM-side md5 chain as every
    batch path (splits._priority_inputs), added here as a projection
    BEFORE the stateful groupBy. The state is order-insensitive (the
    top-(k+1) of the multiset seen so far), so the final-trigger sample,
    tau, and every DLT subset-sum estimate EQUAL a batch build over
    everything ingested — the gate checks tau and the total-weight
    estimate VALUE-exactly against the batch SQL chain (same class as
    the dd/PSI streams, stronger than the band-gated KLL/KS stream).

    Contracts: ids and weights must be INTEGER COLUMNS — checked against
    the stream schema at construction time (plan-time fail-fast, not a
    wedged checkpointed batch; inside a batch, NULL-promoted float64
    values of a long column convert back exactly). NULL id/weight rows
    drop and do not count toward n_seen; zero weights drop inside the
    core state and cannot bias estimates. Emits ``(group, n_seen,
    n_sample, tau, est_total)`` per trigger; est_total is the DLT
    estimate of the TOTAL ingested weight (the subset-sum estimator at
    S = everything).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    from ..core.prioritysample import PrioritySample
    from ..operators.splits import _priority_inputs

    int_types = (ByteType, ShortType, IntegerType, LongType)
    for c in (id_col, weight_col):
        if not isinstance(stream_df.schema[c].dataType, int_types):
            raise ValueError(
                f"priority_sample_stream: column {c!r} must be an integer "
                f"type, got {stream_df.schema[c].dataType}")

    _, prio = _priority_inputs(id_col, weight_col, seed)
    src = stream_df.withColumn("_prio", prio)
    out_schema = (f"{group_col} string, n_seen bigint, n_sample bigint, "
                  "tau double, est_total double")
    state_schema = "sketch binary, n_seen bigint"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            blob, n_seen = state.get
            s = PrioritySample.from_bytes(bytes(blob))
            n_seen = int(n_seen)
        else:
            s, n_seen = PrioritySample(k), 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            ok = (pdf[id_col].notna() & pdf[weight_col].notna()
                  & pdf["_prio"].notna())
            pdf = pdf[ok]
            if len(pdf):
                # long columns arrive float64 after pandas NULL promotion;
                # that conversion is exact only below 2^53 — verify the
                # round-trip instead of trusting it (ids/weights >= 2^53
                # would otherwise be silently mangled)
                s.update_batch(
                    _exact_int64(pdf[id_col], "priority_sample_stream",
                                 id_col),
                    _exact_int64(pdf[weight_col],
                                 "priority_sample_stream", weight_col),
                    pdf["_prio"].to_numpy(np.float64))
                n_seen += len(pdf)
        state.update((s.to_bytes(), n_seen))
        if n_seen:
            yield pd.DataFrame({group_col: [key[0]],
                                "n_seen": [n_seen],
                                "n_sample": [len(s.items())],
                                "tau": [s.tau],
                                "est_total": [s.estimate_total()]})

    return (src.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def dd_ks_stream(stream_df, group_col: str, baseline: "dict[str, bytes]",
                 value_col: str = "value", alpha: float = 0.25):
    """Live binned-KS monitor — the VALUE-exact sibling of
    ``kll_drift_stream`` (which band-gates the TRUE KS): one DDSketch
    per group in the state store; every trigger emits the two-sample KS
    of the alpha-quantized distributions between the group's LIVE
    histogram and a pinned BASELINE blob (operators/drift.dd_ks_pair —
    integer bucket cumsums, exact divisions, max; a deterministic lower
    bound of the true KS, exact for the binning). dd state is
    order-insensitive, so the final-trigger statistic equals the batch
    chain bit-for-bit (sql_oracles.dd_ks_sql). Same contracts as
    dd_psi_stream: no-baseline groups accumulate silently; NULL/NaN/inf
    and negative values drop; the baseline dict rides the task closure
    (KB per group). Emits ``(group, n, n_bins, ks)`` per trigger."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.ddsketch import DDSketch
    from ..operators.drift import dd_ks_pair

    out_schema = f"{group_col} string, n bigint, n_bins bigint, ks double"
    state_schema = "sketch binary"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            (blob,) = state.get
            s = DDSketch.from_bytes(bytes(blob))
        else:
            s = DDSketch(alpha)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            vals = (pd.concat(chunks, ignore_index=True)[value_col]
                    .dropna().to_numpy(dtype=np.float64))
            vals = vals[np.isfinite(vals) & (vals >= 0)]
            if len(vals):
                s.update_batch(vals)
        state.update((s.to_bytes(),))
        base = baseline.get(key[0])
        if s.n and base is not None:
            n_bins, ks = dd_ks_pair(s, DDSketch.from_bytes(bytes(base)))
            yield pd.DataFrame({group_col: [key[0]], "n": [int(s.n)],
                                "n_bins": [n_bins], "ks": [ks]})

    return (stream_df.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))
