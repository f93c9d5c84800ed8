"""As-of join and interval-overlap join: brute-force parity on random
data, tie/tolerance/direction semantics, exactly-once pair emission, and
plan-shape gates (single shuffle for as-of, no cartesian for overlap)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from grenier_spark.operators.joins import (asof_join, interval_overlap_join,
                                           salted_join)


def _rand_frames(seed, n_left=300, n_right=400, n_keys=7, ts_range=1000):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": rng.integers(0, ts_range, n_left).astype("int64"),
        "lid": np.arange(n_left, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "ts": rng.integers(0, ts_range, n_right).astype("int64"),
        "rid": np.arange(n_right, dtype="int64"),
        "payload": rng.integers(0, 10**6, n_right).astype("int64"),
    })
    return left, right


def _naive_asof(left, right, direction, tol=None):
    rows = []
    for lr in left.itertuples():
        c = right[right.k == lr.k]
        if direction == "backward":
            c = c[c.ts <= lr.ts].sort_values(["ts", "rid"])
            m = c.iloc[-1] if len(c) else None
        else:
            c = c[c.ts >= lr.ts].sort_values(["ts", "rid"])
            m = c.iloc[0] if len(c) else None
        if m is not None and tol is not None and abs(int(lr.ts) - int(m.ts)) > tol:
            m = None
        rows.append((lr.lid,
                     -1 if m is None else int(m.rid),
                     -1 if m is None else int(m.payload)))
    return pd.DataFrame(rows, columns=["lid", "rid", "payload"]) \
        .sort_values("lid").reset_index(drop=True)


def _spark_asof(spark, left, right, direction, tol=None):
    l = spark.createDataFrame(left)
    r = spark.createDataFrame(right)
    out = asof_join(l, r, on="k", tie_col="rid", direction=direction,
                    tolerance_us=tol)
    pdf = out.select(
        "lid",
        F.coalesce("asof_rid", F.lit(-1)).alias("rid"),
        F.coalesce("asof_payload", F.lit(-1)).alias("payload")).toPandas()
    return pdf.sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed", [0, 1])
def test_asof_matches_bruteforce(spark, direction, seed):
    left, right = _rand_frames(seed)
    got = _spark_asof(spark, left, right, direction)
    exp = _naive_asof(left, right, direction)
    pd.testing.assert_frame_equal(got, exp)


def test_asof_tolerance(spark):
    left, right = _rand_frames(2)
    got = _spark_asof(spark, left, right, "backward", tol=25)
    exp = _naive_asof(left, right, "backward", tol=25)
    pd.testing.assert_frame_equal(got, exp)
    # the tolerance must actually bite somewhere on this seed
    loose = _naive_asof(left, right, "backward")
    assert (exp.rid != loose.rid).any()


def test_asof_tie_break_deterministic(spark):
    """Several right rows at the exact match timestamp: backward takes the
    max tie id, forward the min."""
    left = pd.DataFrame({"k": [1, 1], "ts": [100, 50], "lid": [0, 1]})
    right = pd.DataFrame({
        "k": [1, 1, 1, 1],
        "ts": [100, 100, 100, 40],
        "rid": [7, 3, 9, 1],
        "payload": [70, 30, 90, 10]})
    got = _spark_asof(spark, left, right, "backward")
    assert got.rid.tolist() == [9, 1]
    got_f = _spark_asof(spark, left, right, "forward")
    assert got_f.rid.tolist() == [3, 3]


def test_asof_equal_ts_matches_inclusive(spark):
    """A right row at EXACTLY left.ts matches in both directions."""
    left = pd.DataFrame({"k": [1], "ts": [100], "lid": [0]})
    right = pd.DataFrame({"k": [1], "ts": [100], "rid": [5],
                          "payload": [50]})
    for d in ("backward", "forward"):
        assert _spark_asof(spark, left, right, d).rid.tolist() == [5]


def test_asof_timestamp_columns(spark):
    """Timestamp ts columns: tolerance compares as INTERVAL; matched ts
    round-trips."""
    ev = spark.createDataFrame(
        pd.DataFrame({
            "k": [1, 1, 1],
            "ts": pd.to_datetime(["2024-01-01 00:00:00",
                                  "2024-01-01 01:00:00",
                                  "2024-01-01 05:00:00"]),
            "rid": [0, 1, 2], "payload": [0, 10, 20]}))
    probe = spark.createDataFrame(
        pd.DataFrame({"k": [1], "lid": [0],
                      "ts": pd.to_datetime(["2024-01-01 04:00:00"])}))
    hit = asof_join(probe, ev, on="k", tie_col="rid",
                    tolerance_us=4 * 3600 * 10**6).toPandas()
    assert hit.asof_rid.tolist() == [1]
    miss = asof_join(probe, ev, on="k", tie_col="rid",
                     tolerance_us=3600 * 10**6).toPandas()
    assert pd.isna(miss.asof_rid).all()


def test_asof_single_exchange_no_join_node(spark):
    """The as-of join is a union + window: exactly ONE hash shuffle on the
    key and NO join operator in the plan — nothing can go quadratic."""
    left, right = _rand_frames(3)
    out = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                    on="k", tie_col="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def _rand_intervals(seed, n, span, max_len):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, span, n).astype("int64")
    ln = rng.integers(0, max_len, n).astype("int64")
    return pd.DataFrame({"iid": np.arange(n, dtype="int64"),
                         "start": s, "end": s + ln})


def _naive_overlap(left, right):
    rows = []
    for l in left.itertuples():
        for r in right.itertuples():
            if l.start <= r.end and r.start <= l.end:
                rows.append((l.iid, r.iid,
                             min(l.end, r.end) - max(l.start, r.start)))
    return pd.DataFrame(rows, columns=["l_iid", "r_iid", "overlap_us"]) \
        .sort_values(["l_iid", "r_iid"]).reset_index(drop=True)


@pytest.mark.parametrize("bin_us", [7, 100, 1000])
def test_overlap_matches_bruteforce_any_bin_width(spark, bin_us):
    left = _rand_intervals(0, 120, 2000, 60)
    right = _rand_intervals(1, 150, 2000, 60)
    out = interval_overlap_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        left_start="start", left_end="end",
        right_start="start", right_end="end", bin_us=bin_us)
    got = (out.select("l_iid", "r_iid", "overlap_us").toPandas()
           .sort_values(["l_iid", "r_iid"]).reset_index(drop=True))
    exp = _naive_overlap(left, right)
    pd.testing.assert_frame_equal(got, exp)
    # exactly-once: the canonical-bin trick, not a distinct, dedups
    assert not got.duplicated(["l_iid", "r_iid"]).any()


def test_overlap_touching_endpoints_inclusive(spark):
    left = pd.DataFrame({"iid": [0], "start": [0], "end": [10]})
    right = pd.DataFrame({"iid": [0], "start": [10], "end": [20]})
    out = interval_overlap_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        bin_us=100).toPandas()
    assert len(out) == 1 and out.overlap_us.tolist() == [0]


def test_overlap_with_key_equality(spark):
    left = pd.DataFrame({"k": [1, 2], "iid": [0, 1],
                         "start": [0, 0], "end": [10, 10]})
    right = pd.DataFrame({"k": [1, 3], "iid": [0, 1],
                          "start": [5, 5], "end": [15, 15]})
    out = interval_overlap_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", bin_us=100).toPandas()
    assert len(out) == 1
    assert out.l_iid.tolist() == [0] and out.r_iid.tolist() == [0]


def test_overlap_no_cartesian_and_joins_on_bin(spark):
    left = _rand_intervals(2, 50, 1000, 20)
    right = _rand_intervals(3, 50, 1000, 20)
    out = interval_overlap_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        bin_us=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def _skewed_frames(seed=0, n=2000, n_keys=40):
    """Left fact with one hot key holding ~half the rows; right dim with
    one row per key (some keys absent so outer-ness is exercised)."""
    rng = np.random.default_rng(seed)
    k = rng.integers(0, n_keys, n).astype("int64")
    k[: n // 2] = 7  # hot key
    left = pd.DataFrame({
        "k": k, "lid": np.arange(n, dtype="int64"),
        "v": rng.integers(0, 100, n).astype("int64")})
    right = pd.DataFrame({
        "k": np.arange(0, n_keys, 2, dtype="int64"),  # evens only
        "dim": np.arange(0, n_keys, 2, dtype="int64") * 10})
    return left, right


def _sorted(pdf, cols):
    return pdf.sort_values(cols).reset_index(drop=True)[
        sorted(pdf.columns)]


@pytest.mark.parametrize("how", ["inner", "left", "left_semi"])
@pytest.mark.parametrize("n_salts", [1, 8])
def test_salted_join_row_identical_to_plain(spark, how, n_salts):
    left, right = _skewed_frames()
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    got = salted_join(l, r, on="k", n_salts=n_salts, how=how).toPandas()
    exp = l.join(r, on="k", how=how).toPandas()
    pd.testing.assert_frame_equal(_sorted(got, ["lid"]),
                                  _sorted(exp, ["lid"]))


def test_salted_join_null_keys_match_plain_semantics(spark):
    """NULL join keys never match (equality) but survive a left join with
    NULL right columns — exactly as unsalted."""
    left = pd.DataFrame({"k": pd.array([1, None, 2], dtype="Int64"),
                         "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                          "dim": [10, 99]})
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    for how in ("inner", "left"):
        got = salted_join(l, r, on="k", n_salts=4, how=how).toPandas()
        exp = l.join(r, on="k", how=how).toPandas()
        pd.testing.assert_frame_equal(_sorted(got, ["lid"]),
                                      _sorted(exp, ["lid"]))


def test_salted_join_self_derived_dim(spark):
    """The common shape: fact joined to an aggregate of itself (attribute
    ids overlap) — must resolve without ambiguity and stay row-identical."""
    left, _ = _skewed_frames(1)
    l = spark.createDataFrame(left)
    dim = l.groupBy("k").agg(F.count("*").alias("n_k"))
    got = salted_join(l, dim, on="k", n_salts=8).toPandas()
    exp = l.join(dim, on="k").toPandas()
    pd.testing.assert_frame_equal(_sorted(got, ["lid"]),
                                  _sorted(exp, ["lid"]))


def test_salted_join_plan_salts_both_sides(spark):
    """Plan gate: join keys include the salt (hot key spreads over
    n_salts reducers); the right side replicates via a narrow explode —
    no extra exchange beyond the two hash shuffles; never a cartesian."""
    left, right = _skewed_frames(2)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(spark.createDataFrame(left),
                          spark.createDataFrame(right), on="k", n_salts=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "CartesianProduct" not in plan, plan
    assert "__salt" in plan, plan
    import re
    parts = re.findall(r"Exchange hashpartitioning\(([^)]*)", plan)
    assert parts and all("__salt" in p for p in parts), plan
    assert "Generate explode" in plan, plan


def test_salted_join_rejects_right_outer_shapes(spark):
    left, right = _skewed_frames(3)
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    with pytest.raises(ValueError, match="inner/left/left_semi"):
        salted_join(l, r, on="k", how="full")
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(l, r, on="k", n_salts=0)


def test_overlap_oversize_interval_fails_fast(spark):
    """An interval spanning more than max_bins bins must raise, not fan
    out: the guard lives inside a used column so pruning can't drop it."""
    left = pd.DataFrame({"iid": [0], "start": [0], "end": [10**6]})
    right = pd.DataFrame({"iid": [0], "start": [0], "end": [10]})
    out = interval_overlap_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        bin_us=10, max_bins=100)
    with pytest.raises(Exception, match="max_bins"):
        out.collect()


# ---------------- bloom_pruned_join ----------------

def _bp_frames():
    rng = np.random.default_rng(11)
    fact = pd.DataFrame({
        "k": pd.array(list(rng.integers(0, 50, 400)) + [None, None],
                      dtype="Int64"),
        "fid": np.arange(402, dtype="int64")})
    dim = pd.DataFrame({
        "k": pd.array(list(range(0, 50, 3)) + [None], dtype="Int64"),
        "dim": np.arange(18, dtype="int64") * 7})
    return fact, dim


@pytest.mark.parametrize("how", ["inner", "semi"])
@pytest.mark.parametrize("expected_keys,fpr", [(100_000, 0.01), (1, 0.5)])
def test_bloom_pruned_join_identical_to_plain(spark, how, expected_keys,
                                              fpr):
    """Row-identical to the plain join with a well-sized AND a
    pathologically undersized filter (m -> tiny, fpr -> ~1: everything
    probes maybe-present, and the verify join restores exactness) —
    including NULL keys on both sides, which never equi-match."""
    from grenier_spark.operators.joins import bloom_pruned_join
    fact, dim = _bp_frames()
    f, d = spark.createDataFrame(fact), spark.createDataFrame(dim)
    got = bloom_pruned_join(f, d, "k", how=how,
                            expected_keys=expected_keys, fpr=fpr).toPandas()
    exp = f.join(d, "k", how).toPandas()
    pd.testing.assert_frame_equal(_sorted(got, ["fid"]),
                                  _sorted(exp, ["fid"]))


def test_bloom_pruned_join_multi_column_and_empty_dim(spark):
    """Composite keys hash as one xxhash64 tuple; an EMPTY dim yields an
    empty (never-None) filter and an empty join, not a crash."""
    from grenier_spark.operators.joins import bloom_pruned_join
    fact = pd.DataFrame({"a": [1, 1, 2, 2], "b": [1, 2, 1, 2],
                         "fid": [0, 1, 2, 3]})
    dim = pd.DataFrame({"a": [1, 2], "b": [2, 1], "dim": [10, 20]})
    f, d = spark.createDataFrame(fact), spark.createDataFrame(dim)
    got = bloom_pruned_join(f, d, ["a", "b"], expected_keys=16).toPandas()
    exp = f.join(d, ["a", "b"], "inner").toPandas()
    pd.testing.assert_frame_equal(_sorted(got, ["fid"]),
                                  _sorted(exp, ["fid"]))
    empty = d.where("a < 0")
    assert bloom_pruned_join(f, empty, ["a", "b"],
                             expected_keys=16).count() == 0


def test_bloom_pruned_join_rejects_outer_shapes(spark):
    """Outer joins must keep non-matching fact rows, so pruning them is
    semantically wrong — fail fast rather than silently drop."""
    from grenier_spark.operators.joins import bloom_pruned_join
    fact, dim = _bp_frames()
    f, d = spark.createDataFrame(fact), spark.createDataFrame(dim)
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_pruned_join(f, d, "k", how="left")
    with pytest.raises(ValueError, match="join column"):
        bloom_pruned_join(f, d, [], how="inner")
