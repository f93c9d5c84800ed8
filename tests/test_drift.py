"""Two-sample KS drift detection (operators/drift.py): sketch-vs-exact
error bound, exact-KS brute parity, group handling, edge cases."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from grenier_spark.core.kll import KLL
from grenier_spark.operators.drift import (kll_ks, ks_exact,
                                           ks_sketch_report)


def brute_ks(a: np.ndarray, b: np.ndarray) -> float:
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def _sk(vals, k=200, seed=1):
    s = KLL(k=k, seed=seed)
    s.update_batch(np.asarray(vals, dtype=np.float64))
    return s.to_bytes()


def test_kll_ks_tracks_exact_within_bound():
    rng = np.random.default_rng(3)
    a = rng.exponential(50, size=20000)
    for shift, label in ((0.0, "same"), (30.0, "shifted")):
        b = rng.exponential(50, size=20000) + shift
        est, exact = kll_ks(_sk(a), _sk(b, seed=2)), brute_ks(a, b)
        # KLL k=200 rank eps ~ 0.04 per side
        assert abs(est - exact) <= 0.08, (label, est, exact)
    # disjoint supports: KS = 1 exactly, sketch sees it exactly too
    assert kll_ks(_sk(np.arange(1000.0)),
                  _sk(np.arange(5000.0, 6000.0))) == 1.0


def test_kll_ks_empty_side_is_nan():
    assert np.isnan(kll_ks(_sk([]), _sk([1.0])))


def test_ks_exact_matches_brute_and_is_partitioning_invariant(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g, shift in (("x", 0.0), ("y", 25.0)):
        for side in (0, 1):
            for v in rng.exponential(40, size=400) + shift * side:
                rows.append((g, side, float(v)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "side", "v"]))
    got = {r.g: (r.ks, r.n_a, r.n_b) for r in
           ks_exact(df, "v", "side", ["g"]).collect()}
    pdf = pd.DataFrame(rows, columns=["g", "side", "v"])
    for g in ("x", "y"):
        a = pdf[(pdf.g == g) & (pdf.side == 0)].v.to_numpy()
        b = pdf[(pdf.g == g) & (pdf.side == 1)].v.to_numpy()
        assert got[g][1:] == (len(a), len(b))
        assert abs(got[g][0] - brute_ks(a, b)) < 1e-12
    again = {r.g: r.ks for r in
             ks_exact(df.repartition(7), "v", "side", ["g"]).collect()}
    assert again == {g: v[0] for g, v in got.items()}


def test_sketch_report_groups_sides_and_bound(spark):
    rng = np.random.default_rng(11)
    rows = []
    for side in ("A", "B"):
        for v in rng.exponential(40, size=3000):
            rows.append(("same", side, float(v)))
        for v in rng.exponential(40, size=3000) * (3 if side == "B" else 1):
            rows.append(("drift", side, float(v)))
    rows.append(("lonely", "A", 1.0))  # one-sided group must drop
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "side", "v"]))
    rep = {r.g: r for r in
           ks_sketch_report(df, "v", "side", ["g"]).collect()}
    assert set(rep) == {"same", "drift"}
    assert rep["same"].side_a == "A" and rep["same"].side_b == "B"
    assert rep["same"].n_a == 3000 and rep["same"].n_b == 3000
    pdf = pd.DataFrame(rows, columns=["g", "side", "v"])
    for g in ("same", "drift"):
        a = pdf[(pdf.g == g) & (pdf.side == "A")].v.to_numpy()
        b = pdf[(pdf.g == g) & (pdf.side == "B")].v.to_numpy()
        assert abs(rep[g].ks_sketch - brute_ks(a, b)) <= 0.08
    assert rep["drift"].ks_sketch > 0.25 > 0.1 > rep["same"].ks_sketch


def test_sketch_report_null_side_raises(spark):
    df = spark.createDataFrame(
        [("A", 1.0), (None, 2.0)], "side string, v double")
    with pytest.raises(ValueError, match="non-null"):
        ks_sketch_report(df, "v", "side")


def test_sketch_report_ungrouped(spark):
    rng = np.random.default_rng(13)
    rows = ([(0, float(v)) for v in rng.exponential(9, 2000)]
            + [(1, float(v + 40)) for v in rng.exponential(9, 2000)])
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["side", "v"]))
    r = ks_sketch_report(df, "v", "side").collect()
    assert len(r) == 1 and r[0].ks_sketch > 0.5


def test_ks_window_shift_tracks_planted_shift(spark):
    """20 daily periods of N(0,1), +3 location shift from day 10:
    per-anchor window-vs-window KS must track the brute exact KS within
    the merged rank-guarantee band, track n exactly, and the shift must
    show only at anchors whose windows straddle day 10."""
    from grenier_spark.operators.drift import ks_window_shift_report

    rng = np.random.default_rng(3)
    rows = []
    for d in range(20):
        v = rng.normal(size=300) + (3.0 if d >= 10 else 0.0)
        rows.append(pd.DataFrame({"day": d, "v": v}))
    pdf = pd.concat(rows, ignore_index=True)
    df = spark.createDataFrame(pdf)
    rep = (ks_window_shift_report(df, "v", "day", window=5, k=200)
           .orderBy("day").toPandas())
    # anchors: days 5..19 (day and day-5 both present)
    assert list(rep.day) == list(range(5, 20))
    for r in rep.itertuples():
        a = pdf[(pdf.day >= r.day - 9) & (pdf.day <= r.day - 5)].v.to_numpy()
        b = pdf[(pdf.day >= r.day - 4) & (pdf.day <= r.day)].v.to_numpy()
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.ks_sketch - brute_ks(a, b)) <= 0.05, r
    by_day = rep.set_index("day").ks_sketch
    # fully-straddling anchor is loud; fully-before and fully-after quiet
    assert by_day[14] > 0.4
    assert by_day[9] < 0.15 and by_day[19] < 0.15


def test_ks_window_shift_sparse_periods(spark):
    """Gaps: an anchor emits iff day and day-window are both present;
    missing in-window days just narrow the union."""
    from grenier_spark.operators.drift import ks_window_shift_report

    pdf = pd.DataFrame({"day": [0]*50 + [1]*50 + [4]*50 + [5]*50,
                        "v": np.arange(200, dtype=float)})
    df = spark.createDataFrame(pdf)
    rep = (ks_window_shift_report(df, "v", "day", window=2, k=200)
           .orderBy("day").toPandas())
    # present anchors with day-2 present: day 4 isn't (2 absent)... day 4-2=2 absent
    # day 5: 3 absent -> no row either; day 1: -1 absent. Only pairs (0,?)..
    # present days {0,1,4,5}; day-2 present only for day... none: {0-2,1-2,4-2,5-2} = {-2,-1,2,3}
    assert len(rep) == 0
    pdf2 = pd.DataFrame({"day": [0]*50 + [2]*50 + [3]*50,
                         "v": np.arange(150, dtype=float)})
    rep2 = (ks_window_shift_report(spark.createDataFrame(pdf2), "v", "day",
                                   window=2, k=200).toPandas())
    # day 2 (0 present): prev window = days {-1, 0} -> the 50 day-0 rows;
    # cur window = days {1, 2} -> the 50 day-2 rows
    assert len(rep2) == 1 and rep2.day[0] == 2
    assert (rep2.n_a[0], rep2.n_b[0]) == (50, 50)


def test_psi_sketch_report_matches_numpy_twin(spark):
    """The Spark PSI (one dd build per (group, side), union-bin
    smoothing, fsum of (p-q)ln(p/q)) equals the pure-numpy twin to the
    round-6 contract; a planted x3 scale shift reads >0.25 (industry
    'significant'), the same-distribution group <0.1."""
    import math

    from grenier_spark.core.ddsketch import DDSketch
    from grenier_spark.operators.drift import psi_sketch_report

    rng = np.random.default_rng(17)
    rows = []
    for g in ["stable", "shifted"]:
        for s in ["a", "b"]:
            n = int(rng.integers(300, 500))
            v = rng.gamma(2.0, 30.0 if (g, s) == ("shifted", "b") else 10.0,
                          n)
            v[: n // 40] = 0.0
            rows.append(pd.DataFrame({"g": g, "s": s, "v": v}))
    pdf = pd.concat(rows, ignore_index=True)
    rep = (psi_sketch_report(spark.createDataFrame(pdf).repartition(7),
                             "v", "s", ["g"])
           .toPandas().set_index("g"))

    def twin(gg):
        sk = {}
        for s, ss in gg.groupby("s"):
            d = DDSketch(0.25)
            d.update_batch(ss.v.to_numpy())
            sk[s] = d
        sa, sb = sk["a"], sk["b"]
        ca = dict(zip(sa.idx.tolist(), sa.counts.tolist()))
        cb = dict(zip(sb.idx.tolist(), sb.counts.tolist()))
        if sa.zero_count or sb.zero_count:
            zbin = min(list(ca) + list(cb), default=0) - 1
            ca[zbin] = int(sa.zero_count)
            cb[zbin] = int(sb.zero_count)
        bins = sorted(set(ca) | set(cb))
        da = float(sa.n) + 0.5 * len(bins)
        db = float(sb.n) + 0.5 * len(bins)
        return math.fsum(
            ((ca.get(i, 0) + 0.5) / da - (cb.get(i, 0) + 0.5) / db)
            * math.log(((ca.get(i, 0) + 0.5) / da)
                       / ((cb.get(i, 0) + 0.5) / db)) for i in bins)

    for g, gg in pdf.groupby("g"):
        r = rep.loc[g]
        assert (r.side_a, r.side_b) == ("a", "b")
        assert (r.n_a, r.n_b) == (len(gg[gg.s == "a"]), len(gg[gg.s == "b"]))
        assert round(r.psi, 6) == round(twin(gg), 6), g
    assert rep.loc["shifted"].psi > 0.25 and rep.loc["stable"].psi < 0.1


def test_psi_report_side_contract(spark):
    """NULL side raises; one-sided groups drop; ungrouped path works."""
    from grenier_spark.operators.drift import psi_sketch_report

    pdf = pd.DataFrame({"g": ["x"] * 40 + ["y"] * 20,
                        "s": ["a", "b"] * 20 + ["a"] * 20,
                        "v": np.arange(60, dtype=float) + 1})
    rep = psi_sketch_report(spark.createDataFrame(pdf), "v", "s",
                            ["g"]).toPandas()
    assert list(rep.g) == ["x"]  # y is one-sided -> dropped
    un = psi_sketch_report(
        spark.createDataFrame(pdf[pdf.g == "x"]), "v", "s").toPandas()
    assert len(un) == 1 and un.n_a[0] == 20
    bad = spark.createDataFrame(
        pd.DataFrame({"s": ["a", None], "v": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="non-null"):
        psi_sketch_report(bad, "v", "s")


def test_psi_attribution_matches_twin_and_sql(spark):
    """psi_attribution_report: top-k bins by |term| (ties to lower bin)
    with representative values — bit-equal to the numpy twin and to
    dd_psi_attr_sql on the same data."""
    import duckdb

    from grenier_spark.core.ddsketch import DDSketch
    from grenier_spark.functions.sql_oracles import dd_psi_attr_sql
    from grenier_spark.operators.drift import (dd_psi_terms,
                                               psi_attribution_report)

    rng = np.random.default_rng(23)
    rows = []
    for g in ["stable", "shifted"]:
        for s in ["a", "b"]:
            n = int(rng.integers(300, 500))
            v = rng.gamma(2.0, 30.0 if (g, s) == ("shifted", "b") else 10.0,
                          n)
            v[: n // 40] = 0.0
            rows.append(pd.DataFrame({"g": g, "s": s, "v": v}))
    pdf = pd.concat(rows, ignore_index=True)
    rep = (psi_attribution_report(spark.createDataFrame(pdf).repartition(5),
                                  "v", "s", ["g"], k=3)
           .orderBy("g", "rank").toPandas())
    gamma = 1.25 / 0.75
    for g, gg in pdf.groupby("g"):
        sk = {}
        for s, ss in gg.groupby("s"):
            d = DDSketch(0.25)
            d.update_batch(ss.v.to_numpy())
            sk[s] = d
        tr = dd_psi_terms(sk["a"], sk["b"])
        tr.sort(key=lambda r: (-abs(r[4]), r[0]))
        sub = rep[rep.g == g].reset_index(drop=True)
        assert list(sub["rank"]) == [1, 2, 3]
        for rk, (i, zb, ca, cb, t) in enumerate(tr[:3]):
            row = sub.iloc[rk]
            assert (row.bin, row.c_a, row.c_b) == (i, ca, cb)
            assert row.term == t
            assert row.rep_value == (0.0 if zb
                                     else 2.0 * gamma ** int(i)
                                     / (gamma + 1.0))
    con = duckdb.connect()
    con.register("src", pdf)
    got = con.execute(
        "SELECT * FROM (" + dd_psi_attr_sql("SELECT g, s, v FROM src",
                                            "v", "s", 0.25, ["g"], k=3)
        + ") ORDER BY g, rank").df()
    for c in ["g", "rank", "bin", "c_a", "c_b"]:
        assert list(got[c]) == list(rep[c]), c
    assert list(got.term) == list(rep.term)
    # the planted scale shift's top bins are mass appearing from nothing
    top = rep[(rep.g == "shifted") & (rep["rank"] == 1)].iloc[0]
    assert top.c_a == 0 and top.c_b > 20


def test_psi_guards_alpha_and_third_side(spark):
    """dd_psi_terms refuses mismatched alphas (bucket indices from
    different gammas are not comparable); the report raises loud on a
    THIRD side value instead of silently comparing two of them."""
    from grenier_spark.core.ddsketch import DDSketch
    from grenier_spark.operators.drift import dd_psi_terms, psi_sketch_report

    a = DDSketch(0.25)
    a.update_batch(np.arange(1.0, 50.0))
    b = DDSketch(0.01)
    b.update_batch(np.arange(1.0, 50.0))
    with pytest.raises(ValueError, match="alpha mismatch"):
        dd_psi_terms(a, b)
    pdf = pd.DataFrame({"s": ["a"] * 10 + ["b"] * 10 + ["c"] * 10,
                        "v": np.arange(30, dtype=float) + 1})
    with pytest.raises(Exception, match="exactly two values"):
        psi_sketch_report(spark.createDataFrame(pdf), "v", "s").collect()


def test_ks_sketch_report_third_side_raises(spark):
    """Same loud third-side contract as the PSI scaffold (silently
    comparing the two smallest labels would diverge from the SQL twin)."""
    from grenier_spark.operators.drift import ks_sketch_report

    pdf = pd.DataFrame({"s": ["a"] * 10 + ["b"] * 10 + ["c"] * 10,
                        "v": np.arange(30, dtype=float) + 1})
    with pytest.raises(Exception, match="exactly two values"):
        ks_sketch_report(spark.createDataFrame(pdf), "v", "s").collect()


def test_weighted_psi_equals_repeat_expansion(spark):
    """psi_sketch_report(weight_col=) must equal the unweighted report
    over the weight-expanded stream on every column — the weighted dd
    state IS the expanded histogram (update_batch_weighted contract),
    so n_a/n_b become total weights and the psi doubles are identical."""
    from grenier_spark.operators.drift import psi_sketch_report

    rng = np.random.default_rng(23)
    n = 400
    pdf = pd.DataFrame({
        "g": np.where(np.arange(n) % 2 == 0, "g1", "g2"),
        "s": np.where(rng.random(n) < 0.5, "a", "b"),
        "v": np.round(rng.lognormal(4.0, 1.0, n), 2),
        "w": rng.integers(1, 12, n).astype("int64")})
    pdf.loc[pdf.g == "g2", "v"] *= np.where(
        pdf.loc[pdf.g == "g2", "s"] == "b", 3.0, 1.0)  # planted drift
    wrep = (psi_sketch_report(spark.createDataFrame(pdf), "v", "s",
                              ["g"], alpha=0.25, weight_col="w")
            .toPandas().sort_values("g").reset_index(drop=True))
    expanded = pdf.loc[pdf.index.repeat(pdf.w)].drop(columns="w")
    urep = (psi_sketch_report(spark.createDataFrame(expanded), "v", "s",
                              ["g"], alpha=0.25)
            .toPandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(wrep, urep)
    # the planted x3 shift must dominate the (sizeable, 100-docs-a-side)
    # split noise; the hard contract is the frame equality above
    assert wrep.loc[wrep.g == "g2", "psi"].iloc[0] > \
        3 * wrep.loc[wrep.g == "g1", "psi"].iloc[0]


def test_weighted_attribution_equals_repeat_expansion(spark):
    """psi_attribution_report(weight_col=) — the weighted top-|term|
    bins, counts (weight sums) and representative values must equal the
    unweighted report over the weight-expanded stream on every column
    (closing the oracle-coverage gap the weighted PSI report test leaves
    for the attribution face)."""
    from grenier_spark.operators.drift import psi_attribution_report

    rng = np.random.default_rng(27)
    n = 300
    pdf = pd.DataFrame({
        "g": np.where(np.arange(n) % 2 == 0, "g1", "g2"),
        "s": np.where(rng.random(n) < 0.5, "a", "b"),
        "v": np.round(rng.lognormal(4.0, 1.0, n), 2),
        "w": rng.integers(1, 10, n).astype("int64")})
    pdf.loc[pdf.g == "g2", "v"] *= np.where(
        pdf.loc[pdf.g == "g2", "s"] == "b", 3.0, 1.0)
    wrep = (psi_attribution_report(spark.createDataFrame(pdf), "v", "s",
                                   ["g"], alpha=0.25, k=3,
                                   weight_col="w")
            .toPandas().sort_values(["g", "rank"]).reset_index(drop=True))
    expanded = pdf.loc[pdf.index.repeat(pdf.w)].drop(columns="w")
    urep = (psi_attribution_report(spark.createDataFrame(expanded), "v",
                                   "s", ["g"], alpha=0.25, k=3)
            .toPandas().sort_values(["g", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(wrep, urep)


def test_weighted_attribution_sql_value_exact(spark):
    """dd_psi_attr_sql(weight_col=) replays the weighted attribution
    value-exactly: ranking, weight-sum counts, representative values and
    signed terms all bit-equal (round-6 doubles)."""
    import duckdb

    from grenier_spark.functions.sql_oracles import dd_psi_attr_sql
    from grenier_spark.operators.drift import psi_attribution_report

    rng = np.random.default_rng(29)
    n = 240
    pdf = pd.DataFrame({
        "g": np.where(np.arange(n) % 2 == 0, "g1", "g2"),
        "s": np.where(rng.random(n) < 0.5, "a", "b"),
        "v": np.round(rng.lognormal(3.0, 1.2, n), 2),
        "w": rng.integers(1, 15, n).astype("int64")})
    pdf.loc[(pdf.g == "g2") & (pdf.s == "b"), "v"] *= 3.0
    got = (psi_attribution_report(spark.createDataFrame(pdf), "v", "s",
                                  ["g"], alpha=0.25, k=3, weight_col="w")
           .toPandas())
    con = duckdb.connect()
    con.register("src", pdf)
    exp = con.execute(dd_psi_attr_sql("SELECT g, s, v, w FROM src", "v",
                                      "s", 0.25, ["g"], k=3,
                                      weight_col="w")).df()
    got = got.sort_values(["g", "rank"]).reset_index(drop=True)
    exp = exp[got.columns].sort_values(["g", "rank"]).reset_index(drop=True)
    for c in ("g", "side_a", "side_b", "rank", "bin", "c_a", "c_b"):
        assert list(got[c]) == list(exp[c]), c
    for c in ("rep_value", "term"):
        assert [round(x, 6) for x in got[c]] == \
            [round(x, 6) for x in exp[c]], c


def test_dd_ks_pair_matches_sql_and_bounds_true_ks():
    """dd_ks_pair: (a) bit-equal to the DuckDB dd_ks_sql replay, (b) a
    deterministic LOWER bound of the true KS that tightens as alpha
    shrinks, (c) loud on empty sides and alpha mismatch."""
    import duckdb

    from grenier_spark.core.ddsketch import DDSketch
    from grenier_spark.functions.sql_oracles import dd_ks_sql
    from grenier_spark.operators.drift import dd_ks_pair

    rng = np.random.default_rng(33)
    a = rng.gamma(2.0, 20.0, 4000)
    b = rng.gamma(2.0, 55.0, 3000)
    a[:17] = 0.0
    truth = brute_ks(a, b)
    prev = 0.0
    for alpha in (0.4, 0.25, 0.05, 0.01):
        sa, sb = DDSketch(alpha), DDSketch(alpha)
        sa.update_batch(a)
        sb.update_batch(b)
        n_bins, ks = dd_ks_pair(sa, sb)
        assert ks <= truth + 1e-12
        assert ks >= prev - 0.02  # tightens (monotone up to bin jitter)
        prev = ks
    assert ks > 0.95 * truth  # alpha=0.01 bins are fine enough

    # cross-engine: the alpha=0.25 chain replayed by DuckDB, bit-equal
    sa, sb = DDSketch(0.25), DDSketch(0.25)
    sa.update_batch(a)
    sb.update_batch(b)
    pdf = pd.DataFrame({
        "s": ["a"] * len(a) + ["b"] * len(b),
        "v": np.concatenate([a, b])})
    con = duckdb.connect()
    con.register("src", pdf)
    row = con.execute(dd_ks_sql("SELECT s, v FROM src", "v", "s",
                                0.25)).fetchone()
    n_bins, ks = dd_ks_pair(sa, sb)
    assert row[2] == sa.n and row[3] == sb.n
    assert row[4] == n_bins and row[5] == ks  # bit-equal, no round needed

    with pytest.raises(ValueError, match="alpha mismatch"):
        dd_ks_pair(DDSketch(0.1), DDSketch(0.2))
    with pytest.raises(ValueError, match="empty"):
        dd_ks_pair(DDSketch(0.25), sb)


def test_dd_ks_report_weighted_equals_expansion_and_flags_drift(spark):
    """dd_ks_report: weighted == repeat-expansion on every column, and a
    planted x3 scale shift reads a large binned KS while the A/B split
    stays near zero."""
    from grenier_spark.operators.drift import dd_ks_report

    rng = np.random.default_rng(35)
    n = 500
    pdf = pd.DataFrame({
        "g": np.where(np.arange(n) % 2 == 0, "same", "shift"),
        "s": np.where(rng.random(n) < 0.5, "a", "b"),
        "v": np.round(rng.lognormal(3.5, 0.8, n), 2),
        "w": rng.integers(1, 9, n).astype("int64")})
    pdf.loc[(pdf.g == "shift") & (pdf.s == "b"), "v"] *= 3.0
    wrep = (dd_ks_report(spark.createDataFrame(pdf), "v", "s", ["g"],
                         alpha=0.25, weight_col="w")
            .toPandas().sort_values("g").reset_index(drop=True))
    expanded = pdf.loc[pdf.index.repeat(pdf.w)].drop(columns="w")
    urep = (dd_ks_report(spark.createDataFrame(expanded), "v", "s", ["g"],
                         alpha=0.25)
            .toPandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(wrep, urep)
    f = wrep.set_index("g").ks
    assert f["shift"] > 0.5 and f["same"] < 0.2
