"""Deterministic splitting/sampling (operators/splits.py)."""

import numpy as np
import pandas as pd
import pytest

from grenier_spark.operators.splits import (assign_split, mixture_resample,
                                            split_thresholds,
                                            stratified_sample)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)}))


def test_thresholds_shape():
    t = split_thresholds(WEIGHTS)
    assert [n for n, _ in t] == ["train", "val", "test"]
    assert t[-1][1] is None
    assert all(len(h) == 16 and h == h.lower() for _, h in t[:-1])
    assert t[0][1] < t[1][1]  # hex order == numeric order
    with pytest.raises(ValueError):
        split_thresholds({"only": 1.0})


def test_assign_split_exhaustive_and_deterministic(spark, ids):
    a = assign_split(ids, WEIGHTS, seed=7).toPandas()
    assert len(a) == 5000 and a.split.notna().all()
    b = assign_split(ids.repartition(13), WEIGHTS, seed=7).toPandas()
    assert dict(zip(a.doc_id, a.split)) == dict(zip(b.doc_id, b.split))
    # fractions hold to binomial deviation (5 sigma at n=5000)
    frac = a.split.value_counts(normalize=True)
    for name, w in WEIGHTS.items():
        sigma = (w * (1 - w) / 5000) ** 0.5
        assert abs(frac[name] - w) < 5 * sigma, (name, frac[name])


def test_assign_split_seed_rotates_membership(spark, ids):
    a = assign_split(ids, WEIGHTS, seed=7).toPandas()
    c = assign_split(ids, WEIGHTS, seed=8).toPandas()
    same = (a.sort_values("doc_id").split.to_numpy()
            == c.sort_values("doc_id").split.to_numpy()).mean()
    # P(same split under independent hashes) = sum w_i^2 = 0.66
    assert 0.55 < same < 0.77, same


MIX = {"a": 2.5, "b": 0.25, "c": 0.0, "d": 2.0}


@pytest.fixture(scope="module")
def sourced(spark):
    n = 2000
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": np.array(list("abcde"))[np.arange(n) % 5]}))


def test_mixture_counts_and_replica_semantics(spark, sourced):
    out = mixture_resample(sourced, MIX, default_weight=0.5,
                           seed=3).toPandas()
    per = out.groupby("source").size()
    # 400 docs/source. Integer part is EXACT, fractional part binomial.
    assert per["d"] == 800  # w=2 -> exactly 2 copies, no fractional leak
    assert "c" not in per.index  # w=0 drops the source entirely
    for s, w in (("a", 2.5), ("b", 0.25), ("e", 0.5)):
        full, frac = int(w), w - int(w)
        sigma = (400 * frac * (1 - frac)) ** 0.5
        assert abs(per[s] - 400 * w) < 5 * sigma + 1e-9, (s, per[s])
    # full copies are unconditional: every 'a' doc has reps {0, 1}
    a = out[out.source == "a"]
    full_reps = a[a.rep < 2].groupby("doc_id").rep.agg(["size", "max"])
    assert (full_reps["size"] == 2).all() and (full_reps["max"] == 1).all()
    assert a.rep.max() == 2 and set(a.rep) == {0, 1, 2}


def test_mixture_deterministic_under_repartition_and_seed(spark, sourced):
    a = mixture_resample(sourced, MIX, seed=3).toPandas()
    b = mixture_resample(sourced.repartition(17), MIX, seed=3).toPandas()
    key = lambda d: set(zip(d.doc_id, d.rep, d.source))
    assert key(a) == key(b)
    c = mixture_resample(sourced, MIX, seed=4).toPandas()
    # fractional replicas rotate with the seed; full copies never move
    assert key(a) != key(c)
    fw = {"a": 2, "b": 0, "c": 0, "d": 2, "e": 0}  # floor(weight)
    full = lambda d: d[d.rep < d.source.map(fw)]
    assert key(full(a)) == key(full(c))
    with pytest.raises(ValueError):
        mixture_resample(sourced, {"a": -1.0})


def test_stratified_sample_fraction_and_subset_property(spark, ids):
    s10 = stratified_sample(ids, 0.10, seed=3).toPandas()
    s20 = stratified_sample(ids, 0.20, seed=3).toPandas()
    sigma10 = (0.1 * 0.9 / 5000) ** 0.5
    assert abs(len(s10) / 5000 - 0.10) < 5 * sigma10
    # threshold sampling is NESTED: raising the fraction only adds rows
    assert set(s10.doc_id) <= set(s20.doc_id)
    with pytest.raises(ValueError):
        stratified_sample(ids, 1.5)


# -- temperature mixture weights -------------------------------------------

def test_temperature_weights_properties():
    from grenier_spark.operators.splits import temperature_weights

    sizes = {"big": 8000.0, "mid": 1500.0, "small": 500.0}
    # T=1: proportional sampling == pass-through (every weight 1.0 at
    # default budget)
    w1 = temperature_weights(sizes, 1.0)
    assert all(abs(w - 1.0) < 1e-12 for w in w1.values())
    # T>1 upweights small sources, downweights big ones; expected output
    # volume == budget exactly
    w5 = temperature_weights(sizes, 5.0)
    assert w5["small"] > 1.0 > w5["big"]
    assert w5["small"] > w5["mid"] > w5["big"]
    out_volume = sum(w5[s] * n for s, n in sizes.items())
    assert abs(out_volume - sum(sizes.values())) < 1e-6
    # budget scales linearly; max_weight caps tiny-source repetition
    wb = temperature_weights(sizes, 5.0, budget=5000.0)
    assert abs(wb["mid"] / w5["mid"] - 0.5) < 1e-12
    wc = temperature_weights(sizes, 100.0, max_weight=2.0)
    assert wc["small"] == 2.0
    import pytest as _pt
    with _pt.raises(ValueError):
        temperature_weights(sizes, 0.0)
    with _pt.raises(ValueError):
        temperature_weights({"a": 0.0}, 1.0)


def test_annealed_schedule_moves_monotonically():
    from grenier_spark.operators.splits import annealed_temperature_schedule

    sizes = {"big": 8000.0, "small": 500.0}
    sched = annealed_temperature_schedule(sizes, t_start=5.0, t_end=1.0,
                                          n_epochs=4)
    assert len(sched) == 4
    # annealing toward T=1: the small source's upweighting decays each
    # epoch, ending at pass-through
    smalls = [m["small"] for m in sched]
    assert all(a > b for a, b in zip(smalls, smalls[1:]))
    assert abs(smalls[-1] - 1.0) < 1e-12
    assert len(annealed_temperature_schedule(sizes, 2.0, 1.0, 1)) == 1


def test_temperature_weights_drive_mixture(spark, sourced):
    """Integration: temperature weights feed mixture_resample and the
    realized per-source counts hit budget * q_i within binomial noise."""
    from grenier_spark.operators.splits import temperature_weights

    sizes = {s: 400.0 for s in "abcde"}  # uniform fixture
    # uniform sizes => any T gives q=1/5; use a budget to force fractions
    w = temperature_weights(sizes, 2.0, budget=1000.0)
    out = mixture_resample(sourced, w, default_weight=0.0, seed=6).toPandas()
    per = out.groupby("source").size()
    for s in sizes:
        assert abs(per.get(s, 0) - 200.0) < 5 * (400 * 0.5 * 0.5) ** 0.5


# -- priority sampling (weighted, without replacement) ----------------------

@pytest.fixture(scope="module")
def weighted(spark):
    n = 3000
    rng = np.random.default_rng(5)
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": np.array(list("abc"))[np.arange(n) % 3],
        "w": rng.integers(1, 1000, n).astype(np.int64)}))


def test_priority_sample_shape_and_determinism(spark, weighted):
    from grenier_spark.operators.splits import priority_sample

    a = (priority_sample(weighted, k=7, weight_col="w", group_col="source",
                         seed=1).toPandas().sort_values(["source",
                                                         "sample_rank"]))
    assert set(a.groupby("source").size()) == {7}
    assert all(list(g.sample_rank) == list(range(1, 8))
               for _, g in a.groupby("source"))
    b = (priority_sample(weighted.repartition(17), k=7, weight_col="w",
                         group_col="source", seed=1)
         .toPandas().sort_values(["source", "sample_rank"]))
    assert list(a.doc_id) == list(b.doc_id)
    c = priority_sample(weighted, k=7, weight_col="w", group_col="source",
                        seed=2).toPandas()
    assert set(a.doc_id) != set(c.doc_id)  # seed rotates the sample


def test_priority_sample_weight_bias(spark, weighted):
    """Across many seeds, mean weight of sampled docs must exceed the
    population mean by a wide margin (w/u priorities favor heavy items)."""
    from grenier_spark.operators.splits import priority_sample

    pop = weighted.toPandas()
    means = []
    for seed in range(8):
        s = priority_sample(weighted, k=20, weight_col="w",
                            group_col="source", seed=seed).toPandas()
        means.append(s.w.mean())
    # size-biased sampling: expected sampled-weight mean ~ E[w^2]/E[w]
    # (= 4/3 of the mean for uniform weights); assert well above the
    # unweighted mean but below the exact size-biased ceiling
    assert np.mean(means) > 1.2 * pop.w.mean(), (np.mean(means),
                                                 pop.w.mean())


def test_priority_sample_matches_pure_python(spark, weighted):
    """Bit-exact twin of the documented spec: u from md5 hex chars 4..16,
    q = w * 2^52 / (h52+1), top-k by (q desc, id)."""
    import hashlib

    from grenier_spark.operators.splits import priority_sample

    pop = weighted.toPandas()
    k, seed = 5, 9

    def prio(row):
        h = hashlib.md5(f"{row.doc_id}:prio{seed}".encode()).hexdigest()
        h52 = int(h[3:16], 16)
        return row.w * float(1 << 52) / float(h52 + 1)

    pop["q"] = [prio(r) for r in pop.itertuples()]
    exp = (pop.sort_values(["q", "doc_id"], ascending=[False, True])
           .groupby("source").head(k))
    exp_ids = {s: list(g.sort_values("q", ascending=False).doc_id)
               for s, g in exp.groupby("source")}
    got = priority_sample(weighted, k=k, weight_col="w",
                          group_col="source", seed=seed).toPandas()
    got_ids = {s: list(g.sort_values("sample_rank").doc_id)
               for s, g in got.groupby("source")}
    assert got_ids == exp_ids


def _dlt_pandas(pop: pd.DataFrame, k: int, seed: int) -> pd.DataFrame:
    """Pure-pandas DLT twin: md5-chain priorities, per-group tau = the
    (k+1)-th largest priority (0 when the group is small), sampled rows
    with w_hat = max(w, tau)."""
    import hashlib

    q = np.array([
        r.w * float(1 << 52)
        / float(int(hashlib.md5(f"{r.doc_id}:prio{seed}".encode())
                    .hexdigest()[3:16], 16) + 1)
        for r in pop.itertuples()])
    d = pop.assign(_q=q).sort_values(["_q", "doc_id"],
                                     ascending=[False, True])
    out = []
    for s, g in d.groupby("source", sort=False):
        tau = float(g["_q"].iloc[k]) if len(g) > k else 0.0
        smp = g.head(k).copy()
        smp["tau"] = tau
        smp["w_hat"] = np.maximum(smp["w"].astype(float), tau)
        out.append(smp)
    return pd.concat(out).drop(columns="_q")


def test_priority_estimate_exact_when_group_small(spark):
    """A group with <= k items is fully sampled with tau = 0, so every
    subset estimate is EXACT."""
    from grenier_spark.operators.splits import priority_sample_estimate

    pdf = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                        "source": ["a"] * 6,
                        "w": np.int64([5, 10, 20, 40, 80, 160])})
    got = priority_sample_estimate(spark.createDataFrame(pdf), k=10,
                                   weight_col="w").toPandas()
    assert len(got) == 6
    assert (got.tau == 0.0).all()
    assert got.w_hat.sum() == float(pdf.w.sum())


def test_priority_estimate_spark_matches_pandas(spark, weighted):
    """tau and every w_hat equal the pure-pandas DLT twin bit-for-bit
    (the deterministic chain that makes the SQL oracle value-exact)."""
    from grenier_spark.operators.splits import priority_sample_estimate

    k, seed = 12, 4
    pop = weighted.toPandas()
    want = _dlt_pandas(pop, k, seed)
    got = priority_sample_estimate(weighted.repartition(11), k=k,
                                   weight_col="w", seed=seed).toPandas()
    wmap = want.set_index("doc_id")
    gmap = got.set_index("doc_id")
    assert set(gmap.index) == set(wmap.index)
    assert all(gmap.loc[i, "tau"] == wmap.loc[i, "tau"] for i in gmap.index)
    assert all(gmap.loc[i, "w_hat"] == wmap.loc[i, "w_hat"]
               for i in gmap.index)


def test_priority_estimate_unbiased_over_seeds():
    """DLT Thm 1: E[sum(w_hat over sample ∩ S)] = sum(w over S) for any
    fixed subset S. Seed-averaged estimates must converge to the truth
    (pure-pandas twin — the chain is engine-identical)."""
    rng = np.random.default_rng(13)
    n = 900
    pop = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": np.array(list("ab"))[np.arange(n) % 2],
        "w": rng.integers(1, 500, n).astype(np.int64)})
    subset = pop.doc_id % 3 == 0  # fixed independently of the hash chain
    truth = pop[subset].groupby("source").w.sum()
    ests = []
    for seed in range(60):
        s = _dlt_pandas(pop, k=40, seed=seed)
        e = (s[s.doc_id % 3 == 0].groupby("source").w_hat.sum()
             .reindex(truth.index, fill_value=0.0))
        ests.append(e)
    mean_est = pd.concat(ests, axis=1).mean(axis=1)
    rel = (mean_est - truth.astype(float)).abs() / truth
    # 60 seeds x k=40 per group: mean-of-estimates within a few percent
    assert (rel < 0.06).all(), rel.to_dict()


def test_priority_estimate_merge_fold():
    """Mergeability: the global top-(k+1) priority list (sample + tau) is
    recoverable from per-partition top-(k+1) lists — the order-statistic
    fold the distributed build rides."""
    rng = np.random.default_rng(3)
    prios = rng.random(5000)
    k = 25
    direct = np.sort(prios)[::-1][:k + 1]
    parts = np.array_split(prios, 7)
    folded = np.concatenate([np.sort(p)[::-1][:k + 1] for p in parts])
    fold = np.sort(folded)[::-1][:k + 1]
    assert np.array_equal(direct, fold)


# -- exact-quota stratified sampling ---------------------------------------

@pytest.fixture(scope="module")
def grouped_ids(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "doc_id": np.arange(2000, dtype=np.int64) * 7 + 1,
        "source": [f"s{g}" for g in rng.integers(0, 6, 2000)],
    })
    # one tiny group below the quota
    pdf.loc[:2, "source"] = "tiny"
    pdf.loc[3:, "source"] = pdf.loc[3:, "source"].replace("s5", "s0")
    return spark.createDataFrame(pdf)


def _quota_reference(pdf, k, seed):
    import hashlib

    h = pdf.assign(sample_hash=[
        hashlib.md5(f"{i}:quo:{seed}".encode()).hexdigest()[:16]
        for i in pdf.doc_id])
    h = h.sort_values(["source", "sample_hash", "doc_id"])
    h["rank"] = h.groupby("source").cumcount() + 1
    return h[h["rank"] <= k][["source", "doc_id", "sample_hash", "rank"]] \
        .reset_index(drop=True)


def test_quota_sample_matches_window_reference(spark, grouped_ids):
    from grenier_spark.operators.splits import quota_sample

    got = (quota_sample(grouped_ids, k=15, seed=4)
           .toPandas().sort_values(["source", "rank"])
           .reset_index(drop=True))
    exp = _quota_reference(grouped_ids.toPandas(), 15, 4) \
        .sort_values(["source", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns].astype(exp.dtypes.to_dict()), exp)
    # exact quotas: min(k, |group|) per group — the tiny group yields all
    # its rows
    sizes = got.groupby("source").size()
    assert sizes["tiny"] == 3
    assert (sizes.drop("tiny") == 15).all()


def test_quota_sample_partitioning_invariant_and_seeded(spark, grouped_ids):
    from grenier_spark.operators.splits import quota_sample

    a = quota_sample(grouped_ids, k=10, seed=1).toPandas()
    b = quota_sample(grouped_ids.repartition(17), k=10, seed=1,
                     n_salts=8).toPandas()
    key = lambda d: sorted(map(tuple, d[["source", "doc_id", "rank"]]
                               .itertuples(index=False)))
    assert key(a) == key(b)
    c = quota_sample(grouped_ids, k=10, seed=2).toPandas()
    assert key(a) != key(c)  # a fresh seed redraws the sample


def test_quota_sample_plan_has_no_window(spark, grouped_ids):
    from grenier_spark.operators.splits import quota_sample

    plan = quota_sample(grouped_ids, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan, plan
