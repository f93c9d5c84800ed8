"""Deterministic training-order shuffle (operators/ordering.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from grenier_spark.operators.ordering import shuffle_order
from grenier_spark.operators.splits import mixture_resample


@pytest.fixture(scope="module")
def docs(spark):
    n = 4000
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": np.array(list("abcd"))[np.arange(n) % 4]}))


def test_shard_agrees_with_order_ranges_and_balance(spark, docs):
    out = (shuffle_order(docs, 8, seed=2).toPandas()
           .sort_values("order_key").reset_index(drop=True))
    # shard boundaries ARE order_key ranges: globally sorted keys walk the
    # shards monotonically, so "read shards in order, each sorted" == the
    # one global order
    assert (out.shard.diff().dropna() >= 0).all()
    assert set(out.shard) == set(range(8))
    # balanced to binomial deviation
    sigma = (4000 * (1 / 8) * (7 / 8)) ** 0.5
    assert (abs(out.shard.value_counts() - 500) < 5 * sigma).all()
    # order keys unique at this scale, fixed-width lowercase hex
    assert out.order_key.is_unique
    assert out.order_key.str.fullmatch(r"[0-9a-f]{16}").all()


def test_deterministic_and_seed_rotates(spark, docs):
    a = shuffle_order(docs, 8, seed=2).toPandas()
    b = shuffle_order(docs.repartition(11), 8, seed=2).toPandas()
    ka = dict(zip(a.doc_id, zip(a.order_key, a.shard)))
    assert ka == dict(zip(b.doc_id, zip(b.order_key, b.shard)))
    c = shuffle_order(docs, 8, seed=3).toPandas()
    order_a = a.sort_values("order_key").doc_id.tolist()
    order_c = c.sort_values("order_key").doc_id.tolist()
    assert order_a != order_c  # fresh epoch order
    assert sorted(order_a) == sorted(order_c)  # same corpus
    with pytest.raises(ValueError):
        shuffle_order(docs, 0)


def test_replicas_get_distinct_positions(spark, docs):
    mixed = mixture_resample(docs, {"a": 3.0}, default_weight=1.0, seed=1)
    out = shuffle_order(mixed, 4, rep_col="rep", seed=2).toPandas()
    a = out[out.source == "a"]
    assert len(a) == 3000 and a.order_key.is_unique  # replicas spread out
    # a replica's position is independent of its siblings: the 3 copies of
    # one doc should not cluster in one shard systematically
    spread = a.groupby("doc_id").shard.nunique()
    assert spread.mean() > 2.0  # E[distinct shards of 3 draws from 4]=2.31


def test_single_shard_degenerate(spark, docs):
    out = shuffle_order(docs, 1, seed=0).toPandas()
    assert (out.shard == 0).all()


def test_stride_interleave_prefix_exactness(spark, docs):
    from grenier_spark.operators.ordering import (_STRIDE_SCALE,
                                                  stride_interleave)

    out = stride_interleave(docs, {"a": 4.0, "b": 2.0}, seed=1).toPandas()
    strides = {"a": _STRIDE_SCALE // 4, "b": _STRIDE_SCALE // 2,
               "c": _STRIDE_SCALE, "d": _STRIDE_SCALE}
    # stride scheduling is EXACT, not in-expectation: source s occupies
    # positions stride_s, 2*stride_s, ... so any prefix P holds exactly
    # min(n_s, P // stride_s) docs of s
    for P in (_STRIDE_SCALE * 3, _STRIDE_SCALE * 117, _STRIDE_SCALE * 5000):
        got = out[out.pos <= P].groupby("source").size()
        for s, st in strides.items():
            assert got.get(s, 0) == min(1000, P // st), (P, s)
    # within a source the pos sequence is the full arithmetic progression
    a = sorted(out[out.source == "a"].pos)
    assert a == [strides["a"] * k for k in range(1, 1001)]


def test_stride_interleave_deterministic_and_seeded(spark, docs):
    from grenier_spark.operators.ordering import stride_interleave

    a = stride_interleave(docs, {"a": 4.0}, seed=1).toPandas()
    b = stride_interleave(docs.repartition(7), {"a": 4.0}, seed=1).toPandas()
    assert (dict(zip(a.doc_id, a.pos)) == dict(zip(b.doc_id, b.pos)))
    c = stride_interleave(docs, {"a": 4.0}, seed=2).toPandas()
    # the position GRID is fixed; which doc sits where rotates with seed
    assert sorted(a.pos) == sorted(c.pos)
    assert dict(zip(a.doc_id, a.pos)) != dict(zip(c.doc_id, c.pos))
    with pytest.raises(ValueError):
        stride_interleave(docs, {"a": 0.0})


def test_stride_interleave_bucketed_rank_identical(spark, docs):
    """The skew-proof two-pass rank (hex-range buckets + broadcast prefix
    offsets) must produce POSITIONS IDENTICAL to the single-window path —
    it's a physical rewrite, not a semantic variant — INCLUDING rows with
    a NULL source (a legitimate window partition; the offset join is
    null-safe)."""
    from grenier_spark.operators.ordering import stride_interleave

    withnull = docs.withColumn(
        "source", F.when(F.col("doc_id") % 17 == 0, F.lit(None))
        .otherwise(F.col("source")))
    base = stride_interleave(withnull, {"a": 4.0, "b": 2.0},
                             seed=1).toPandas()
    assert base.source.isna().any()  # the NULL partition is populated
    for B in (1, 7, 64):
        bkt = stride_interleave(withnull, {"a": 4.0, "b": 2.0}, seed=1,
                                rank_buckets=B).toPandas()
        assert (dict(zip(bkt.doc_id, bkt.pos))
                == dict(zip(base.doc_id, base.pos))), B
    with pytest.raises(ValueError):
        stride_interleave(docs, {"a": 1.0}, rank_buckets=0)
    # above the 2^20 cap: pass 1 collects n_sources * B occupancy rows to
    # the driver, so a huge B must be a LOUD error, not a driver OOM
    with pytest.raises(ValueError, match="2\\^20"):
        stride_interleave(docs, {"a": 1.0}, rank_buckets=(1 << 20) + 1)


def test_mixture_then_shuffle_same_seed_is_unbiased(spark, docs):
    """Regression: the mixture keep-hash and the order-key chain are
    domain-tagged (mix/ord). If they aliased, a same-seed pipeline's
    surviving fractional replicas (keep-hash < threshold) would BE the
    lowest order keys: every kept doc of a w=0.5 source would land in the
    first half of the shuffle and in shards [0, n/2) only."""
    from grenier_spark.operators.splits import mixture_resample

    mixed = mixture_resample(docs, {"a": 0.5}, default_weight=1.0, seed=3)
    out = (shuffle_order(mixed, 8, rep_col="rep", seed=3)
           .where("source = 'a'").toPandas())
    top_half = (out.order_key >= "8000000000000000").mean()
    assert 0.35 < top_half < 0.65, top_half  # ~half, not zero
    assert set(out.shard) == set(range(8))   # all shards populated


def test_write_read_shards_roundtrip_and_verify(spark, docs, tmp_path):
    from grenier_spark.operators.ordering import (read_training_shards,
                                                  write_training_shards)

    sh = shuffle_order(docs, 4, seed=9)
    path = str(tmp_path / "corpus")
    manifest = write_training_shards(sh, path, 4)
    assert sum(s["n_rows"] for s in manifest["shards"]) == 4000
    # shard key ranges don't overlap: reading shard dirs in shard order,
    # each file already sorted, replays the single global order
    for a, b in zip(manifest["shards"], manifest["shards"][1:]):
        assert a["max_key"] < b["min_key"]
    back = read_training_shards(spark, path).toPandas()
    expect = sh.toPandas()
    assert (set(zip(back.doc_id, back.order_key, back.shard.astype(int)))
            == set(zip(expect.doc_id, expect.order_key, expect.shard)))
    # each shard dir holds ONE sorted file (deterministic layout)
    import glob
    for s in manifest["shards"]:
        files = glob.glob(f"{path}/shard={s['shard']}/*.parquet")
        assert len(files) == 1, files
        pdf = pd.read_parquet(files[0])
        assert pdf.order_key.is_monotonic_increasing
        assert len(pdf) == s["n_rows"]


def test_read_shards_fails_loudly_on_damage(spark, docs, tmp_path):
    import glob
    import os

    from grenier_spark.operators.ordering import (read_training_shards,
                                                  write_training_shards)

    path = str(tmp_path / "corpus")
    write_training_shards(shuffle_order(docs, 4, seed=9), path, 4)
    victim = glob.glob(f"{path}/shard=2/*.parquet")[0]
    os.remove(victim)
    with pytest.raises(RuntimeError, match="diverge"):
        read_training_shards(spark, path)
    # manifest-less dir (crashed write) is "no table", not silent data
    os.remove(f"{path}/_manifest.json")
    with pytest.raises(FileNotFoundError):
        read_training_shards(spark, path)


def test_footer_stats_manifest_matches_scan(spark, docs, tmp_path):
    """stats='footer' builds the manifest from parquet row-group footers
    only (zero data pages) and must agree with the scan mode on
    n_rows/min/max per shard."""
    from grenier_spark.operators.ordering import write_training_shards

    sh = shuffle_order(docs, 4, seed=9)
    m_scan = write_training_shards(sh, str(tmp_path / "a"), 4)
    m_foot = write_training_shards(sh, str(tmp_path / "b"), 4,
                                   stats="footer")
    key = lambda m: [(s["shard"], s["n_rows"], s["min_key"], s["max_key"])
                     for s in m["shards"]]
    assert key(m_scan) == key(m_foot)
    with pytest.raises(ValueError, match="footers carry no sums"):
        write_training_shards(sh, str(tmp_path / "c"), 4,
                              token_col="doc_id", stats="footer")


def test_stride_interleave_bucketed_nonstring_source(spark, docs):
    """rank_buckets path must accept a non-string source column (offsets
    schema mirrors the real dtype instead of hardcoding string)."""
    from pyspark.sql import functions as F

    from grenier_spark.operators.ordering import stride_interleave

    idocs = docs.withColumn(
        "src_id", (F.col("doc_id") % 3).cast("long")).drop("source")
    a = (stride_interleave(idocs, {0: 2.0}, source_col="src_id",
                           rank_buckets=4, seed=2)
         .select("doc_id", "pos").toPandas().sort_values("doc_id"))
    b = (stride_interleave(idocs, {0: 2.0}, source_col="src_id",
                           seed=2)
         .select("doc_id", "pos").toPandas().sort_values("doc_id"))
    assert a.pos.tolist() == b.pos.tolist()
