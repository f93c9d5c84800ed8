"""Cuckoo filter (core/cuckoo.py): the deletable membership member of the
sketch family. No-false-negative guarantee through eviction chains and
deletions, delete exactness for inserted keys, structural fpr, serde,
merge-with-loud-overflow, and the distributed build path."""

import numpy as np
import pandas as pd
import pytest

from grenier_spark.core.cuckoo import MAX_KICKS, SLOTS, Cuckoo, params_for


def _keys(n, seed):
    r = np.random.default_rng(seed)
    ks = np.unique(r.integers(0, 2**63, n * 2, dtype=np.int64)
                   .astype(np.uint64))[:n]
    assert ks.size == n
    return ks


def test_no_false_negatives_at_high_load_with_evictions():
    """Fill to ~0.9 load (well past first-try placement — eviction chains
    must run) and every inserted key still probes TRUE."""
    nb = 1 << 12
    n = int(nb * SLOTS * 0.9)
    c = Cuckoo(nb, 16, seed=3)
    ks = _keys(n, 1)
    c.update_batch(ks)
    assert c.load_factor() == pytest.approx(0.9, abs=0.01)
    assert c.contains(ks).all()


def test_fpr_structural_bound():
    """Fresh keys probe TRUE at ~ 2*SLOTS/2^f, nowhere near Bloom-at-
    equal-bits rates; with f=16 a 100k-probe set sees a handful at most."""
    c = Cuckoo(params_for(40_000), 16, seed=9)
    ins = _keys(40_000, 2)
    c.update_batch(ins)
    fresh = np.setdiff1d(_keys(100_000, 3), ins)
    n_false = int(c.contains(fresh).sum())
    assert n_false <= 40, n_false  # expect ~ load-scaled 8/65535 ~ 7e-5


def test_delete_exact_and_membership_preserved():
    """Deleting inserted keys always succeeds (returns True), frees
    exactly one slot each, and never disturbs other keys' membership."""
    c = Cuckoo(1 << 10, 16, seed=5)
    ks = _keys(3000, 4)
    c.update_batch(ks)
    dead, live = ks[:1000], ks[1000:]
    removed = c.delete_batch(dead)
    assert removed.all()
    assert c.n_items == 2000
    assert int(np.count_nonzero(c.table)) == 2000
    assert c.contains(live).all()


def test_multiset_semantics():
    """Inserting a key twice occupies two slots and takes two deletes."""
    c = Cuckoo(64, 16, seed=1)
    k = np.asarray([42], dtype=np.uint64)
    c.update_batch(k)
    c.update_batch(k)
    assert c.n_items == 2
    assert c.delete_batch(k)[0] and c.contains(k)[0]
    assert c.delete_batch(k)[0] and not c.contains(k)[0]
    assert not c.delete_batch(k)[0]


def test_insert_overflow_raises_loudly():
    c = Cuckoo(4, 16, seed=1)
    with pytest.raises(RuntimeError, match="full"):
        c.update_batch(_keys(100, 5))


def test_serde_roundtrip_and_truncation():
    c = Cuckoo(256, 16, seed=7)
    c.update_batch(_keys(500, 6))
    b = c.to_bytes()
    c2 = Cuckoo.from_bytes(b)
    assert (c2.table == c.table).all() and c2.n_items == c.n_items
    with pytest.raises(ValueError, match="truncated"):
        Cuckoo.from_bytes(b[:-3])
    with pytest.raises(ValueError, match="magic"):
        Cuckoo.from_bytes(b"XXXX" + b[4:])


def test_merge_unions_membership_and_overflows_loudly():
    nb = params_for(30_000)
    a, b = Cuckoo(nb, 16, seed=9), Cuckoo(nb, 16, seed=9)
    ks = _keys(30_000, 7)
    a.update_batch(ks[:15_000])
    b.update_batch(ks[15_000:])
    a.merge(b)
    assert a.contains(ks).all()
    assert a.n_items == 30_000
    with pytest.raises(ValueError, match="identical"):
        a.merge(Cuckoo(nb * 2, 16, seed=9))
    t1, t2 = Cuckoo(8, 16, seed=1), Cuckoo(8, 16, seed=1)
    t1.update_batch(_keys(28, 8))
    t2.update_batch(_keys(28, 9))
    with pytest.raises(RuntimeError, match="capacity"):
        t1.merge(t2)


def test_alt_index_involution():
    """alt(alt(i, fp), fp) == i — the property deletion/eviction rides."""
    c = Cuckoo(1 << 10, 16, seed=11)
    ks = _keys(2000, 10)
    fps = c._fp(ks)
    i1 = c._i1(ks)
    i2 = c._alt(i1, fps)
    assert (c._alt(i2, fps) == i1).all()


def test_distributed_build_and_probe_columns(spark):
    """kind='ckf' through build_sketches: distinct keys in, membership out
    via cuckoo_contains_col; functional delete via cuckoo_delete_col; the
    guarantee holds under whatever partial-merge order Spark produced."""
    from pyspark.sql import functions as F

    from grenier_spark.functions import (cuckoo_contains_col,
                                         cuckoo_delete_col,
                                         cuckoo_stats_col)
    from grenier_spark.operators.sketch_build import (SketchSpec,
                                                      build_sketches)

    ks = _keys(5000, 12).view(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"k": ks})).repartition(4)
    nb = params_for(5000)
    res = build_sketches(df, [SketchSpec.of("c", "ckf", "k",
                                            n_buckets=nb, fp_bits=16,
                                            seed=13)])
    row = res.select("sketch").first()
    blob = bytes(row.sketch)
    f = Cuckoo.from_bytes(blob)
    assert f.n_items == 5000
    assert f.contains(ks.view(np.uint64)).all()

    probes = spark.createDataFrame(
        pd.DataFrame({"k": ks[:200]})).crossJoin(
        res.select("sketch"))
    got = probes.select(cuckoo_contains_col("sketch", "k").alias("m")) \
        .toPandas()
    assert got["m"].all()

    deleted = res.select(cuckoo_delete_col(
        "sketch", F.array(*[F.lit(int(k)) for k in ks[:5]]))
        .alias("sketch2"), "sketch")
    st = deleted.select(cuckoo_stats_col("sketch2").alias("s")) \
        .select("s.n_items", "s.slots_used").first()
    assert st.n_items == 4995 and st.slots_used == 4995
