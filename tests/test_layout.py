"""Z-order layout: interleave parity vs a python reference, SQL-twin
parity via DuckDB, range-layout contiguity, and the actual point of it
all — measurably fewer chunks read under min/max pruning than a
single-column sort layout."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from grenier_spark.operators.layout import (zorder_key, zorder_layout,
                                            zorder_sql)


def _z_ref(vals, bits):
    z = 0
    k = len(vals)
    for j, v in enumerate(vals):
        v = int(v) & ((1 << bits) - 1)
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * k + j)
    return z


def test_zorder_key_matches_python_reference(spark):
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame({
        "a": rng.integers(-5, 1 << 20, 300).astype("int64"),
        "b": rng.integers(0, 1 << 16, 300).astype("int64"),
        "c": rng.integers(0, 1 << 8, 300).astype("int64"),
    })
    got = (spark.createDataFrame(pdf)
           .select("a", "b", "c", zorder_key(["a", "b", "c"], 12)
                   .alias("z")).toPandas())
    exp = [_z_ref((r.a, r.b, r.c), 12) for r in got.itertuples()]
    assert got.z.tolist() == exp


def test_zorder_sql_twin_matches(spark):
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({
        "a": rng.integers(-100, 1 << 18, 200).astype("int64"),
        "b": rng.integers(0, 1 << 18, 200).astype("int64"),
    })
    spark_z = (spark.createDataFrame(pdf)
               .select("a", zorder_key(["a", "b"], 16).alias("z"))
               .toPandas().sort_values("a").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", pdf)
    duck_z = con.execute(
        f"SELECT a, {zorder_sql(['a', 'b'], 16)} AS z FROM t ORDER BY a"
    ).df()
    assert spark_z.z.tolist() == duck_z.z.tolist()


def test_zorder_sql_twin_boundary_values(spark):
    """Adversarial ints: sign bit set, all-ones, mask edges — the two
    engines must agree on the masked interleave for every combination."""
    vals = np.array([-(1 << 63), -1, 0, 1, (1 << 16) - 1, 1 << 16,
                     (1 << 62), (1 << 63) - 1], dtype="int64")
    a, b = np.meshgrid(vals, vals)
    pdf = pd.DataFrame({"a": a.ravel(), "b": b.ravel()})
    spark_z = (spark.createDataFrame(pdf)
               .select(zorder_key(["a", "b"], 16).alias("z"))
               .toPandas().z.tolist())
    con = duckdb.connect()
    con.register("t", pdf)
    duck_z = con.execute(
        f"SELECT {zorder_sql(['a', 'b'], 16)} AS z FROM t").df().z.tolist()
    ref = [_z_ref((r.a, r.b), 16) for r in pdf.itertuples()]
    assert spark_z == duck_z == ref


def test_zorder_validation():
    with pytest.raises(ValueError):
        zorder_key([], 16)
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], 16)  # 64 bits > signed long


def _chunks_read(chunk_stats, lo, hi, col):
    """Files whose [min,max] on ``col`` intersects [lo, hi]."""
    return sum(1 for s in chunk_stats
               if s[f"min_{col}"] <= hi and s[f"max_{col}"] >= lo)


def test_zorder_beats_single_column_sort_for_pruning(spark):
    """The data-skipping claim, measured: uniform 2-d grid, 64 chunks,
    box queries on EACH dimension. A y-sorted layout prunes y-queries
    perfectly but reads every chunk for x-queries; the z-layout reads a
    small fraction for BOTH dimensions."""
    rng = np.random.default_rng(2)
    n = 1 << 14
    pdf = pd.DataFrame({
        "x": rng.integers(0, 1 << 10, n).astype("int64"),
        "y": rng.integers(0, 1 << 10, n).astype("int64"),
    })
    pdf["z"] = [_z_ref((r.x, r.y), 10) for r in pdf.itertuples()]
    n_chunks = 64

    def stats(sorted_pdf):
        out = []
        for ch in np.array_split(sorted_pdf, n_chunks):
            out.append({f"{m}_{c}": getattr(ch[c], m)()
                        for c in ("x", "y") for m in ("min", "max")})
        return out

    by_y = stats(pdf.sort_values(["y", "x"]).reset_index(drop=True))
    by_z = stats(pdf.sort_values("z").reset_index(drop=True))
    # 1/16-wide band queries on each dimension
    w = 1 << 6
    reads = {"y_sort": [], "z": []}
    for _ in range(20):
        lo = int(rng.integers(0, (1 << 10) - w))
        for col in ("x", "y"):
            reads["y_sort"].append(_chunks_read(by_y, lo, lo + w, col))
            reads["z"].append(_chunks_read(by_z, lo, lo + w, col))
    avg_y = np.mean(reads["y_sort"])
    avg_z = np.mean(reads["z"])
    # y-sort averages ~half of (64 + ~4) ≈ 34 chunks; z-order stays
    # tight on both dims (~2*sqrt(n_chunks) per query)
    assert avg_z < avg_y / 1.8, (avg_y, avg_z)
    assert avg_z <= 20, avg_z


def test_zorder_layout_partitions_are_z_contiguous(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "x": rng.integers(0, 1 << 10, 4000).astype("int64"),
        "y": rng.integers(0, 1 << 10, 4000).astype("int64"),
    })
    out = zorder_layout(spark.createDataFrame(pdf), ["x", "y"],
                        n_files=8, bits=10)
    part = (out.withColumn("z", zorder_key(["x", "y"], 10))
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid").agg(F.min("z").alias("zmin"),
                                F.max("z").alias("zmax"),
                                F.count(F.lit(1)).alias("n"))
            .orderBy("pid").toPandas())
    assert part.n.sum() == 4000
    assert len(part) >= 4  # range sampler may merge tiny slices
    # partitions cover disjoint, ordered z ranges
    for i in range(1, len(part)):
        assert part.zmin[i] > part.zmax[i - 1], part


# ---------------- KLL-driven balanced range layout ----------------

def test_kll_range_buckets_balance_and_bounds(spark):
    """On a heavy-tailed distribution the sketch boundaries cut near the
    true quantiles: every bucket holds n/B +- 2*eps*n rows (eps=0.04 at
    k=200), and boundaries are sorted."""
    import numpy as np
    import pandas as pd
    from grenier_spark.operators.layout import kll_range_buckets

    rng = np.random.default_rng(7)
    n, B = 20_000, 8
    df = spark.createDataFrame(
        pd.DataFrame({"v": rng.lognormal(0, 2, n)})).repartition(4)
    out, bounds = kll_range_buckets(df, "v", B)
    assert len(bounds) == B - 1 and (np.diff(bounds) >= 0).all()
    counts = (out.groupBy("_range_bucket").count()
              .toPandas().set_index("_range_bucket")["count"])
    assert len(counts) == B
    assert (abs(counts - n / B) <= 2 * 0.04 * n + 1).all(), counts


def test_kll_range_buckets_null_nan_last_heavy_atom_single(spark):
    """NULL/NaN land in the LAST bucket; a constant column (one heavy
    atom no range layout can split) maps every row to one bucket without
    crashing; n_buckets=1 and empty inputs degrade to bucket 0 / empty."""
    import pandas as pd
    from grenier_spark.operators.layout import kll_range_buckets

    df = spark.createDataFrame(pd.DataFrame({"v": [1.0, None, 5.0]}))
    got = kll_range_buckets(df, "v", 4)[0].toPandas()
    assert int(got.loc[got.v.isna(), "_range_bucket"].iloc[0]) == 3

    const = spark.createDataFrame(pd.DataFrame({"v": [3.0] * 500}))
    buckets = (kll_range_buckets(const, "v", 8)[0]
               .select("_range_bucket").distinct().toPandas())
    assert len(buckets) == 1

    one, b = kll_range_buckets(df, "v", 1)
    assert len(b) == 0 and one.select("_range_bucket").distinct().count() == 1
    empty = df.where("v < -1e18")
    eout, eb = kll_range_buckets(empty, "v", 4)
    assert len(eb) == 0 and eout.count() == 0


def test_kll_range_repartition_single_range_exchange(spark):
    """The physical move is ONE range exchange on the bucket id — no extra
    shuffle, no Spark sampling job baked into THIS plan's exchanges — and
    partitions are near-balanced (buckets map ~1:1 onto partitions)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from grenier_spark.operators.layout import kll_range_repartition

    rng = np.random.default_rng(11)
    n = 20_000
    df = spark.createDataFrame(
        pd.DataFrame({"v": rng.normal(0, 3, n)})).repartition(4)
    rp = kll_range_repartition(df, "v", 8)
    plan = rp._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1, plan
    assert "Exchange hashpartitioning" not in plan, plan
    pc = rp.groupBy(F.spark_partition_id().alias("p")).count().toPandas()
    # range-sampling the 8 uniform bucket ids occasionally merges two
    # adjacent buckets into one partition — never worse
    assert pc["count"].max() <= 2 * (n / 8) + 2 * 0.04 * n + 1, pc


def test_kll_range_buckets_deterministic_same_partitioning(spark):
    """Boundaries are deterministic per input partitioning (seeded
    compaction coin) — two builds over the identical layout agree."""
    import numpy as np
    import pandas as pd
    from grenier_spark.operators.layout import kll_range_buckets

    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        pd.DataFrame({"v": rng.normal(0, 1, 5_000)})).repartition(4)
    _, b1 = kll_range_buckets(df, "v", 6)
    _, b2 = kll_range_buckets(df, "v", 6)
    assert np.array_equal(b1, b2)
