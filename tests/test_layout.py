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
