"""Rendezvous (HRW) hashing: scalar/vectorized parity, the
arbitrary-node removal and addition properties, occupancy uniformity,
and DuckDB SQL-oracle parity (no Spark needed)."""

import duckdb
import numpy as np
import pytest

from grenier_spark.core.rendezvous import (hrw_bucket, hrw_bucket_among,
                                           hrw_bucket_scalar)
from grenier_spark.functions import sql_oracles as so


def _keys(seed, n=4000):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, n, dtype=np.uint64)


@pytest.mark.parametrize("n", [1, 2, 7, 16, 100])
def test_vectorized_matches_scalar(n):
    keys = _keys(0, 300)
    got = hrw_bucket(keys, n)
    assert [int(b) for b in got] == [hrw_bucket_scalar(int(k), n)
                                     for k in keys]


def test_removal_moves_only_dead_nodes_keys():
    keys = _keys(1)
    before = hrw_bucket(keys, 16)
    for dead in (0, 5, 15):
        after = hrw_bucket_among(keys, [i for i in range(16) if i != dead])
        moved = before != after
        # every key on a survivor stays put; every key of the dead node moves
        assert (moved == (before == dead)).all()
        assert dead not in set(np.unique(after).tolist())


def test_addition_moves_keys_only_to_new_node():
    keys = _keys(2)
    for n in (4, 16, 63):
        b0 = hrw_bucket(keys, n)
        b1 = hrw_bucket(keys, n + 1)
        moved = b0 != b1
        assert (b1[moved] == n).all()
        # expected relocation share 1/(n+1), binomial tolerance
        frac = moved.mean()
        exp = 1.0 / (n + 1)
        assert abs(frac - exp) < 4 * np.sqrt(exp * (1 - exp) / len(keys))


def test_occupancy_roughly_uniform():
    keys = _keys(3, 20000)
    n = 10
    counts = np.bincount(hrw_bucket(keys, n), minlength=n)
    exp = len(keys) / n
    assert (np.abs(counts - exp) < 5 * np.sqrt(exp)).all(), counts


def test_non_contiguous_node_ids_and_errors():
    keys = _keys(4, 100)
    ids = [3, 11, 42]
    got = hrw_bucket_among(keys, ids)
    assert set(np.unique(got).tolist()) <= set(ids)
    # order of the id list must not matter
    assert (hrw_bucket_among(keys, ids[::-1]) == got).all()
    with pytest.raises(ValueError):
        hrw_bucket(keys, 0)
    with pytest.raises(ValueError):
        hrw_bucket_among(keys, [])
    with pytest.raises(ValueError):
        hrw_bucket_among(keys, [-1, 2])


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_hrw_sql_equals_kernel(con):
    keys = _keys(5, 150)
    vals = ",".join(f"({i}, {int(k)}::UHUGEINT)"
                    for i, k in enumerate(keys))
    base = f"SELECT i, k AS h FROM (VALUES {vals}) AS t(i, k)"
    for n in (1, 7, 16):
        got = dict(con.execute(
            so.hrw_buckets_sql(base, "h", "i", n)).fetchall())
        exp = hrw_bucket(keys, n)
        assert got == {i: int(b) for i, b in enumerate(exp)}
    # arbitrary live set (node 5 removed)
    live = [i for i in range(16) if i != 5]
    got = dict(con.execute(
        so.hrw_buckets_sql(base, "h", "i", nodes=live)).fetchall())
    exp = hrw_bucket_among(keys, live)
    assert got == {i: int(b) for i, b in enumerate(exp)}
