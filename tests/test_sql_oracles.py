"""Fuzz the DuckDB SQL oracle generators against the numpy kernels directly
(no Spark): any drift here would silently invalidate the correctness gate."""

import duckdb
import numpy as np
import pytest

from grenier_spark.core import hll
from grenier_spark.core.bits import (splitmix64_scalar, wang64,
                                     wang64_scalar)
from grenier_spark.core.countmin import CountMin
from grenier_spark.core.jmphash import jump_bucket_scalar
from grenier_spark.functions import sql_oracles as so


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_wang64_sql_fuzz(con):
    rng = np.random.default_rng(7)
    keys = [int(k) for k in rng.integers(0, 2**64, 200, dtype=np.uint64)]
    vals = ",".join(f"({k}::UHUGEINT)" for k in keys)
    sql = so.chain_selects(f"SELECT k FROM (VALUES {vals}) AS t(k)",
                           so.wang64_stages("k", "w"))
    got = [int(r[0]) for r in con.execute(
        f"SELECT w FROM ({sql})").fetchall()]
    assert got == [wang64_scalar(k) for k in keys]


def test_splitmix_sql_fuzz(con):
    rng = np.random.default_rng(8)
    keys = [int(k) for k in rng.integers(0, 2**64, 100, dtype=np.uint64)]
    vals = ",".join(f"({k}::UHUGEINT)" for k in keys)
    sql = so.chain_selects(f"SELECT k FROM (VALUES {vals}) AS t(k)",
                           so.splitmix64_stages("k", "s"))
    got = [int(r[0]) for r in con.execute(f"SELECT s FROM ({sql})").fetchall()]
    assert got == [splitmix64_scalar(k) for k in keys]


def test_rho_sql_fuzz(con):
    rng = np.random.default_rng(9)
    ws = [0, 1, 2**63] + [int(k) for k in rng.integers(0, 2**64, 100,
                                                       dtype=np.uint64)]
    vals = ",".join(f"({w}::UHUGEINT)" for w in ws)
    got = [int(r[0]) for r in con.execute(
        f"SELECT {so.rho_expr('w')} FROM (VALUES {vals}) AS t(w)").fetchall()]
    expect = [64 if w == 0 else (w & -w).bit_length() for w in ws]
    assert got == expect


def test_hll_registers_sql_equals_kernel(con):
    rng = np.random.default_rng(10)
    keys = rng.integers(0, 2**31, 3000, dtype=np.uint64)
    p = 6
    t = hll.make_p(p)
    hll.add_batch(t, wang64(keys))
    vals = ",".join(f"({int(k)})" for k in keys)
    sql = so.hll_registers_sql(
        f"SELECT k::UHUGEINT AS k FROM (VALUES {vals}) AS t(k)", "k", p)
    got = dict(con.execute(sql).fetchall())
    for j in range(1 << p):
        assert got[j] == int(t[j + 1]), j


def test_jump_sql_equals_kernel(con):
    keys = [wang64_scalar(i) for i in range(150)]
    vals = ",".join(f"({i}, {k}::UHUGEINT)" for i, k in enumerate(keys))
    for n in (1, 7, 32, 1000):
        sql = so.jump_buckets_sql(
            f"SELECT i, k AS h FROM (VALUES {vals}) AS t(i, k)", "h", "i", n)
        got = dict(con.execute(sql).fetchall())
        assert got == {i: jump_bucket_scalar(k, n)
                       for i, k in enumerate(keys)}


def test_cms_point_sql_equals_kernel(con):
    rng = np.random.default_rng(11)
    stream = rng.integers(0, 500, 5000, dtype=np.uint64)
    cm = CountMin(3, 128, seed=5)
    cm.update_batch(stream)
    vals = ",".join(f"({int(k)})" for k in stream)
    sql = so.cms_point_sql(
        f"SELECT k AS key FROM (VALUES {vals}) AS t(k)", "key", 3, 128, 5)
    got = dict(con.execute(sql).fetchall())
    uniq = np.unique(stream)
    expect = dict(zip((int(u) for u in uniq),
                      (int(v) for v in cm.query(uniq))))
    assert got == expect


@pytest.mark.parametrize("p,sizes", [(4, (1, 3, 40, 5000)),
                                     (8, (5, 1000, 120000)),
                                     (12, (50, 20000, 200000)),
                                     (14, (1000, 120000)),
                                     (16, (100, 300000))])
def test_hll_card_sql_bit_exact_vs_kernel(con, p, sizes):
    """The full DuckDB HLL++ estimator (hll_card_sql) must match the numpy
    card_hllpp bit-for-bit across BOTH branches (linear counting at low
    fill, bias-corrected raw estimate at high fill): the scaled-integer
    denominator sum makes the only O(m) float reduction exact on both
    engines."""
    rng = np.random.default_rng(100 + p)
    for n in sizes:
        keys = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
        t = hll.make_p(p)
        hll.add_batch(t, wang64(keys))
        want = hll.card(t)
        con.register("card_keys", __import__("pandas").DataFrame({"k": keys}))
        sql = so.hll_card_sql("SELECT k::UHUGEINT AS k FROM card_keys",
                              "k", p)
        got = con.execute(sql).fetchone()[0]
        assert got == want, (p, n, got, want)


@pytest.mark.parametrize("p,sizes", [(4, (1, 3, 40, 5000)),
                                     (8, (5, 1000, 120000)),
                                     (12, (50, 20000, 200000))])
def test_hll_card_hll_sql_bit_exact_vs_kernel(con, p, sizes):
    """The DuckDB twin of the ORIGINAL-paper estimator (card_hll,
    hll.ml:97-112) must match numpy bit-for-bit across the reachable
    branches (linear counting at low fill, raw estimate above 2.5m); the
    2^32/30 large-range branch needs ~10^8 distincts and is locked by the
    direct formula test below."""
    rng = np.random.default_rng(200 + p)
    for n in sizes:
        keys = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
        t = hll.make_p(p)
        hll.add_batch(t, wang64(keys))
        want = hll.card_hll(t)
        con.register("card_keys", __import__("pandas").DataFrame({"k": keys}))
        sql = so.hll_card_hll_sql("SELECT k::UHUGEINT AS k FROM card_keys",
                                  "k", p)
        got = con.execute(sql).fetchone()[0]
        assert got == want, (p, n, got, want)


def test_hll_card_hll_large_range_formula(con):
    """The large-range correction -2^32 ln(1 - e/2^32) agrees with Python
    libm on representative raw-estimate values (the branch itself is
    unreachable below ~1.4e8 distincts, so the arithmetic is checked
    directly)."""
    import math

    for e in (2.0 ** 32 / 29.0, 1.0e9, 3.0e9):
        want = -(2.0 ** 32.0) * math.log(1.0 - e / (2.0 ** 32.0))
        got = con.execute(
            f"SELECT -4294967296.0 * ln(1.0 - {e!r} / 4294967296.0)"
        ).fetchone()[0]
        assert got == want, (e, got, want)


def test_hll_card_sql_grouped(con):
    """Grouped estimator: per-group results equal per-group kernel runs."""
    rng = np.random.default_rng(77)
    frames = []
    expect = {}
    for g, n in [("a", 30), ("b", 5000), ("c", 60000)]:
        keys = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
        t = hll.make_p(12)
        hll.add_batch(t, wang64(keys))
        expect[g] = hll.card(t)
        frames.append(__import__("pandas").DataFrame({"g": g, "k": keys}))
    con.register("gk", __import__("pandas").concat(frames))
    sql = so.hll_card_sql("SELECT g, k::UHUGEINT AS k FROM gk", "k", 12,
                          group_cols=["g"])
    got = dict(con.execute(sql).fetchall())
    assert got == expect


def test_simhash_pairs_sql_equals_operator_kernel(con):
    """simhash_pairs_sql fingerprints must equal the numpy simhash64 chain
    (md5-low64 word ids -> wang64 -> weighted bit votes) on synthetic
    near-dup text."""
    import hashlib
    import itertools

    from grenier_spark.core.bits import wang64 as w64

    base = " ".join(f"tok{i}" for i in range(60))
    docs = {1: base,
            2: base + " extraword",          # 1/61 weight shift
            3: "completely different words entirely here now",
            4: base}                          # exact copy of 1

    def md5_low64(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:16], 16)

    def py_simhash(t):
        words = [w for w in t.split(" ") if w]
        hs = w64(np.array([md5_low64(w) for w in words], dtype=np.uint64))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(words)
        fp = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(b)
        return int(fp)

    expect = []
    fps = {i: py_simhash(t) for i, t in docs.items()}
    for a, b in itertools.combinations(sorted(docs), 2):
        ham = bin(fps[a] ^ fps[b]).count("1")
        if ham <= 3:
            expect.append((a, b, ham))

    vals = ", ".join(f"({i}, '{t}')" for i, t in docs.items())
    sql = so.simhash_pairs_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(id, text)", "id", "text", 3)
    got = sorted(con.execute(sql).fetchall())
    assert got == sorted(expect)
    assert (1, 4, 0) in got          # exact copy -> Hamming 0


def test_oracle_ascii_precondition():
    """simhash/media oracles hash per-CODEPOINT in SQL vs per-BYTE in the
    numpy kernels — identical only for ASCII text. Pin the precondition so
    a non-ASCII corpus surfaces here, not as an opaque gate mismatch."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        mx = duckdb.sql(
            "SELECT max(unicode(c)) FROM (SELECT unnest(split(text, '')) "
            f"AS c FROM '/root/testdata/{sf}/documents.parquet')"
        ).fetchone()[0]
        assert mx < 128, (sf, mx)


def test_minhash_neardup_sql_fuzz_vs_kernel_replica(con):
    """minhash_neardup_sql vs a pure-numpy replica of the full chain
    (md5-low64 words -> wang64 window folds -> 64-salt signature mins ->
    raw-band candidates -> est filter -> exact distinct-shingle Jaccard)
    on randomized synthetic corpora with planted near-dups — validates the
    generator beyond the single gate dataset."""
    import hashlib
    import itertools

    from grenier_spark.core.bits import splitmix64_scalar, wang64

    W, NH, SEED, BANDS, MINE, TAU = 3, 64, 42, 16, 0.5, 0.7
    salts = np.array([splitmix64_scalar(SEED + i + 1) for i in range(NH)],
                     dtype=np.uint64)

    def md5w(w):
        return int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")

    def shingles(text):
        wh = np.array([md5w(w) for w in text.split(" ")], dtype=np.uint64)
        n = len(wh) - W + 1
        if n <= 0:
            return np.array([], dtype=np.uint64)
        acc = wh[:n].copy()
        for k in range(1, W):
            acc = wang64(acc ^ wh[k:n + k])
        return acc

    def sig(sh):
        return np.array([wang64(sh ^ s).min() for s in salts],
                        dtype=np.uint64)

    rng = np.random.default_rng(21)
    for trial in range(3):
        vocab = [f"w{v}" for v in range(30)]
        docs = {}
        for i in range(12):
            docs[i] = " ".join(rng.choice(vocab, size=rng.integers(10, 40)))
        docs[100] = docs[0]                      # exact dup
        docs[101] = docs[1] + " w0 w1"           # near dup
        expect = []
        shs = {i: shingles(t) for i, t in docs.items()}
        sigs = {i: sig(s) for i, s in shs.items() if len(s)}
        for a, b in itertools.combinations(sorted(sigs), 2):
            bandmatch = any(
                np.array_equal(sigs[a][w * 4:(w + 1) * 4],
                               sigs[b][w * 4:(w + 1) * 4])
                for w in range(BANDS))
            if not bandmatch:
                continue
            if (sigs[a] == sigs[b]).mean() < MINE:
                continue
            sa, sb = set(shs[a].tolist()), set(shs[b].tolist())
            j = len(sa & sb) / len(sa | sb)
            if j >= TAU:
                expect.append((a, b, round(j, 6)))

        vals = ", ".join(f"({i}, '{t}')" for i, t in docs.items())
        sql = so.minhash_neardup_sql(
            f"SELECT * FROM (VALUES {vals}) AS t(id, text)", "id", "text",
            w=W, n_hashes=NH, seed=SEED, bands=BANDS,
            min_est=MINE, tau=TAU)
        got = sorted(con.execute(sql).fetchall())
        assert got == sorted(expect), (trial, got, expect)
        assert any(r[:2] == (0, 100) for r in got), trial  # planted exact


def test_bloom_membership_sql_tolerates_duplicate_candidates(con):
    """A candidate key appearing twice must still read present=true
    (COUNT DISTINCT of matched positions, not raw row count)."""
    from grenier_spark.core.bloom import Bloom

    bf = Bloom(128, 4, seed=3)
    bf.update_batch(np.array([5, 9, 17], dtype=np.uint64))
    got = dict(con.execute(so.bloom_membership_sql(
        "SELECT * FROM (VALUES (5), (9), (17)) t(key)",
        "SELECT * FROM (VALUES (5), (5), (42)) t(key)",
        "key", 128, 4, 3)).fetchall())
    assert got[5] is True and got[42] is False
    assert bool(bf.contains(np.array([5], dtype=np.uint64))[0])
