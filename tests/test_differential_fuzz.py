"""Differential fuzz: Spark vs DuckDB on ADVERSARIAL texts.

The oracle gate (test_entry_oracles.py) proves cross-engine parity on the
fixture corpus; these tests lock the same contracts on the text shapes web
corpora actually contain — empty strings, repeated separators, leading/
trailing spaces, unicode (combining marks, CJK, emoji), quotes/backslashes,
very long repetition — where split/md5/fold semantics could silently
diverge between engines. One Spark job + one DuckDB query per contract,
whole-frame compare (no per-case jobs).
"""

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

ADVERSARIAL = [
    "",                                   # empty text -> [''] word list
    "one",                                # below shingle width
    "one two",                            # still below w=3
    "one two three",                      # exactly one shingle
    "a  b c d",                           # double space -> empty token
    " leading space start of doc here",   # leading separator
    "trailing space at end of doc ",      # trailing separator
    "tab\tinside token stays one word x", # non-space whitespace NOT split
    "café naïve résumé words here",   # accents
    "café combining mark form here now",            # NFD form
    "日本語 中文 한국어 words mix here",
    "emoji \U0001f600 \U0001f680 tokens in text here",
    "quote ' and \" and \\ backslash words",
    "semi; colon, comma. dot words here",
    ("repeat " * 50).strip(),             # long repetition, 50 words
    "UPPER lower MiXeD case WORDS here",
    "0 1 2 3 4 5 6 7 8 9 ten",
    "    ",                               # only separators -> ['','','','','']
]


@pytest.fixture(scope="module")
def corpus():
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)]
    rows.append((len(rows), None))  # NULL text
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def duck(corpus):
    con = duckdb.connect()
    con.register("docs", corpus)
    return con


def test_minhash_signature_rows_match_duckdb(spark, corpus, duck):
    """The FULL md5-low64 -> wang64 window fold -> salted-min chain agrees
    row for row on adversarial texts (word-split semantics included:
    repeated separators yield empty tokens on BOTH engines; docs with < w
    words and NULL text yield no rows on both)."""
    from grenier_spark.functions.sql_oracles import _minhash_chain_sql
    from grenier_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    sigs = (minhash_signatures(df, w=3, n_hashes=8, seed=7, word_hash="md5")
            .select("doc_id", F.posexplode("sig").alias("perm", "sigv"))
            .toPandas().sort_values(["doc_id", "perm"])
            .reset_index(drop=True))
    _, sigrows = _minhash_chain_sql("SELECT doc_id, text FROM docs",
                                    "doc_id", "text", w=3, n_hashes=8,
                                    seed=7)
    to_signed = ("(CASE WHEN u >= 9223372036854775808::UHUGEINT "
                 "THEN u::HUGEINT - 18446744073709551616::HUGEINT "
                 "ELSE u::HUGEINT END)::BIGINT")
    exp = duck.execute(
        f"SELECT id AS doc_id, perm::BIGINT AS perm, {to_signed} AS sigv "
        f"FROM (SELECT id, perm, MIN(h) AS u FROM ({sigrows}) "
        f"GROUP BY 1, 2) ORDER BY 1, 2").df()
    pd.testing.assert_frame_equal(sigs, exp, check_dtype=False)
    # sanity on the fuzz itself: the corpus must exercise real signatures
    assert sigs.doc_id.nunique() >= 12


def test_segment_rows_match_duckdb(spark, corpus, duck):
    """Boilerplate segmentation (8-word windows, ragged tail) agrees on
    adversarial texts; NULL text yields no rows on both engines."""
    from grenier_spark.operators import boilerplate as B

    df = (spark.createDataFrame(corpus, "doc_id long, text string")
          .withColumn("source", F.lit("g")))
    got = (B.segment_rows(df, width=8)
           .select("id", "seg_idx", "seg").toPandas()
           .sort_values(["id", "seg_idx"]).reset_index(drop=True))
    sql = ("WITH " + B.segment_rows_sql(
        "SELECT doc_id, 'g' AS source, text FROM docs", "text", "doc_id",
        "source", 8)
        + " SELECT id, seg_idx::BIGINT AS seg_idx, seg FROM segs "
          "ORDER BY 1, 2")
    exp = duck.execute(sql).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.id.nunique() == len(ADVERSARIAL)  # every non-NULL doc segments
