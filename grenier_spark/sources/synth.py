"""Deterministic synthesis of the `documents` token-sequence table.

Schema per BASELINE.json ``input_hint``:
``documents(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``

Generation is EXACTLY the FIXTURES.md §1 spec — fully determined by row
index, so any partitioning of the row range produces identical rows
(token-array equality invariant):

* ``rng_i = numpy.random.Generator(PCG64(42 + i))`` — one stream per row
* ``source = ["web", "books", "code", "wiki"][i % 4]``
* ``n_tok = 16 + (i * 2654435761 mod 241)`` (deterministic, 16..256)
* ``tokens = floor(V * rng_i.random(n_tok) ** 3).astype(int32)``, V = 50257
  (head-heavy Zipf-like skew)

Two generators share the same per-row kernel: a local pandas one (tests) and
a Spark-parallel one (bench tiers; generation distributes over executors via
``spark.range`` + ``mapInArrow`` precisely because rows are index-determined).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

VOCAB = 50_257
SOURCES = ("web", "books", "code", "wiki")
SEED = 42

TIERS = {"docs_tiny": 1_000, "docs_small": 50_000, "docs_bench": 2_000_000}


def n_tok_for(idx: np.ndarray) -> np.ndarray:
    """Deterministic doc length: 16 + (i * 2654435761 mod 241), range 16..256."""
    return (16 + (idx.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(241)).astype(np.int32)


def tokens_for_row(i: int, n: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(SEED + i))
    return np.floor(VOCAB * rng.random(n) ** 3).astype(np.int32)


def generate_rows(start: int, end: int) -> pd.DataFrame:
    """Rows [start, end) of the canonical table, independent of partitioning."""
    return generate_for_ids(np.arange(start, end, dtype=np.int64))


def generate_for_ids(idx: np.ndarray) -> pd.DataFrame:
    """Rows for explicit indices (any order/subset yields identical rows)."""
    idx = np.asarray(idx, dtype=np.int64)
    n_tok = n_tok_for(idx)
    tokens = [tokens_for_row(int(i), int(n)) for i, n in zip(idx, n_tok)]
    return pd.DataFrame({
        "doc_id": [f"doc-{i:012d}" for i in idx],
        "tokens": tokens,
        "n_tok": n_tok,
        "source": [SOURCES[i % 4] for i in idx],
    })


DOCUMENTS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def write_documents_local(path: str, n_rows: int, chunk: int = 10_000) -> str:
    """Small-tier writer (single parquet file via pyarrow)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "part-00000.parquet")
    writer = None
    for s in range(0, n_rows, chunk):
        df = generate_rows(s, min(s + chunk, n_rows))
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(out, tbl.schema)
        writer.write_table(tbl)
    if writer is not None:
        writer.close()
    return path


def write_documents_spark(spark, path: str, n_rows: int,
                          partitions: int = 64) -> str:
    """Bench-tier writer: generation fans out over executors.

    Row content is index-determined, so executor-parallel generation yields
    the identical table to the local writer (the token-array equality
    invariant, asserted in tests).
    """
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            if not len(ids):
                continue
            df = generate_for_ids(ids)
            yield pa.RecordBatch.from_pandas(df, preserve_index=False)

    (spark.range(0, n_rows, numPartitions=partitions)
        .mapInArrow(gen, DOCUMENTS_SCHEMA)
        .write.mode("overwrite").parquet(path))
    return path


def ensure_documents(spark, tier: str, base_dir: str = "/root/repo/.fixtures") -> str:
    """Idempotent cache: generate the tier once, reuse the parquet after."""
    n = TIERS[tier]
    path = os.path.join(base_dir, f"{tier}_{n}")  # row count in the path:
    # overriding a tier size must never silently reuse a differently-sized table
    marker = os.path.join(path, "_SUCCESS_GS")
    if os.path.exists(marker):
        return path
    if n <= 100_000 or spark is None:
        write_documents_local(path, n)
    else:
        write_documents_spark(spark, path, n)
    open(marker, "w").write(str(n))
    return path
