"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages. The media decode itself is STUBBED in this
container (no image/audio libraries available — SURVEY.md environment
facts): ``decoder=None`` raises ``NotImplementedError`` at the decode
callsite, while ``fake_decoder`` provides a deterministic stand-in so the
Spark-side plumbing — schema, batch shape, partition independence, UDF
signature — is fully real and tested (tests/test_multimodal.py).

Scale notes: media bytes never shuffle (feature extraction happens in the
scan stage); per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` which callers should lower
for large blobs (10k rows x 1MB media = 10GB — set it to ~64-256 for real
media tables).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("media_id long, payload binary, media_type string, "
                "width int, height int, sample_rate int")

FEATURE_SCHEMA = ("media_id long, media_type string, n_bytes long, "
                  "feature array<float>")


def fake_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real decode+featurize: a 16-bin byte
    histogram, L1-normalized. Replace with a real decoder (PIL/torchaudio)
    by passing ``decoder=`` to :func:`extract_features`."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if not len(arr):
        return np.zeros(16, dtype=np.float32)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return hist / hist.sum()


def byte_histogram_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """UN-normalized 16-bin high-nibble byte histogram: every feature value
    is an exact small integer (float32-exact below 2^24), so downstream
    comparisons — including the DuckDB gate oracle, which recomputes the
    bins with ``unicode(char) // 16`` over text-derived payloads — are
    bit-exact with no float-rounding risk."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(arr >> 4, minlength=16).astype(np.float32)


def extract_features(df: DataFrame, decoder: "Callable | None" = fake_decoder,
                     payload_col: str = "payload",
                     type_col: str = "media_type") -> DataFrame:
    """binary payload -> fixed-width feature vector, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "no media decoder available in this environment; pass "
                    "decoder= (e.g. a PIL/torchaudio-backed callable) or use "
                    "multimodal.fake_decoder for plumbing tests")
            # convert once (payloads are MB-scale — a second bytes() pass
            # just for len() doubles the copy traffic); NULL payloads
            # (failed downloads) yield a null feature row instead of
            # crashing the task on bytes(None)
            ps = [None if p is None else bytes(p)
                  for p in pdf[payload_col]]
            feats = [None if p is None
                     else decoder(p, t).astype(np.float32).tolist()
                     for p, t in zip(ps, pdf[type_col])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf[type_col],
                "n_bytes": [0 if p is None else len(p) for p in ps],
                "feature": feats,
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def synthesize_media_table(spark, n_rows: int = 200, seed: int = 42):
    """Deterministic fake media table for plumbing tests: payload bytes are
    a seeded function of media_id, so any partitioning yields equal rows."""
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            payloads, types, ws, hs, srs = [], [], [], [], []
            for i in ids:
                rng = np.random.Generator(np.random.PCG64(seed + int(i)))
                kind = ["image", "audio", "video"][int(i) % 3]
                size = int(rng.integers(64, 2048))
                payloads.append(rng.integers(0, 256, size,
                                             dtype=np.uint8).tobytes())
                types.append(kind)
                ws.append(int(rng.integers(16, 512)) if kind != "audio" else 0)
                hs.append(int(rng.integers(16, 512)) if kind != "audio" else 0)
                srs.append(16000 if kind == "audio" else 0)
            yield pa.RecordBatch.from_pydict({
                "media_id": ids, "payload": payloads, "media_type": types,
                "width": np.array(ws, dtype=np.int32),
                "height": np.array(hs, dtype=np.int32),
                "sample_rate": np.array(srs, dtype=np.int32)})

    return spark.range(n_rows).mapInArrow(gen, MEDIA_SCHEMA)
