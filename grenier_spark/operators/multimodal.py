"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages. Decode is REAL for the dependency-free container
formats — ``image/bmp`` and ``audio/wav`` parse in pure numpy
(:mod:`.media_codecs`, oracle-gated end-to-end) — and STUBBED for formats
that need external libraries (none available in this container —
SURVEY.md environment facts): ``decoder=None`` (or an undecodable
media_type under :func:`default_decoder`) raises ``NotImplementedError``
at the decode callsite, while ``fake_decoder`` provides a deterministic
stand-in so the Spark-side plumbing — schema, batch shape, partition
independence, UDF signature — stays testable for any format
(tests/test_multimodal.py, tests/test_media_codecs.py).

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


def default_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """The default ``extract_features`` decoder: REAL container decode for
    the dependency-free formats (``image/bmp``, ``audio/wav`` — pure-numpy
    parsers in :mod:`.media_codecs`, oracle-gated end-to-end), the
    deterministic :func:`fake_decoder` stand-in for the generic plumbing
    types (``image``/``audio``/``video``), and the honest loud
    ``NotImplementedError`` for any other container (no media libraries in
    this environment — pass ``decoder=`` to supply one)."""
    from .media_codecs import DECODABLE_TYPES, format_decoder

    if media_type in DECODABLE_TYPES:
        return format_decoder(payload, media_type)
    if media_type in ("image", "audio", "video"):
        return fake_decoder(payload, media_type)
    return format_decoder(payload, media_type)  # loud NotImplementedError


def extract_features(df: DataFrame,
                     decoder: "Callable | None" = default_decoder,
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


FRAME_SCHEMA = ("media_id long, media_type string, frame_idx int, "
                "frame_offset long, frame_n_bytes long, "
                "feature array<float>")


def sample_frames(df: DataFrame, n_frames: int = 4, frame_len: int = 256,
                  frame_featurizer: "Callable | None" = byte_histogram_decoder,
                  payload_col: str = "payload",
                  type_col: str = "media_type") -> DataFrame:
    """Frame-sampling plumbing for video/audio payloads: emit ``n_frames``
    rows per media row, each featurizing one deterministic byte window of
    the payload.

    Offsets are uniform over the payload in EXACT integer arithmetic —
    ``offset_i = i * max(0, L - frame_len) // (n_frames - 1)`` — so a SQL
    engine reproduces them bit-for-bit (the gate oracle does). A real
    container-aware frame decoder (keyframe extraction via PyAV etc.) is
    STUBBED in this environment: pass ``frame_featurizer=None`` to get the
    loud ``NotImplementedError`` at the decode callsite; the default is
    the exact 16-bin byte histogram of each window, so the plumbing —
    1->n_frames row explosion in the SCAN stage (the payload itself never
    shuffles; only feature-sized frame rows leave the stage), Arrow batch
    shape, NULL-payload tolerance — is fully real and oracle-tested.

    A payload shorter than ``frame_len`` yields ``n_frames`` identical
    offset-0 windows (deterministic, SQL-reproducible) rather than a
    data-dependent row count."""
    if n_frames < 1:
        raise ValueError("sample_frames needs n_frames >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if frame_featurizer is None:
                raise NotImplementedError(
                    "no media frame decoder available in this environment; "
                    "pass frame_featurizer= (e.g. a PyAV keyframe-histogram "
                    "callable) or keep the default byte-window featurizer "
                    "for plumbing tests")
            out = {"media_id": [], "media_type": [], "frame_idx": [],
                   "frame_offset": [], "frame_n_bytes": [], "feature": []}
            for mid, p, t in zip(pdf["media_id"], pdf[payload_col],
                                 pdf[type_col]):
                pb = None if p is None else bytes(p)
                L = 0 if pb is None else len(pb)
                span = max(0, L - frame_len)
                for i in range(n_frames):
                    off = (i * span // (n_frames - 1)) if n_frames > 1 else 0
                    window = b"" if pb is None else pb[off:off + frame_len]
                    out["media_id"].append(mid)
                    out["media_type"].append(t)
                    out["frame_idx"].append(np.int32(i))
                    out["frame_offset"].append(np.int64(off))
                    out["frame_n_bytes"].append(np.int64(len(window)))
                    out["feature"].append(
                        None if pb is None else
                        frame_featurizer(window, t)
                        .astype(np.float32).tolist())
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


def resize_histogram_col(feature: "str", out_bins: int):
    """JVM-side histogram RESIZE: pairwise-sum a ``k``-bin feature array
    down to ``out_bins`` (k must be a multiple of out_bins — bins are
    grouped contiguously; a non-multiple length raises at runtime rather
    than silently dropping trailing bins). A NULL feature (e.g. the row
    :func:`sample_frames` emits for a NULL payload) propagates as NULL
    instead of tripping the length check (size(NULL) = -1). Pure built-in
    expressions (transform + aggregate over slices): no Python in the
    plan, exact float addition of exact small integers, so the resized
    bins stay SQL-recomputable."""
    from pyspark.sql import functions as F

    f = F.col(feature) if isinstance(feature, str) else feature
    n = F.size(f)
    factor = F.when(
        n % out_bins == 0, (n / out_bins).cast("int")
    ).otherwise(F.raise_error(F.concat(
        F.lit("resize_histogram_col: feature length "),
        n.cast("string"),
        F.lit(f" is not a multiple of out_bins={out_bins}"))).cast("int"))
    return F.when(f.isNull(), F.lit(None).cast("array<float>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.lit(out_bins - 1)),
            lambda i: F.aggregate(
                F.slice(f, i * factor + 1, factor),
                F.lit(0.0).cast("float"), lambda acc, x: acc + x)))


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
