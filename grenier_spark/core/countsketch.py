"""Count sketch / AMS (Charikar-Chen-Farach-Colton 2002; Alon-Matias-
Szegedy 1996): signed frequency counters supporting what count-min
cannot — UNBIASED point estimates, second-moment (F2) estimation, and
inner products between two sketches (the classic join-size estimator:
E[<A, B>_row] = sum_k f_A(k) * f_B(k)).

North-rule extension operator (SURVEY.md §2.3 family, alongside X1
count-min) — not in the reference library; semantics from the published
papers. Mergeable combiner: update and merge are element-wise ``+``
(exact, associative, commutative -> the distributed build is
byte-identical for any partitioning); every estimator is a MEDIAN over
``depth`` independent rows of exact int64 row statistics, so with odd
depth the whole estimator chain is integer-exact cross-engine (the
DuckDB oracles emit identical BIGINTs — no floats anywhere).

Hash family (one wang64 per row, SQL-expressible): with
``h = wang64(key XOR splitmix64(seed + i + 1))`` (the count-min salt
stream), row i uses column ``h mod width`` and sign
``+1 if (h // width) mod 2 == 0 else -1`` — for power-of-two widths the
column is the low bits and the sign the next bit of a well-mixed hash.

State: ``int64[depth, width]`` + (depth, width, seed, total); wire
format ``<4sIIIq`` (magic b"CSK1") + raw counter bytes. Row statistics
(squares, inner products) are accumulated in PYTHON ints (object
arrays) — no silent int64 overflow at any counter magnitude.
"""

from __future__ import annotations

import struct

import numpy as np

from .bits import U64, splitmix64_scalar, wang64

_MAGIC = b"CSK1"
_HDR = struct.Struct("<4sIIIq")


class CountSketch:
    __slots__ = ("depth", "width", "seed", "counts", "total")

    def __init__(self, depth: int, width: int, seed: int = 0,
                 counts: "np.ndarray | None" = None, total: int = 0):
        if depth <= 0 or width <= 0:
            raise ValueError("depth and width must be positive")
        if not 0 <= seed < (1 << 32):
            raise ValueError("seed must fit an unsigned 32-bit int")
        self.depth = depth
        self.width = width
        self.seed = seed
        self.counts = (np.zeros((depth, width), dtype=np.int64)
                       if counts is None else counts)
        self.total = total

    def row_salts(self) -> np.ndarray:
        return np.array([splitmix64_scalar(self.seed + i + 1)
                         for i in range(self.depth)], dtype=U64)

    def _hash_row(self, keys: np.ndarray, salt: np.uint64):
        h = wang64(keys ^ salt)
        pos = (h % U64(self.width)).astype(np.int64)
        sign = 1 - 2 * ((h // U64(self.width)) & U64(1)).astype(np.int64)
        return pos, sign

    def update_batch(self, keys: np.ndarray,
                     weights: "np.ndarray | None" = None) -> None:
        """Add keys (uint64) with optional integer multiplicities —
        identical state to feeding each occurrence once (``+ w * sign``)."""
        keys = np.asarray(keys).astype(U64, copy=False)
        if not len(keys):
            return
        w = (np.ones(len(keys), dtype=np.int64) if weights is None
             else np.asarray(weights, dtype=np.int64))
        salts = self.row_salts()
        for i in range(self.depth):
            pos, sign = self._hash_row(keys, salts[i])
            # bincount sums in float64: exact while per-call |sums| < 2^53
            # (multiplicity weights from Arrow batches always are); huge
            # explicit weights take the exact scatter-add
            sw = sign * w
            if int(np.abs(sw).max()) >= (1 << 53) // max(len(sw), 1):
                np.add.at(self.counts[i], pos, sw)
            else:
                self.counts[i] += np.bincount(
                    pos, weights=sw, minlength=self.width).astype(np.int64)
        self.total += int(w.sum())

    def merge(self, other: "CountSketch") -> "CountSketch":
        if (self.depth, self.width, self.seed) != \
                (other.depth, other.width, other.seed):
            raise ValueError("cannot merge count sketches with different "
                             "(depth, width, seed)")
        self.counts += other.counts
        self.total += other.total
        return self

    def fold(self, depth_new: int) -> "CountSketch":
        """EXACT depth shrink: row i's (position, sign) hash is salted by
        ``seed + i + 1`` independent of depth, so keeping the FIRST
        depth_new rows is bit-identical to a direct depth_new build.
        WIDTH cannot fold (unlike CountMin): the sign bit is
        ``(h // width) & 1``, so a different width re-signs every update
        — a congruent-column sum would mix sign conventions."""
        d2 = int(depth_new)
        if not (1 <= d2 <= self.depth):
            raise ValueError(f"fold: need 1 <= depth_new <= {self.depth}")
        return CountSketch(d2, self.width, self.seed,
                           counts=self.counts[:d2].copy(), total=self.total)

    @staticmethod
    def _median_rows(vals: "list[int]") -> int:
        """Median of the per-row statistics: for odd depth the exact
        middle order statistic (an int — cross-engine reproducible); for
        even depth the lower-middle element (NOT the average: stays an
        exact integer; gates use odd depth anyway)."""
        s = sorted(vals)
        return int(s[(len(s) - 1) // 2])

    def point(self, keys: np.ndarray) -> np.ndarray:
        """Unbiased signed frequency estimates: per key, the median over
        rows of ``sign * cell``."""
        keys = np.asarray(keys).astype(U64, copy=False)
        salts = self.row_salts()
        est = np.empty((self.depth, len(keys)), dtype=np.int64)
        for i in range(self.depth):
            pos, sign = self._hash_row(keys, salts[i])
            est[i] = sign * self.counts[i, pos]
        return np.asarray([self._median_rows(list(est[:, j]))
                           for j in range(len(keys))], dtype=np.int64)

    def f2(self) -> int:
        """Second-moment estimate: median over rows of sum_j cell^2
        (AMS). Exact Python-int arithmetic — no overflow."""
        rows = [int(sum(int(c) * int(c) for c in self.counts[i]))
                for i in range(self.depth)]
        return self._median_rows(rows)

    def inner(self, other: "CountSketch") -> int:
        """Join-size / inner-product estimate between two streams
        sketched with IDENTICAL (depth, width, seed): median over rows
        of the row dot product, estimating sum_k f_A(k) * f_B(k)."""
        if (self.depth, self.width, self.seed) != \
                (other.depth, other.width, other.seed):
            raise ValueError("inner product needs identical "
                             "(depth, width, seed)")
        rows = [int(sum(int(a) * int(b)
                        for a, b in zip(self.counts[i], other.counts[i])))
                for i in range(self.depth)]
        return self._median_rows(rows)

    def to_bytes(self) -> bytes:
        return (_HDR.pack(_MAGIC, self.depth, self.width, self.seed,
                          self.total)
                + self.counts.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountSketch":
        magic, d, w, seed, total = _HDR.unpack_from(blob)
        if magic != _MAGIC:
            raise ValueError("not a CountSketch blob")
        body = np.frombuffer(blob, dtype="<i8", offset=_HDR.size)
        if len(body) != d * w:
            raise ValueError(f"corrupt CountSketch blob: {len(body)} "
                             f"cells, header says {d}x{w}")
        return cls(d, w, seed, body.reshape(d, w).copy(), total)
