"""t-digest quantile sketch (Dunning & Ertl 2019, "Computing Extremely
Accurate Quantiles Using t-Digests").

North-rule extension operator (SURVEY.md §2.3 X4). Mergeable combiner:
state is a list of (mean, weight) centroids ordered by mean; merge
concatenates centroid lists and re-compresses. Merge is associative at the
ESTIMATE level (quantiles within accuracy bound), not bit-level.

Compression uses the k1 scale function ``k(q) = (delta / 2pi) * asin(2q - 1)``
applied via vectorized k-bucket grouping: items whose midpoint quantiles fall
in the same unit k-interval collapse into one centroid (weighted mean). This
keeps centroid count O(delta) and the t-digest size invariant while staying
fully numpy-vectorized (no per-centroid Python loop).

Wire format: header ``<4sIIddq`` = (magic b"TDG1", delta u32,
n_centroids u32, vmin f64, vmax f64, n i64), followed by n_centroids
float64 means then n_centroids float64 weights — see ``to_bytes``.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TDG1"
_HDR = struct.Struct("<4sIIddq")


def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    q = np.clip(q, 0.0, 1.0)
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * q - 1.0)


class TDigest:
    __slots__ = ("delta", "buffer_size", "means", "weights", "_buf_v", "_buf_w",
                 "vmin", "vmax", "n")

    def __init__(self, delta: int = 200, buffer_size: int = 4096):
        self.delta = delta
        self.buffer_size = buffer_size
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self.vmin = np.inf
        self.vmax = -np.inf
        self.n = 0

    def _flush(self) -> None:
        if not self._buf_v and len(self.means) <= 2 * self.delta:
            return
        vs = [self.means] + self._buf_v
        ws = [self.weights] + self._buf_w
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        self._buf_v, self._buf_w = [], []
        if not len(v):
            return
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = w.sum()
        qmid = (np.cumsum(w) - 0.5 * w) / total
        buckets = np.floor(_k_scale(qmid, float(self.delta))).astype(np.int64)
        starts = np.flatnonzero(np.diff(buckets, prepend=np.int64(-(1 << 62))))
        gw = np.add.reduceat(w, starts)
        gm = np.add.reduceat(v * w, starts) / gw
        self.means, self.weights = gm, gw

    def update_batch(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(values)
        if weights is None:
            values = values[keep]
            if not len(values):
                return
            w = np.ones(len(values))
        else:
            w = np.asarray(weights, dtype=np.float64)
            if len(w) != len(values):
                raise ValueError("update_batch: weights length mismatch")
            # drop NaN values together with THEIR weights — filtering only
            # values would misalign every (value, weight) pair after the NaN
            values, w = values[keep], w[keep]
            if not len(values):
                return
        self._buf_v.append(values)
        self._buf_w.append(w)
        self.vmin = min(self.vmin, float(values.min()))
        self.vmax = max(self.vmax, float(values.max()))
        self.n += int(w.sum())
        if sum(len(x) for x in self._buf_v) >= self.buffer_size:
            self._flush()

    def merge(self, other: "TDigest") -> None:
        if self.delta != other.delta:
            raise ValueError("merge: t-digest delta must be identical")
        other._flush()
        self._buf_v.append(other.means)
        self._buf_w.append(other.weights)
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self.n += other.n
        self._flush()

    def quantiles(self, qs: "np.ndarray | list[float]") -> np.ndarray:
        self._flush()
        # atleast_1d: a scalar q must work on every branch (len() of a 0-d
        # array raises only on the single-centroid path otherwise)
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        if not len(self.means):
            return np.full(len(qs), np.nan)
        if len(self.means) == 1:
            return np.full(len(qs), self.means[0])
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        total = self.weights.sum()
        xp = np.concatenate([[0.0], cum, [total]])
        fp = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return np.interp(qs * total, xp, fp)

    def rank(self, values: "np.ndarray | list[float]") -> np.ndarray:
        self._flush()
        if not len(self.means):
            return np.full(len(np.atleast_1d(values)), np.nan)
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        total = self.weights.sum()
        xp = np.concatenate([[self.vmin], self.means, [self.vmax]])
        fp = np.concatenate([[0.0], cum, [total]])
        return np.interp(np.asarray(values, dtype=np.float64), xp, fp) / total

    def to_bytes(self) -> bytes:
        self._flush()
        hdr = _HDR.pack(_MAGIC, self.delta, len(self.means), self.vmin, self.vmax,
                        self.n)
        return hdr + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        magic, delta, n_c, vmin, vmax, n = _HDR.unpack_from(b)
        if magic != _MAGIC:
            raise ValueError("TDigest.from_bytes: bad magic")
        off = _HDR.size
        out = cls(delta)
        out.means = np.frombuffer(b, dtype=np.float64, count=n_c, offset=off).copy()
        out.weights = np.frombuffer(b, dtype=np.float64, count=n_c,
                                    offset=off + 8 * n_c).copy()
        out.vmin, out.vmax, out.n = vmin, vmax, n
        return out
