"""Frequent Directions matrix sketch (Liberty, KDD 2013; mergeable form
of Ghashami, Liberty, Phillips & Woodruff, SICOMP 2016): maintain at most
``2*ell`` rows ``B`` such that ``B.T @ B`` approximates ``A.T @ A`` of the
full row stream — the deterministic streaming-PCA / covariance sketch.
When the buffer fills, one SVD shrinks the squared singular values by
``delta_step = sigma_{ell+1}^2`` and keeps the top ``ell`` directions.

North-rule extension operator: the "HLL of second moments" — the same
mergeable-summary discipline as the counting sketches (KB-sized state,
associative-enough merge, token/embedding-scale data never shuffles),
covering the embeddings payload the way MG/CMS cover token counts.

Deterministic guarantees under ANY merge tree (merging feeds the other
sketch's rows through the same shrink loop — GLPW16 §3), with ``delta``
the accumulated shrinkage and ``fnorm2`` the exact input Frobenius mass:

* PSD order:    B.T@B  <=  A.T@A            (never overestimates energy)
* spectral:     ||A.T@A - B.T@B||_2 <= delta
* mass:         ell * delta <= fnorm2 - ||B||_F^2
  (each shrink-by-delta_step removes >= (ell+1)*delta_step of stored
  Frobenius mass: the ell+1 largest singular values each lose exactly
  delta_step), hence delta <= fnorm2 / ell.

Counter VALUES depend on batch/merge boundaries (like KLL/t-digest):
deterministic per partitioning, guarantee-gated, not byte-canonical.

Wire format: ``<4sIIIqdd`` (magic b"FDS1", ell, dim, rows, n, delta,
fnorm2) + B rows (float64 LE, row-major).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"FDS1"
_HDR = struct.Struct("<4sIIIqdd")


class FrequentDirections:
    __slots__ = ("ell", "dim", "B", "n", "delta", "fnorm2")

    def __init__(self, ell: int, dim: int,
                 B: "np.ndarray | None" = None, n: int = 0,
                 delta: float = 0.0, fnorm2: float = 0.0):
        if ell < 1 or dim < 1:
            raise ValueError("ell and dim must be >= 1")
        self.ell = ell
        self.dim = dim
        self.B = (np.empty((0, dim), dtype=np.float64) if B is None else B)
        self.n = n
        self.delta = delta
        self.fnorm2 = fnorm2

    def _shrink(self, M: np.ndarray) -> np.ndarray:
        """One FD compaction: SVD, subtract sigma_{ell+1}^2 from every
        squared singular value, keep the top ``ell`` directions."""
        _U, s, Vt = np.linalg.svd(M, full_matrices=False)
        if len(s) <= self.ell:
            # dim <= ell: no direction to evict — re-express losslessly
            # (B'ized rows, B'.T@B' == M.T@M) so the buffer stays bounded
            # by dim rows instead of growing one row per input row
            return s[:, None] * Vt
        d = float(s[self.ell]) ** 2
        if d > 0.0:
            self.delta += d
        s2 = np.maximum(s[:self.ell] ** 2 - d, 0.0)
        return np.sqrt(s2)[:, None] * Vt[:self.ell]

    def _absorb_rows(self, X: np.ndarray) -> None:
        cap = 2 * self.ell
        B = self.B
        i = 0
        while i < len(X):
            take = min(len(X) - i, max(cap - len(B), 1))
            B = np.vstack([B, X[i:i + take]]) if len(B) else X[i:i + take]
            i += take
            if len(B) > cap or (len(B) == cap and i < len(X)):
                B = self._shrink(B)
        self.B = np.ascontiguousarray(B, dtype=np.float64)

    def update_batch(self, X: np.ndarray) -> None:
        """Fold a (rows, dim) float matrix of input vectors."""
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
        if X.size == 0:
            return
        if X.shape[1] != self.dim:
            raise ValueError(f"expected dim={self.dim} rows, "
                             f"got {X.shape[1]}")
        self.n += len(X)
        self.fnorm2 += float((X * X).sum())
        self._absorb_rows(X)

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        """GLPW16 merge: the other sketch's rows are valid input rows for
        the shrink loop; accumulated shrinkage and input mass add."""
        if (self.ell, self.dim) != (other.ell, other.dim):
            raise ValueError(
                f"cannot merge FD(ell={self.ell}, dim={self.dim}) with "
                f"FD(ell={other.ell}, dim={other.dim})")
        self.n += other.n
        self.delta += other.delta
        self.fnorm2 += other.fnorm2
        if len(other.B):
            self._absorb_rows(other.B)
        return self

    def gram(self) -> np.ndarray:
        """B.T @ B — the sketched second-moment (scatter) matrix."""
        return self.B.T @ self.B

    def stored_fnorm2(self) -> float:
        return float((self.B * self.B).sum())

    def to_bytes(self) -> bytes:
        body = np.ascontiguousarray(self.B, dtype="<f8").tobytes()
        return _HDR.pack(_MAGIC, self.ell, self.dim, len(self.B),
                         self.n, self.delta, self.fnorm2) + body

    @classmethod
    def from_bytes(cls, blob: bytes) -> "FrequentDirections":
        if len(blob) < _HDR.size:
            raise ValueError(f"FD blob truncated: {len(blob)} bytes")
        magic, ell, dim, rows, n, delta, fnorm2 = _HDR.unpack_from(blob)
        if magic != _MAGIC:
            raise ValueError("not a FrequentDirections blob")
        body = np.frombuffer(blob, dtype="<f8", offset=_HDR.size)
        if len(body) != rows * dim or rows > 2 * ell:
            raise ValueError(f"corrupt FD blob: {len(body)} doubles, "
                             f"header says {rows}x{dim} (ell={ell})")
        B = body.reshape(rows, dim).astype(np.float64)
        return cls(ell, dim, B, n, delta, fnorm2)
