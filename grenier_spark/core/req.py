"""REQ — relative-error streaming quantiles (Cormode, Karnin, Liberty,
Thaler & Vesely, "Relative Error Streaming Quantiles", PODS 2021 — the
paper SURVEY.md §2.3 cites next to KLL and PAPERS.md lists first).

North-rule extension operator: the FOURTH quantile kind, completing the
accuracy design space. KLL gives UNIFORM rank error (eps*n everywhere),
t-digest biases error toward both tails heuristically, DDSketch bounds
relative VALUE error; REQ bounds relative RANK error — for the
high-ranks-accurate (HRA) orientation built here,
``|rank_est(x) - rank(x)| <= eps * (n - rank(x))`` — so tail statistics
(p99/p999 sequence lengths, latency ceilings — the quantiles a training
pipeline actually alarms on) get multiplicatively tighter as q -> 1,
and the top-most items are held EXACTLY.

Mechanism (paper §3, mirrored by Apache DataSketches' ReqSketch): a
KLL-style level hierarchy (level h items weigh 2**h) whose compactors
are RELATIVE: each keeps its top half protected and only ever halves a
section-aligned prefix of its LOWEST items, with the number of sections
compacted following the trailing-ones schedule of the compaction
counter — so items near the top of a level survive exponentially many
more compactions than items at the bottom. Every compaction halves an
even-sized range (m items of weight w -> m/2 items of weight 2w), so
TOTAL WEIGHT IS CONSERVED EXACTLY (``n == sum(len(level_h) * 2**h)`` is
asserted after every operation in tests).

Like KLL/t-digest, compaction schedules depend on arrival order: merge
is associative at the ESTIMATE level (the rank guarantee holds for any
merge tree), not at the byte level — the distributed build is
deterministic per partitioning and the gate asserts the multiplicative
rank band, the same discipline as the KLL/t-digest gates. The coin is a
seeded LCG, so single-stream builds are exactly reproducible.

Wire format: header ``<4sIQQI`` (magic b"REQ1", k, n, lcg state,
n_levels) + per-level ``<IIII`` (length, section_size, n_sections,
n_compactions) + concatenated float64 items.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"REQ1"
_HDR = struct.Struct("<4sIQQI")
_LVL = struct.Struct("<IIII")


class _Compactor:
    __slots__ = ("buf", "section_size", "n_sections", "n_compactions")

    def __init__(self, section_size: int, n_sections: int = 3,
                 n_compactions: int = 0,
                 buf: "np.ndarray | None" = None):
        self.buf = np.empty(0, dtype=np.float64) if buf is None else buf
        self.section_size = section_size
        self.n_sections = n_sections
        self.n_compactions = n_compactions

    def capacity(self) -> int:
        return 2 * self.section_size * self.n_sections


class REQ:
    """High-ranks-accurate relative-error quantile sketch.

    ``k`` is the section size (even, >= 4): larger k => smaller eps
    (paper Thm 1: eps = O(sqrt(log(eps*n)) / k) for the tail fraction).
    """

    __slots__ = ("k", "levels", "n", "_lcg")

    def __init__(self, k: int = 32, seed: int = 42):
        if k < 4 or k % 2:
            raise ValueError("k must be an even integer >= 4")
        self.k = k
        self.levels: "list[_Compactor]" = [_Compactor(k)]
        self.n = 0
        self._lcg = (seed * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)

    # -- internals ---------------------------------------------------------

    def _coin(self) -> int:
        self._lcg = (self._lcg * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)
        return (self._lcg >> 63) & 1

    @staticmethod
    def _trailing_ones(x: int) -> int:
        t = 0
        while x & 1:
            t += 1
            x >>= 1
        return t

    def _compact_level(self, h: int) -> None:
        """One relative compaction at level h: halve a section-aligned
        PREFIX (the lowest items — HRA protects the top), promote the
        survivors with doubled weight."""
        c = self.levels[h]
        lv = np.sort(c.buf, kind="stable")
        # trailing-ones schedule: the i-th compaction compacts
        # (trailing_ones(i) + 1) sections from the low end, so the j-th
        # section from the bottom is touched every 2**j compactions
        s = min(self._trailing_ones(c.n_compactions) + 1, c.n_sections)
        rng_len = min(s * c.section_size, len(lv))
        # never compact into the protected top half, and keep it even
        rng_len = min(rng_len, len(lv) // 2)
        rng_len -= rng_len % 2
        if rng_len < 2:
            rng_len = 2  # degenerate floor: always make progress
        low, rest = lv[:rng_len], lv[rng_len:]
        promoted = low[self._coin()::2]
        c.buf = rest
        c.n_compactions += 1
        # lazy growth: after 2**(n_sections - 1) compactions the level
        # doubles its section count (deeper protection ladder) — the
        # paper's schedule with section size kept >= 4 for the halving
        if c.n_compactions >= 1 << (c.n_sections - 1):
            c.n_sections *= 2
            c.section_size = max(4, c.section_size // 2)
        if h + 1 == len(self.levels):
            self.levels.append(_Compactor(self.k))
        up = self.levels[h + 1]
        up.buf = np.concatenate([up.buf, promoted])

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h].buf) >= self.levels[h].capacity():
                self._compact_level(h)
            else:
                h += 1

    # -- public ------------------------------------------------------------

    def update_batch(self, values: np.ndarray) -> None:
        # drop ALL non-finite input (NaN and +/-inf): an inf would poison
        # exactly the tail quantiles REQ exists to answer (q near 1 returns
        # inf) — same finite-only contract as DDSketch, enforced by drop
        # rather than raise so one bad record can't wedge a stream
        values = np.asarray(values, dtype=np.float64)
        values = values[np.isfinite(values)]
        if not len(values):
            return
        base = self.levels[0]
        base.buf = np.concatenate([base.buf, values])
        self.n += len(values)
        self._compress()

    def merge(self, other: "REQ") -> "REQ":
        if self.k != other.k:
            raise ValueError("merge: REQ k must be identical")
        while len(self.levels) < len(other.levels):
            self.levels.append(_Compactor(self.k))
        for h, oc in enumerate(other.levels):
            c = self.levels[h]
            if len(oc.buf):
                c.buf = np.concatenate([c.buf, oc.buf])
            # carry the more-advanced schedule so protection depth never
            # regresses under a merge tree
            c.n_sections = max(c.n_sections, oc.n_sections)
            c.section_size = min(c.section_size, oc.section_size)
            c.n_compactions = max(c.n_compactions, oc.n_compactions)
        self.n += other.n
        self._lcg ^= other._lcg
        self._compress()
        return self

    def _weighted_items(self) -> "tuple[np.ndarray, np.ndarray]":
        vals, wts = [], []
        for h, c in enumerate(self.levels):
            if len(c.buf):
                vals.append(c.buf)
                wts.append(np.full(len(c.buf), 1 << h, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, values: "np.ndarray | list[float]") -> np.ndarray:
        """Estimated number of items <= value (absolute, not fraction).
        Always returns a 1-d array, scalar input included."""
        vv = np.atleast_1d(np.asarray(values, dtype=np.float64))
        v, w = self._weighted_items()
        if not len(v):
            return np.full(len(vv), np.nan)
        cum = np.cumsum(w)
        idx = np.searchsorted(v, vv, side="right")
        return np.where(idx > 0, cum[np.maximum(idx - 1, 0)], 0.0)

    def quantiles(self, qs: "np.ndarray | list[float]") -> np.ndarray:
        """Smallest stored value whose estimated rank reaches q*n."""
        v, w = self._weighted_items()
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        if not len(v):
            return np.full(len(qs), np.nan)
        cum = np.cumsum(w)
        targets = np.clip(qs * self.n, 1.0, float(self.n))
        idx = np.searchsorted(cum, targets, side="left")
        return v[np.minimum(idx, len(v) - 1)]

    # -- serde -------------------------------------------------------------

    def to_bytes(self) -> bytes:
        head = _HDR.pack(_MAGIC, self.k, self.n, self._lcg,
                         len(self.levels))
        metas = b"".join(
            _LVL.pack(len(c.buf), c.section_size, c.n_sections,
                      c.n_compactions) for c in self.levels)
        payload = b"".join(c.buf.astype("<f8").tobytes()
                           for c in self.levels)
        return head + metas + payload

    @classmethod
    def from_bytes(cls, b: bytes) -> "REQ":
        magic, k, n, lcg, n_levels = _HDR.unpack_from(b)
        if magic != _MAGIC:
            raise ValueError("REQ.from_bytes: bad magic")
        off = _HDR.size
        out = cls(k)
        out.n = n
        out._lcg = lcg
        out.levels = []
        metas = []
        for _ in range(n_levels):
            metas.append(_LVL.unpack_from(b, off))
            off += _LVL.size
        total_w = 0
        for h, (ln, ss, ns, nc) in enumerate(metas):
            buf = np.frombuffer(b, dtype="<f8", count=ln,
                                offset=off).astype(np.float64)
            off += 8 * ln
            if ss < 4 or ns < 1:
                raise ValueError("REQ.from_bytes: corrupt level meta")
            out.levels.append(_Compactor(ss, ns, nc, buf))
            total_w += ln << h
        if not out.levels:
            out.levels = [_Compactor(k)]
        if total_w != n:
            raise ValueError(
                f"REQ.from_bytes: weight {total_w} != n {n} (corrupt)")
        return out
