"""Double-double (~106-bit) compensated arithmetic, vectorized over numpy.

Re-creates the reference's doubledouble module (D1 in SURVEY.md §2.3;
/root/reference/doubledouble/doubledouble.ml) from the published algorithms
it itself implements — Dekker 1971 / Knuth TAOCP two-sum and split,
Bailey/Hida QD-style add/mul/div/sqrt:

* value = unevaluated pair ``(hi, lo)`` with ``|lo| <= ulp(hi)/2``
  (reference ``{hi; lo}`` record, doubledouble.ml:31).
* ``K_SPLIT = 2^27 + 1`` — Dekker's splitter constant
  (doubledouble.ml:48).
* error-free transforms instead of FMA: the reference explicitly DISABLES
  FMA contraction via ``Sys.opaque_identity`` (doubledouble.ml:114-116)
  for bit-reproducibility; numpy ufuncs never fuse, so plain elementwise
  ops here have the same property.

Everything operates on (and broadcasts over) float64 ndarrays, so the same
kernels serve scalar use, tests, and Arrow-batched UDF internals. The
library's estimator sums use ``math.fsum`` (exact) — ``dd_sum`` here is
the streaming/mergeable counterpart: an associative-enough compensated
accumulator whose (hi, lo) state can ride in a DataFrame column.
"""

from __future__ import annotations

import struct

import numpy as np

K_SPLIT = np.float64((1 << 27) + 1)  # Dekker splitter (doubledouble.ml:48)


def two_sum(a, b):
    """Error-free sum: s + e == a + b exactly (Knuth), any magnitudes."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free sum requiring |a| >= |b| (Dekker)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a == hi + lo with 26/27-bit halves."""
    a = np.asarray(a, dtype=np.float64)
    c = K_SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: p + e == a * b exactly (Dekker, FMA-free)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd(hi, lo=0.0):
    """Normalize a (hi, lo) pair."""
    return quick_two_sum(np.asarray(hi, dtype=np.float64),
                         np.asarray(lo, dtype=np.float64))


def dd_add(xh, xl, yh, yl):
    """(x + y) in double-double (Bailey's accurate variant)."""
    sh, se = two_sum(xh, yh)
    te, tf = two_sum(xl, yl)
    se = se + te
    sh, se = quick_two_sum(sh, se)
    se = se + tf
    return quick_two_sum(sh, se)


def dd_neg(xh, xl):
    return -np.asarray(xh, dtype=np.float64), -np.asarray(xl, dtype=np.float64)


def dd_sub(xh, xl, yh, yl):
    nh, nl = dd_neg(yh, yl)
    return dd_add(xh, xl, nh, nl)


def dd_mul(xh, xl, yh, yl):
    """(x * y) in double-double."""
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return quick_two_sum(p, e)


def dd_sqr(xh, xl):
    p, e = two_prod(xh, xh)
    e = e + 2.0 * (xh * xl)
    return quick_two_sum(p, e)


def dd_div(xh, xl, yh, yl):
    """(x / y) via one Newton correction of the float64 quotient."""
    q1 = np.asarray(xh, dtype=np.float64) / np.asarray(yh, dtype=np.float64)
    rh, rl = dd_mul(yh, yl, q1, np.zeros_like(q1))
    dh, dl = dd_sub(xh, xl, rh, rl)
    q2 = (dh + dl) / np.asarray(yh, dtype=np.float64)
    return quick_two_sum(q1, q2)


def dd_sqrt(xh, xl):
    """sqrt via one Newton step: s + (x - s^2) / (2 s)."""
    s = np.sqrt(np.asarray(xh, dtype=np.float64))
    rh, rl = dd_sqr(s, np.zeros_like(s))
    dh, dl = dd_sub(xh, xl, rh, rl)
    e = (dh + dl) / (2.0 * s)
    out_h, out_l = quick_two_sum(s, e)
    zero = np.asarray(xh, dtype=np.float64) == 0.0
    if np.ndim(out_h):
        out_h = np.where(zero, 0.0, out_h)
        out_l = np.where(zero, 0.0, out_l)
    elif zero:
        out_h, out_l = np.float64(0.0), np.float64(0.0)
    return out_h, out_l


def dd_pow_int(xh, xl, n: int):
    """Integer power by binary exponentiation (reference ``pow`` surface)."""
    if n < 0:
        rh, rl = dd_pow_int(xh, xl, -n)
        one = np.ones_like(np.asarray(xh, dtype=np.float64))
        return dd_div(one, np.zeros_like(one), rh, rl)
    rh = np.ones_like(np.asarray(xh, dtype=np.float64))
    rl = np.zeros_like(rh)
    bh, bl = dd(xh, xl)
    while n:
        if n & 1:
            rh, rl = dd_mul(rh, rl, bh, bl)
        n >>= 1
        if n:
            bh, bl = dd_sqr(bh, bl)
    return rh, rl


def dd_sum(values) -> "tuple[float, float]":
    """Compensated reduction of a float64 vector to one double-double:
    the mergeable analogue of the reference's accumulation use-case. The
    result's ``hi + lo`` equals the exact sum to ~106 bits; merging two
    partial (hi, lo) states with :func:`dd_add` is how a distributed
    error-free sum rides through the two-level sketch merge."""
    sh, sl = np.float64(0.0), np.float64(0.0)
    for v in np.asarray(values, dtype=np.float64):
        sh, sl = dd_add(sh, sl, v, 0.0)
    return float(sh), float(sl)


def dd_sum_vec(values) -> "tuple[float, float]":
    """Vectorized pairwise double-double reduction of a float64 vector:
    log2(n) elementwise :func:`dd_add` passes (numpy-wide), accuracy
    ~2^-104 relative per level. Deterministic for a fixed input order."""
    hi = np.asarray(values, dtype=np.float64).ravel().copy()
    if not len(hi):
        return 0.0, 0.0
    lo = np.zeros_like(hi)
    while len(hi) > 1:
        if len(hi) & 1:
            hi = np.append(hi, 0.0)
            lo = np.append(lo, 0.0)
        hi, lo = dd_add(hi[0::2], lo[0::2], hi[1::2], lo[1::2])
    return float(hi[0]), float(lo[0])


class DDSum:
    """Mergeable error-free SUM aggregator — the distributed form of the
    reference's double-double accumulation use-case (doubledouble.ml
    add/two-sum, D1). State = one (hi, lo) pair; wire format 16 bytes
    little-endian. Like KLL/t-digest (and unlike HLL/CMS/Bloom), the merge
    is order-sensitive only at the ~2^-104 level: results are deterministic
    for a fixed partitioning and equal to ``math.fsum`` within 1 ulp.
    """

    __slots__ = ("hi", "lo")

    def __init__(self, hi: float = 0.0, lo: float = 0.0):
        self.hi, self.lo = float(hi), float(lo)

    def update_batch(self, values) -> None:
        h, l = dd_sum_vec(values)
        self.hi, self.lo = (float(x) for x in dd_add(self.hi, self.lo, h, l))

    def merge(self, other: "DDSum") -> None:
        self.hi, self.lo = (float(x) for x in
                            dd_add(self.hi, self.lo, other.hi, other.lo))

    def value(self) -> float:
        return self.hi + self.lo

    def to_bytes(self) -> bytes:
        return np.array([self.hi, self.lo], dtype="<f8").tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "DDSum":
        if len(b) != 16:
            raise ValueError("DDSum.from_bytes: expected 16 bytes")
        hi, lo = np.frombuffer(b, dtype="<f8")
        return cls(float(hi), float(lo))


class Moments:
    """Mergeable exact-moments summary: count plus error-free (hi, lo)
    double-double sums of x, x^2, x^3 and x^4 — mean / variance / skewness
    / kurtosis for any merge tree from one 76-byte state (the DDSum idea,
    D1, lifted to the first four power sums).

    Per-element powers are the ROUNDED float64 chain ``x2 = x*x;
    x3 = x2*x; x4 = x3*x`` — exactly the left-associated chain DuckDB's
    ``x*x*x*x`` parses to, so an oracle's ``fsum`` over the identical
    per-element power values reproduces each sum to the ulp. Like DDSum,
    merges are order-sensitive only at the ~2^-104 level.

    Wire format: ``MOM1`` + ``<q`` count + 8 little-endian float64
    (hi, lo per power), 76 bytes.
    """

    __slots__ = ("n", "s")
    _MAGIC = b"MOM1"

    def __init__(self, n: int = 0, s: "np.ndarray | None" = None):
        self.n = int(n)
        self.s = np.zeros((4, 2)) if s is None else np.asarray(
            s, dtype=np.float64).reshape(4, 2)

    def update_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        if not len(v):
            return
        self.n += len(v)
        p = v
        for i in range(4):
            if i:
                p = p * v
            h, l = dd_sum_vec(p)
            self.s[i] = dd_add(self.s[i, 0], self.s[i, 1], h, l)

    def merge(self, other: "Moments") -> "Moments":
        self.n += other.n
        for i in range(4):
            self.s[i] = dd_add(self.s[i, 0], self.s[i, 1],
                               other.s[i, 0], other.s[i, 1])
        return self

    def sums(self) -> "tuple[float, float, float, float]":
        """(sum_x, sum_x2, sum_x3, sum_x4), each collapsed to one double."""
        return tuple(float(h + l) for h, l in self.s)

    def stats(self) -> "tuple[int, float, float, float, float]":
        """(n, mean, population variance, skewness, excess kurtosis) by the
        fixed moment chain ``m_k = s_k/n - ...`` (left-associated, so an
        oracle can replay it bit for bit). Variance is clamped at 0 against
        cancellation; skew/kurt are NaN for var == 0 or n == 0."""
        if self.n == 0:
            return 0, float("nan"), float("nan"), float("nan"), float("nan")
        n = float(self.n)
        s1, s2, s3, s4 = self.sums()
        mean = s1 / n
        var = s2 / n - mean * mean
        var = max(var, 0.0)
        if var == 0.0:
            return self.n, mean, 0.0, float("nan"), float("nan")
        m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * (mean * mean) * mean
        m4 = (s4 / n - 4.0 * mean * (s3 / n)
              + 6.0 * (mean * mean) * (s2 / n)
              - 3.0 * ((mean * mean) * (mean * mean)))
        skew = m3 / (var ** 1.5)
        kurt = m4 / (var * var) - 3.0
        return self.n, mean, var, skew, kurt

    def to_bytes(self) -> bytes:
        return (self._MAGIC + struct.pack("<q", self.n)
                + self.s.astype("<f8").tobytes())

    @classmethod
    def from_bytes(cls, b: bytes) -> "Moments":
        if len(b) != 76 or b[:4] != cls._MAGIC:
            raise ValueError("corrupt Moments blob")
        n = struct.unpack_from("<q", b, 4)[0]
        if n < 0:
            raise ValueError("corrupt Moments blob: negative count")
        return cls(n, np.frombuffer(b, dtype="<f8", offset=12).copy())
