"""HyperLogLog / HLL++ with the reference's exact register semantics.

State layout is byte-compatible with the reference wire format
(/root/reference/hll/hll.ml:16,26-32,174-185): a flat byte array
``[p, reg_1 .. reg_m]`` with ``m = 2**p`` one-byte registers. Serialized
sketches are interchangeable with the reference's ``to_string`` output.

Replicated behavioral quirks (SURVEY.md §2.5):

* Q1 — ``make(error)`` selects ``p = ceil(ln((1.04/error)**2))`` with the
  NATURAL log (hll.ml:28), so error=0.05 -> p=7, error=0.001 -> p=14.
* Q2 — rho counts TRAILING zeros: ``rho(w) = 1 + ctz(w)``, ``rho(0) = 64``
  (hll.ml:40-43); bucket index is the LOW p bits (hll.ml:48).
* Q3 — estimator clamps register values at ``precision - p`` (hll.ml:89):
  precision=32 for card_hll, 64 for the HLL++ raw estimate.
* Q4 — bias correction averages the 6 nearest neighbors by squared distance
  (hll.ml:118-131), Heule et al. constant tables (hll_consts.ml).
* Q6 — merging different precisions raises (hll.ml:58-61).
* Q7 — usable precision range asserted to 4..16 (hll.ml:78); we validate at
  construction instead of crashing at estimate time.

Deviation (documented): estimator sums use ``math.fsum`` (error-free) rather
than sequential float64 adds; estimates are not bit-compared to OCaml output,
only register arrays and serialized bytes are bit-exact.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from .bits import U64, ctz64

def _load_data() -> dict:
    """Load the HLL++ constant tables; zip-safe for spark-submit --py-files
    (inside a .zip, __file__-relative open() fails; importlib.resources
    reads from the archive)."""
    try:
        from importlib import resources

        return json.loads(resources.files(__package__)
                          .joinpath("_hll_data.json").read_text())
    except Exception:
        return json.load(open(os.path.join(os.path.dirname(__file__),
                                           "_hll_data.json")))


_DATA = _load_data()
# Index 0 corresponds to p=4 in all three tables (hll_consts.ml:1).
THRESHOLD = np.asarray(_DATA["threshold"], dtype=np.float64)
RAW_ESTIMATE = [np.asarray(v, dtype=np.float64) for v in _DATA["raw_estimate"]]
BIAS = [np.asarray(v, dtype=np.float64) for v in _DATA["bias"]]

P_MIN, P_MAX = 4, 16  # Q7: get_alpha's usable range (hll.ml:78)


def precision_for_error(error: float) -> int:
    """Q1: natural-log precision rule of hll.ml:28 (``make``)."""
    if not (0.0 < error < 1.0):
        raise ValueError("error must be in (0, 1)")
    return int(math.ceil(math.log((1.04 / error) ** 2)))


def estimate_memory(error: float) -> int:
    """Register bytes for an error rate (hll.ml:22-24; header excluded)."""
    return 1 << precision_for_error(error)


def make(error: float = 0.05) -> np.ndarray:
    """Allocate a sketch for an error rate (hll.ml:26-32)."""
    return make_p(precision_for_error(error))


def make_p(p: int) -> np.ndarray:
    """Allocate a sketch at explicit precision p (extension beyond reference)."""
    if not (P_MIN <= p <= P_MAX):
        raise ValueError(f"precision must be in [{P_MIN}, {P_MAX}], got {p}")
    t = np.zeros((1 << p) + 1, dtype=np.uint8)
    t[0] = p
    return t


def validate(t: np.ndarray) -> bool:
    """Structural invariant ``2**t[0] + 1 == len(t)`` (hll.ml:20)."""
    return (t.dtype == np.uint8 and t.ndim == 1 and len(t) > 0
            and len(t) == (1 << int(t[0])) + 1)


def clear(t: np.ndarray) -> None:
    """Zero registers, keep header (hll.ml:34-36)."""
    t[1:] = 0


def copy(t: np.ndarray) -> np.ndarray:
    """Independent copy (hll.ml:56)."""
    return t.copy()


def get_rho(w: np.ndarray) -> np.ndarray:
    """Q2: ``rho = 1 + index_of_lsb(w)``, 64 for w == 0 (hll.ml:40-43).

    ctz via the float64-exponent trick: the isolated LSB is a power of two,
    whose uint64->float64 conversion is exact, so the biased exponent field
    IS the bit index. Fewer passes than the De Bruijn gather (which remains
    in bits.ctz64 as the independently-tested spec kernel).
    """
    w = w.astype(np.uint64, copy=False)
    lsb = ~w
    np.add(lsb, np.uint64(1), out=lsb)
    np.bitwise_and(lsb, w, out=lsb)          # lsb = w & (-w)
    f = lsb.astype(np.float64)
    e = f.view(np.int64)
    np.right_shift(e, 52, out=e)
    np.subtract(e, 1022, out=e)              # rho = ctz + 1
    e[lsb == 0] = 64                         # w == 0 -> rho = 64
    return e.astype(np.uint8)


def add_batch(t: np.ndarray, hashes: np.ndarray) -> None:
    """Vectorized equivalent of looping ``add`` (hll.ml:45-50).

    ``hashes`` must already be uniform 64-bit values (e.g. ``bits.wang64``
    output) — same contract as hll.mli:15-23.
    """
    p = int(t[0])
    x = hashes.astype(U64, copy=False)
    j = (x & U64((1 << p) - 1)).astype(np.intp)
    rho = get_rho(x >> U64(p))
    update_registers(t[1:], j, rho)


def update_registers(reg: np.ndarray, j: np.ndarray, rho: np.ndarray) -> None:
    """``reg[j] = max(reg[j], rho)`` grouped-max scatter.

    ``np.maximum.at`` runs ~700 M ops/s on numpy >= 1.24 (vectorized indexed
    loop) — measured 100x faster than argsort+reduceat alternatives here.
    """
    np.maximum.at(reg, j, rho)


def merge(into: np.ndarray, other: np.ndarray) -> None:
    """Element-wise byte max; Q6 raises on length mismatch (hll.ml:58-65)."""
    if len(into) != len(other):
        raise ValueError("merge: counters precision should be equal")
    np.maximum(into[1:], other[1:], out=into[1:])


def fold_precision(t: np.ndarray, p_new: int) -> np.ndarray:
    """EXACT precision downgrade p -> p_new (p_new <= p): the returned
    sketch is bit-identical to one built directly at ``p_new`` from the
    same hash stream.

    The reference refuses to merge mixed precisions (Q6, hll.ml:58-61);
    this extension makes a p=14 fleet sketch mergeable with a p=10
    archive without rescanning. Exactness: with low-p-bit bucketing
    (hll.ml:48) and trailing-zero rho (hll.ml:40-43), a hash x in
    high-p bucket ``j`` lands in low-p bucket ``j' = j mod 2**p_new``
    with the split bits ``u = j >> p_new`` PREPENDED to the rho word
    ``w' = u | (w << d)``, ``d = p - p_new``. So per source register r:

    * u != 0: ctz(w') = ctz(u) regardless of w — every hash that ever
      hit bucket j contributes the constant ``ctz(u) + 1``;
    * u == 0: ctz(w') = ctz(w) + d, i.e. ``r + d`` (the ``rho(0) = 64``
      sentinel maps to itself: w == 0 -> w' == 0).

    Both transforms are monotone in r per bucket, so they commute with
    the register max — folding the maxima equals the max of folds.
    """
    p = int(t[0])
    if not (P_MIN <= p_new <= p):
        raise ValueError(
            f"fold_precision: need {P_MIN} <= p_new <= p={p}, got {p_new}")
    if p_new == p:
        return t.copy()
    d = p - p_new
    m_new = 1 << p_new
    # rows: u = j >> p_new (C-order reshape: reg[u, j'] == reg[u*m_new + j'])
    reg = t[1:].reshape(1 << d, m_new)
    hit = reg > 0
    # u == 0 row: r + d, sentinel 64 fixed (r <= 64-p+1 < 64 for real w)
    r0 = reg[0].astype(np.int64)
    row0 = np.where(r0 == 64, 64, r0 + d)
    row0[~hit[0]] = 0
    # u != 0 rows: constant ctz(u)+1 wherever the bucket was ever hit
    u = np.arange(1, 1 << d, dtype=np.uint64)
    const = get_rho(u).astype(np.int64)  # 1 + ctz(u) for u != 0
    folded = np.where(hit[1:], const[:, None], 0)
    out = make_p(p_new)
    out[1:] = np.maximum(row0, folded.max(axis=0)).astype(np.uint8)
    return out


def merge_fold(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cross-precision merge: fold the finer sketch down to the coarser
    precision (exact, :func:`fold_precision`), then byte-max merge.
    Returns a NEW sketch at ``min(p_a, p_b)``; inputs are untouched."""
    pa, pb = int(a[0]), int(b[0])
    lo = min(pa, pb)
    out = fold_precision(a, lo) if pa > lo else a.copy()
    other = fold_precision(b, lo) if pb > lo else b
    merge(out, other)
    return out


def merge_many(sketches: "list[np.ndarray] | np.ndarray") -> np.ndarray:
    """Associative fold of :func:`merge` over a batch (columnar fast path)."""
    arr = np.asarray(sketches, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("merge_many expects a stack of equal-length sketches")
    out = arr.max(axis=0)
    out[0] = arr[0, 0]
    return out


def to_bytes(t: np.ndarray) -> bytes:
    """Wire format identical to the reference ``to_string`` (hll.ml:174-176)."""
    assert validate(t)
    return t.tobytes()


def from_bytes(s: bytes) -> np.ndarray:
    """Deserialize + re-validate (hll.ml:178-185)."""
    t = np.frombuffer(s, dtype=np.uint8).copy()
    if not validate(t):
        raise ValueError("Hll.from_bytes: invalid serialized sketch")
    return t


SPARSE_FLAG = 0x80  # header-byte marker for the INTERNAL sparse encoding


def to_bytes_auto(t: np.ndarray) -> bytes:
    """Partial-state serialization: dense grenier format, or an internal
    sparse `(j, rho)` encoding when it is smaller.

    Motivation (100 TB posture): level-1 partial sketches are emitted once
    per (input partition x group x spec). A p=14 dense state is 16 KB even
    when only a handful of registers are set; at 100k partitions x 1000
    groups that is TB-scale shuffle volume for near-empty sketches. Sparse
    partials shrink that to ~3 bytes per set register. The PUBLIC wire
    format (to_bytes/from_bytes) is untouched — sparse bytes only travel
    between the build stages and every final merge re-emits dense
    grenier-compatible bytes.

    Layout: ``[0x80 | p][u16 nnz][u16 j]*nnz [u8 rho]*nnz`` little-endian.
    """
    assert validate(t)
    p = int(t[0])
    j = np.flatnonzero(t[1:])
    sparse_size = 3 + 3 * len(j)
    if sparse_size >= (1 << p) + 1:
        return t.tobytes()
    out = bytearray([SPARSE_FLAG | p])
    out += np.uint16(len(j)).astype("<u2").tobytes()
    out += j.astype("<u2").tobytes()
    out += t[1:][j].tobytes()
    return bytes(out)


def from_bytes_any(s: bytes) -> np.ndarray:
    """Decode either the public dense format or the internal sparse one."""
    if not len(s):
        raise ValueError("Hll.from_bytes_any: empty buffer")
    if not (s[0] & SPARSE_FLAG):
        return from_bytes(s)
    p = s[0] & 0x7F
    t = make_p(p)
    nnz = int(np.frombuffer(s, dtype="<u2", count=1, offset=1)[0])
    if len(s) != 3 + 3 * nnz:
        raise ValueError("Hll.from_bytes_any: truncated sparse sketch")
    j = np.frombuffer(s, dtype="<u2", count=nnz, offset=3).astype(np.intp)
    # canonical encoding (to_bytes_auto) emits strictly increasing register
    # indices < 2^p: reject anything else LOUDLY — an out-of-range index
    # would escape as a bare IndexError and a duplicate would decode
    # last-wins into a plausible-but-wrong register array
    if len(j) and (j[-1] >= (1 << p) or (np.diff(j) <= 0).any()):
        raise ValueError("Hll.from_bytes_any: invalid sparse indices")
    rho = np.frombuffer(s, dtype=np.uint8, count=nnz, offset=3 + 2 * nnz)
    t[1:][j] = rho
    return t


def count_nulls(t: np.ndarray) -> int:
    """Zero registers (hll.ml:69-75)."""
    return int(np.count_nonzero(t[1:] == 0))


def get_alpha(p: int) -> float:
    """Standard alpha constants (hll.ml:77-82); asserts 4 <= p <= 16 (Q7)."""
    if not (P_MIN <= p <= P_MAX):
        raise ValueError(f"alpha undefined for p={p}")
    if p == 4:
        return 0.673
    if p == 5:
        return 0.697
    if p == 6:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / float(1 << p))


def hll_estimation(precision: int, t: np.ndarray) -> float:
    """Raw estimate ``alpha * m^2 / sum 2^-min(precision-p, reg)`` (hll.ml:84-91, Q3)."""
    p = int(t[0])
    m = 1 << p
    clamped = np.minimum(precision - p, t[1:].astype(np.int64))
    terms = np.ldexp(1.0, -clamped)
    s = math.fsum(terms.tolist())
    return get_alpha(p) * float(m) * float(m) / s


def linear_counting(m: int, nulls: int) -> float:
    """``m * ln(m / V)`` (hll.ml:93-95)."""
    return float(m) * math.log(float(m) / float(nulls))


def card_hll(t: np.ndarray) -> float:
    """Original-paper estimator with 32-bit range corrections (hll.ml:97-112)."""
    e = hll_estimation(32, t)
    p = int(t[0])
    m = 1 << p
    if e <= 2.5 * m:
        nulls = count_nulls(t)
        return e if nulls == 0 else linear_counting(m, nulls)
    if e <= (2.0**32.0) / 30.0:
        return e
    return -(2.0**32.0) * math.log(1.0 - e / (2.0**32.0))


def get_threshold(p: int) -> float:
    """HLL++ linear-counting/bias switch thresholds (hll.ml:116, consts:2-3)."""
    return float(THRESHOLD[p - 4])


def get_nearest_neighbors(e: float, vec: np.ndarray) -> np.ndarray:
    """6-NN by squared distance, stable on ties (hll.ml:118-121, Q4)."""
    d2 = (e - vec) ** 2
    order = np.argsort(d2, kind="stable")
    return order[:6]


def estimate_bias(e: float, p: int) -> float:
    """Mean bias over the 6 nearest rawEstimate neighbors (hll.ml:123-131)."""
    nn = get_nearest_neighbors(e, RAW_ESTIMATE[p - 4])
    return float(np.mean(BIAS[p - 4][nn]))


def ep(t: np.ndarray) -> float:
    """Bias-corrected 64-bit raw estimate (hll.ml:133-140)."""
    p = int(t[0])
    m = float(1 << p)
    e = hll_estimation(64, t)
    if e <= 5.0 * m:
        return e - estimate_bias(e, p)
    return e


def card_hllpp(t: np.ndarray) -> float:
    """HLL++ estimate (hll.ml:142-153): linear counting vs threshold vs ep."""
    assert validate(t)
    p = int(t[0])
    m = 1 << p
    nulls = count_nulls(t)
    if nulls == 0:
        return ep(t)
    h = linear_counting(m, nulls)
    return h if h <= get_threshold(p) else ep(t)


card = card_hllpp
