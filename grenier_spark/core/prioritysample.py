"""PrioritySample — mergeable weighted-sample-without-replacement summary
(priority sampling, Duffield-Lund-Thorup JACM 2007).

State = the (k+1) highest-priority ``(id, weight, priority)`` triples seen
so far, ordered by (priority desc, id asc). That is the WHOLE state: the
top-(k+1) of a union is the top-(k+1) of the per-part top-(k+1) lists, so
``merge`` is an associative, commutative fold over disjoint input streams
— the same contract as every other sketch kind in this suite, which makes
priority sampling buildable through the two-level
bounded-fan-in pipeline (operators/sketch_build.build_priority_sample)
with NO row_number window: a group holding 10^11 of the 10^12 rows folds
in parallel across all its partitions instead of pinning one reducer.

Queries: the top-k items are the sample; ``tau`` = the (k+1)-th priority
(0.0 while the population fits in k, making everything exact); each
sampled item's adjusted weight is ``w_hat = max(w, tau)`` and
``sum(w_hat over sample ∩ S)`` is an unbiased estimator of ``sum(w over
S)`` for any subset S fixed independently of the priority randomness
(DLT Thm. 1) with near-optimal variance.

Priorities are SUPPLIED by the caller (this class is the selection/merge
state, not the hash): the deterministic md5-chain priorities of
``operators/splits._priority_inputs`` keep every downstream estimate
value-exactly reproducible in DuckDB. Ids are int64 by contract (doc/seq
ids — the north-rule payload); ties break by id ascending. Inputs to
``update_batch``/``merge`` must be DISJOINT streams (same multiset
contract as every counting sketch here — feeding the same id twice
double-counts it).

Wire format: ``<4sqq`` (magic b"PS01", k, n_items) + int64 LE ids +
int64 LE weights + float64 LE priorities, items in (priority desc,
id asc) order.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"PS01"
_HDR = struct.Struct("<4sqq")


class PrioritySample:
    __slots__ = ("k", "ids", "weights", "prios")

    def __init__(self, k: int,
                 ids: "np.ndarray | None" = None,
                 weights: "np.ndarray | None" = None,
                 prios: "np.ndarray | None" = None):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.ids = (np.empty(0, dtype=np.int64) if ids is None else ids)
        self.weights = (np.empty(0, dtype=np.int64) if weights is None
                        else weights)
        self.prios = (np.empty(0, dtype=np.float64) if prios is None
                      else prios)

    # -- update / merge ----------------------------------------------------

    def _select(self, ids: np.ndarray, weights: np.ndarray,
                prios: np.ndarray) -> None:
        """Keep the top-(k+1) by (priority desc, id asc)."""
        order = np.lexsort((ids, -prios))[: self.k + 1]
        self.ids = ids[order]
        self.weights = weights[order]
        self.prios = prios[order]

    def update_batch(self, ids: np.ndarray, weights: np.ndarray,
                     prios: np.ndarray) -> None:
        ids = np.asarray(ids)
        if ids.dtype.kind not in "iu":
            raise ValueError("prioritysample: ids must be integers "
                             "(string ids stay on the window operator)")
        ids = ids.astype(np.int64, copy=False)
        w = np.asarray(weights)
        if w.dtype.kind == "f":
            raise ValueError("prioritysample: weights must be integers")
        w = w.astype(np.int64, copy=False)
        prios = np.asarray(prios, dtype=np.float64)
        if not (len(ids) == len(w) == len(prios)):
            raise ValueError(f"prioritysample: length mismatch "
                             f"{len(ids)}/{len(w)}/{len(prios)}")
        if not len(ids):
            return
        if np.any(w < 0):
            raise ValueError("prioritysample: weights must be >= 0")
        if not np.all(np.isfinite(prios)) or np.any(prios < 0):
            raise ValueError("prioritysample: priorities must be finite "
                             "and >= 0")
        # zero-weight items have priority 0 and can never beat a positive
        # one, but drop them anyway so they cannot fill a small population
        # (a sampled zero-weight item with tau > 0 would bias w_hat up)
        pos = w > 0
        ids, w, prios = ids[pos], w[pos], prios[pos]
        if not len(ids):
            return
        # prune the batch before concatenation with the same
        # (priority desc, id asc) order the state keeps. O(n) argpartition
        # narrows to the top-(k+1) priorities first; every item TIED with
        # the boundary priority is kept as a candidate so the id-asc tie
        # rule still picks the right ones, then only the candidates pay
        # the lexsort (O(k log k) when priorities are distinct — the
        # hash-derived common case; a degenerate all-tied batch degrades
        # to the old full sort, which is still correct)
        if len(ids) > self.k + 1:
            m = self.k + 1
            part = np.argpartition(-prios, m - 1)[:m]
            cand = np.flatnonzero(prios >= prios[part].min())
            order = np.lexsort((ids[cand], -prios[cand]))[:m]
            sel = cand[order]
            ids, w, prios = ids[sel], w[sel], prios[sel]
        self._select(np.concatenate([self.ids, ids]),
                     np.concatenate([self.weights, w]),
                     np.concatenate([self.prios, prios]))

    def merge(self, other: "PrioritySample") -> "PrioritySample":
        if self.k != other.k:
            raise ValueError(f"cannot merge PrioritySample k={self.k} "
                             f"with k={other.k}")
        self._select(np.concatenate([self.ids, other.ids]),
                     np.concatenate([self.weights, other.weights]),
                     np.concatenate([self.prios, other.prios]))
        return self

    def fold(self, k_new: int) -> "PrioritySample":
        """EXACT shrink to a smaller k (the exact-fold family contract,
        same class as hll precision / cms depth / kmv k folds): the
        top-(k'+1) of the stored top-(k+1) IS the global top-(k'+1) for
        any k' <= k, so the folded state is bit-identical to a direct
        k' build over the same stream — heterogeneous fleets merge at
        the smallest k. Returns a NEW state; raises on k_new > k
        (information the state never kept)."""
        if not (1 <= k_new <= self.k):
            raise ValueError(
                f"prioritysample: can only fold to 1 <= k_new <= k "
                f"({k_new} vs k={self.k})")
        n = min(k_new + 1, len(self.ids))
        return PrioritySample(k_new, self.ids[:n].copy(),
                              self.weights[:n].copy(),
                              self.prios[:n].copy())

    # -- queries -----------------------------------------------------------

    @property
    def tau(self) -> float:
        """(k+1)-th largest priority — 0.0 while the population fits in
        k (every estimate exact)."""
        return float(self.prios[self.k]) if len(self.prios) > self.k \
            else 0.0

    def items(self) -> "list[tuple[int, int, float]]":
        """The k sampled (id, weight, w_hat) triples, priority-descending
        (ties by id asc)."""
        tau = self.tau
        n = min(self.k, len(self.ids))
        return [(int(self.ids[i]), int(self.weights[i]),
                 max(float(self.weights[i]), tau)) for i in range(n)]

    def estimate_total(self) -> float:
        """Unbiased estimate of the TOTAL weight of the population (the
        subset-sum estimator at S = everything)."""
        import math
        return math.fsum(wh for _, _, wh in self.items())

    # -- serde -------------------------------------------------------------

    def to_bytes(self) -> bytes:
        n = len(self.ids)
        return (_HDR.pack(_MAGIC, self.k, n)
                + self.ids.astype("<i8").tobytes()
                + self.weights.astype("<i8").tobytes()
                + self.prios.astype("<f8").tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "PrioritySample":
        magic, k, n = _HDR.unpack_from(blob)
        if magic != _MAGIC:
            raise ValueError("not a PrioritySample blob")
        off = _HDR.size
        ids = np.frombuffer(blob, dtype="<i8", offset=off,
                            count=n).astype(np.int64)
        weights = np.frombuffer(blob, dtype="<i8", offset=off + 8 * n,
                                count=n).astype(np.int64)
        prios = np.frombuffer(blob, dtype="<f8", offset=off + 16 * n,
                              count=n).astype(np.float64)
        if n > k + 1 or np.any(weights <= 0) \
                or not np.all(np.isfinite(prios)):
            raise ValueError("corrupt PrioritySample blob")
        if n > 1 and np.any(np.diff(prios) > 0):
            raise ValueError("corrupt PrioritySample blob: priorities "
                             "not descending")
        return cls(k, ids, weights, prios)
