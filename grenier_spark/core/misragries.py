"""Misra-Gries heavy-hitters summary (Misra & Gries 1982), mergeable per
Agarwal et al., "Mergeable Summaries" (PODS 2012, §3.1): keep at most
``k`` (key, counter) pairs; merging two summaries sums counters
pointwise, then — if more than ``k`` keys survive — subtracts the
(k+1)-th largest counter from every counter and drops the non-positive
ones. Updates fold a batch as a merge with that batch's EXACT histogram.

North-rule extension operator in the same family as countish
(reference countish/lossy.ml:14-54 solves the same frequent-items
problem with lossy counting; MG is the deterministic mergeable-summary
counterpart the distributed two-level build wants — no per-partition
epsilon bookkeeping, just associative-enough counter algebra).

Deterministic guarantees (no randomness anywhere), with ``decr`` the
total amount ever subtracted during prunes:

* soundness:    stored[x] <= c(x)            for every stored key x
* per-key bias: c(x) - stored[x] <= decr     (absent keys: c(x) <= decr)
* prune bound:  decr * (k + 1) <= n - n_hat  <= n
  (every subtract-t event removes >= (k+1)*t stored mass: at least the
  k+1 largest counters each lose exactly t), hence the PODS-2012 bound
  c(x) - stored[x] <= n/(k+1) under ANY merge tree.

So every key with c(x)*(k+1) > n is GUARANTEED present — an exact
integer-arithmetic predicate both engines can evaluate, which is what
the gate query emits. Counter VALUES depend on batch/merge boundaries
(like KLL/t-digest, the summary is deterministic per partitioning, not
byte-canonical), so parity tests pin the partitioning and oracle gates
check the guarantees, not the bytes.

Wire format: ``<4sIIqq`` (magic b"MGK1", k, n_kept, n, decr) + keys
(sorted int64 LE) + counters (int64 LE).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"MGK1"
_HDR = struct.Struct("<4sIIqq")


class MisraGries:
    __slots__ = ("k", "keys", "counts", "n", "decr")

    def __init__(self, k: int, keys: "np.ndarray | None" = None,
                 counts: "np.ndarray | None" = None, n: int = 0,
                 decr: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.keys = (np.empty(0, dtype=np.int64) if keys is None else keys)
        self.counts = (np.empty(0, dtype=np.int64) if counts is None
                       else counts)
        self.n = n
        self.decr = decr

    def _absorb(self, keys: np.ndarray, counts: np.ndarray,
                weight: int) -> None:
        """Merge an exact (sorted-unique keys, positive counts) histogram
        carrying ``weight`` total observations into the summary."""
        if len(self.keys):
            all_keys = np.concatenate([self.keys, keys])
            all_counts = np.concatenate([self.counts, counts])
            order = np.argsort(all_keys, kind="stable")
            sk, sc = all_keys[order], all_counts[order]
            uniq_mask = np.empty(len(sk), dtype=bool)
            uniq_mask[0] = True
            np.not_equal(sk[1:], sk[:-1], out=uniq_mask[1:])
            idx = np.flatnonzero(uniq_mask)
            merged_keys = sk[idx]
            merged_counts = np.add.reduceat(sc, idx)
        else:
            merged_keys, merged_counts = keys, counts.copy()
        if len(merged_keys) > self.k:
            # t = (k+1)-th largest counter; subtract from all, keep > 0
            t = int(np.partition(merged_counts,
                                 len(merged_counts) - (self.k + 1))
                    [len(merged_counts) - (self.k + 1)])
            merged_counts = merged_counts - t
            keep = merged_counts > 0
            merged_keys = merged_keys[keep]
            merged_counts = merged_counts[keep]
            self.decr += t
        self.keys, self.counts = merged_keys, merged_counts
        self.n += int(weight)

    def update_batch(self, keys: np.ndarray,
                     weights: "np.ndarray | None" = None) -> None:
        """Fold a batch of int64 keys (optionally pre-counted with
        ``weights``) — one exact-histogram merge per call."""
        keys = np.asarray(keys)
        if not len(keys):
            return
        keys = keys.astype(np.int64, copy=False)
        if weights is None:
            uk, uc = np.unique(keys, return_counts=True)
            uc = uc.astype(np.int64)
        else:
            w = np.asarray(weights).astype(np.int64, copy=False)
            uk, inv = np.unique(keys, return_inverse=True)
            # bincount(weights=) would round-trip through float64; counts
            # stay exact int64 via scatter-add (arrays are vocab-scale)
            uc = np.zeros(len(uk), dtype=np.int64)
            np.add.at(uc, inv, w)
        self._absorb(uk, uc, int(uc.sum()))

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError(f"cannot merge MisraGries k={self.k} with "
                             f"k={other.k}")
        self.decr += other.decr
        self._absorb(other.keys, other.counts, other.n)
        return self

    def items(self) -> "list[tuple[int, int, int]]":
        """(key, lower_bound, upper_bound) per stored key, key-ascending:
        lower = stored counter <= c(key) <= stored + decr = upper."""
        return [(int(k), int(c), int(c) + self.decr)
                for k, c in zip(self.keys, self.counts)]

    def to_bytes(self) -> bytes:
        return (_HDR.pack(_MAGIC, self.k, len(self.keys), self.n, self.decr)
                + self.keys.astype("<i8").tobytes()
                + self.counts.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        magic, k, m, n, decr = _HDR.unpack_from(blob)
        if magic != _MAGIC:
            raise ValueError("not a MisraGries blob")
        body = np.frombuffer(blob, dtype="<i8", offset=_HDR.size)
        if len(body) != 2 * m or m > k:
            raise ValueError(f"corrupt MisraGries blob: {len(body)} words, "
                             f"header says {m} keys (k={k})")
        keys = body[:m].astype(np.int64)
        counts = body[m:].astype(np.int64)
        if m > 1 and not np.all(keys[:-1] < keys[1:]):
            raise ValueError("corrupt MisraGries blob: keys not sorted "
                             "unique")
        if m and int(counts.min()) <= 0:
            raise ValueError("corrupt MisraGries blob: non-positive counter")
        return cls(k, keys, counts, n, decr)
