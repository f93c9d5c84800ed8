"""Heavy-hitter sketches: Lossy Counting + Sticky Sampling (Manku & Motwani,
VLDB 2002), with the reference library's exact single-stream semantics
(/root/reference/countish/lossy.ml, /root/reference/countish/sticky.ml).

Reference quirks kept verbatim (SURVEY.md §2.2 note):

* lossy: the bucket id is the FLOAT ``n / bucket_width`` (lossy.ml:47), so a
  new key's delta is ``n_at_insert / width - 1.0`` (not the paper's integer
  ``ceil(n/w) - 1``); prune fires when ``n mod width == 0`` (lossy.ml:53-54)
  dropping entries with ``f + delta <= bucket`` (lossy.ml:23-30).
* lossy report (lossy.ml:34-42): emit (key, f/n + support) when
  ``f/n >= support - delta`` and ``f/n > threshold - support``.
* sticky: new keys are inserted UNCONDITIONALLY (sticky.ml:60-62, the paper
  samples them at rate 1/r); existing keys increment with prob 1/r; the
  sampling rate doubles when ``n > t`` with ``t = 2/eps * ln(1/(s*delta))``
  initially (sticky.ml:13, 56-59); prune halves counts geometrically.

Batch updates are EXACTLY equivalent to the reference's per-item loop: chunks
are split at prune/doubling boundaries and collapsed with pandas
value_counts / first-occurrence indices (lossy is deterministic; sticky draws
its per-occurrence coins from a seeded numpy PCG64 in item order — the
reference uses OCaml's self-seeded Random, so cross-language RNG parity is
impossible; determinism under our seed is the contract).

Distributed variant: ``LossyCounter.merge`` sums frequencies and takes the
summed deltas as the error bound — the standard distributed lossy-counting
merge; the per-item guarantees (every key with true relative frequency >=
support is reported; none below support - eps) still hold and are what tests
assert. Sticky sampling does not merge cleanly (sampling rates differ); it is
exposed per-partition only, like the reference's single-stream contract.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class LossyCounter:
    __slots__ = ("support", "error_tolerance", "bucket_width", "n", "f", "delta")

    def __init__(self, support: float, error_tolerance: float):
        self.support = support
        self.error_tolerance = error_tolerance
        self.bucket_width = int(math.ceil(1.0 / error_tolerance))
        self.n = 0
        self.f: dict = {}
        self.delta: dict = {}

    def observe(self, key) -> None:
        self.observe_batch(np.asarray([key]))

    def _prune(self, bucket: float) -> None:
        drop = [k for k, fv in self.f.items() if fv + self.delta[k] <= bucket]
        for k in drop:
            del self.f[k]
            del self.delta[k]

    def observe_batch(self, keys: np.ndarray) -> None:
        """Exact batch equivalent of looping ``observe`` (lossy.ml:45-54)."""
        w = self.bucket_width
        pos = 0
        keys = np.asarray(keys)
        if keys.dtype.kind == "f":
            # NaN keys would silently vanish from value_counts while still
            # inflating n; drop them from BOTH so frequencies stay consistent
            keys = keys[~np.isnan(keys)]
        while pos < len(keys):
            # chunk ends at the next prune boundary (n multiple of width)
            room = w - (self.n % w)
            chunk = keys[pos:pos + room]
            pos += len(chunk)
            s = pd.Series(chunk)
            counts = s.value_counts(sort=False)
            first_idx = pd.Series(np.arange(len(chunk)), index=s.values)
            first_idx = first_idx[~first_idx.index.duplicated(keep="first")]
            n0 = self.n
            for k, c in counts.items():
                if k in self.f:
                    self.f[k] += float(c)
                else:
                    self.f[k] = float(c)
                    n_ins = n0 + int(first_idx[k]) + 1
                    self.delta[k] = float(n_ins) / float(w) - 1.0
            self.n += len(chunk)
            if self.n % w == 0:
                self._prune(float(self.n) / float(w))

    def _absent_bound(self) -> float:
        """Upper bound on the true count of any key ABSENT from this
        counter's summary: after n items with bucket width w, a pruned or
        never-inserted key occurred at most n/w times (Manku-Motwani
        Lemma 1-style bound)."""
        return float(self.n) / float(self.bucket_width)

    def merge(self, other: "LossyCounter") -> None:
        """Distributed merge: sum f; deltas add, and a key missing from one
        side additionally absorbs that side's absent-key bound — without it
        a key pruned from stream A but reported by stream B would lose A's
        error term and the no-false-negative guarantee."""
        if (self.support, self.error_tolerance) != (other.support, other.error_tolerance):
            raise ValueError("merge: lossy counter configs must be identical")
        for k in self.f:
            if k not in other.f:
                self.delta[k] += other._absent_bound()
        for k, fv in other.f.items():
            if k in self.f:
                self.f[k] += fv
                self.delta[k] += other.delta[k]
            else:
                self.f[k] = fv
                self.delta[k] = other.delta[k] + self._absent_bound()
        self.n += other.n

    def items_above_threshold(self, threshold: float) -> list:
        """Reference-verbatim report incl. its ``+ support`` output bias
        (lossy.ml:34-42)."""
        out = []
        n = float(self.n)
        for k, fv in self.f.items():
            f = fv / n
            if f >= self.support - self.delta[k] and f > threshold - self.support:
                out.append((k, f + self.support))
        return out

    def heavy_hitters(self, min_freq: float) -> list:
        """Paper-semantics report: keys with estimated relative frequency
        ``(f + delta)/n >= min_freq`` (upper-bound form used by the Spark
        operator; guarantees: no true-frequency >= min_freq key is missed)."""
        n = float(self.n)
        return [(k, (fv + self.delta[k]) / n) for k, fv in self.f.items()
                if (fv + self.delta[k]) / n >= min_freq]


class StickySampler:
    __slots__ = ("support", "error_tolerance", "failure_prob", "r", "n", "t",
                 "s", "_rng", "_order")

    def __init__(self, support: float, error_tolerance: float,
                 failure_prob: float, seed: int = 42):
        self.support = support
        self.error_tolerance = error_tolerance
        self.failure_prob = failure_prob
        self.r = 1
        self.n = 0
        self.t = 2.0 / error_tolerance * math.log(1.0 / (support * failure_prob))
        self.s: dict = {}
        self._rng = np.random.Generator(np.random.PCG64(seed))

    def _prune(self) -> None:
        # geometric halving per key (sticky.ml:24-39), insertion order
        drop = []
        for k in self.s:
            v = self.s[k]
            while v > 0 and self._rng.integers(0, 2) != 0:
                v -= 1
            if v <= 0:
                drop.append(k)
            else:
                self.s[k] = v
        for k in drop:
            del self.s[k]

    def observe(self, key) -> None:
        self.observe_batch(np.asarray([key]))

    def observe_batch(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys)
        pos = 0
        while pos < len(keys):
            # chunk ends where n would cross the doubling threshold t
            room = max(1, int(math.floor(self.t)) - self.n) if self.n + 1 <= self.t \
                else 1
            chunk = keys[pos:pos + room]
            # doubling check happens per item BEFORE the dict update
            if self.n + 1 > self.t:
                self.t *= 2.0
                self.r *= 2
                self._prune()
            draws = self._rng.random(len(chunk)) * self.r <= 1.0
            s = pd.Series(chunk)
            seen_before = s.isin(self.s).to_numpy(dtype=bool)
            dup_in_chunk = s.duplicated(keep="first").to_numpy()
            is_new = ~seen_before & ~dup_in_chunk
            inc = (~is_new) & draws
            upd = pd.DataFrame({"k": chunk, "new": is_new, "inc": inc}) \
                .groupby("k", sort=False).agg(news=("new", "any"), incs=("inc", "sum"))
            for k, row in upd.iterrows():
                if row["news"]:
                    self.s[k] = 1 + int(row["incs"])
                else:
                    self.s[k] = self.s.get(k, 0) + int(row["incs"])
            self.n += len(chunk)
            pos += len(chunk)

    def items_above_threshold(self, threshold: float) -> list:
        """Reference-verbatim (sticky.ml:43-51), incl. ``+ support`` bias."""
        out = []
        n = float(self.n)
        for k, f in self.s.items():
            if float(f) >= (threshold - self.error_tolerance) * n:
                out.append((k, float(f) / n + self.support))
        return out
