"""Rendezvous (highest-random-weight) hashing.

Companion to the reference's jump consistent hash (jmphash/jmphash.ml,
core/jmphash.py) for the placement problems jump hash cannot express:
jump hash only supports ADDING/REMOVING the highest-numbered bucket,
while HRW (Thaler & Ravishankar, IEEE/ACM ToN 1998) tolerates removal of
an ARBITRARY node — exactly one node's keys move, everyone else's stay —
at the cost of O(n) hash evaluations per key instead of O(ln n).

Score chain reuses the sketch kernels so the DuckDB oracle can replay it
bit-exactly (functions/sql_oracles.hrw_buckets_sql):

    score(key, i) = wang64(key XOR splitmix64(i + 1))
    owner(key)    = argmax_i score — ties break to the SMALLEST i
                    (a tie needs a wang64 collision across salts;
                    the rule exists so both engines agree if one occurs).

Properties (tests/test_rendezvous.py):
* removing node r relocates exactly the keys owned by r, nothing else;
* adding node n relocates ~1/(n+1) of keys, all TO the new node;
* occupancy is multinomial-uniform across nodes.

At 100 TB: bucket assignment is a per-row numpy pass inside the Arrow
batch (n_nodes small — shard/executor counts), no shuffle, no state; the
n-fold hash cost is per-batch vectorized, ~n * one wang64 pass.
"""

from __future__ import annotations

import numpy as np

from .bits import U64, splitmix64, splitmix64_scalar, wang64, wang64_scalar


def hrw_salts(n: int) -> np.ndarray:
    """Per-node salts splitmix64(1..n) (same derivation as the count-min /
    Bloom hash families in core/countmin.py)."""
    if n <= 0:
        raise ValueError("n must be positive")
    return splitmix64(np.arange(1, n + 1, dtype=np.uint64))


def hrw_bucket(keys: np.ndarray, n: int) -> np.ndarray:
    """Vectorized HRW owner in [0, n) per key (nodes 0..n-1 all live)."""
    if n <= 0:
        raise ValueError("n must be positive")
    return hrw_bucket_among(keys, range(n))


def hrw_bucket_among(keys: np.ndarray, node_ids) -> np.ndarray:
    """Vectorized HRW owner among an ARBITRARY live-node set.

    Returns the winning node id per key (not an index into ``node_ids``).
    This is the removal story: after node r dies, pass the survivor set —
    every key owned by a survivor keeps its owner, because survivors'
    scores are unchanged.  Running argmax over the node scores — two live
    buffers regardless of node count; strict ``>`` over ascending node
    ids keeps the smallest id on a (cosmically unlikely) score tie.
    """
    ids = np.unique(np.asarray(list(node_ids), dtype=np.int64))
    if len(ids) == 0:
        raise ValueError("need at least one live node")
    if (ids < 0).any():
        raise ValueError("node ids must be non-negative")
    salts = splitmix64(ids.astype(np.uint64) + U64(1))
    keys = np.asarray(keys).astype(U64, copy=False)
    best = wang64(keys ^ salts[0])
    owner = np.full(len(keys), ids[0], dtype=np.int64)
    for i in range(1, len(ids)):
        s = wang64(keys ^ salts[i])
        take = s > best
        owner[take] = ids[i]
        np.maximum(best, s, out=best)
    return owner


def hrw_bucket_scalar(key: int, n: int) -> int:
    """Arbitrary-precision reference implementation (tests/oracles)."""
    if n <= 0:
        raise ValueError("n must be positive")
    key &= (1 << 64) - 1
    best, owner = -1, 0
    for i in range(n):
        s = wang64_scalar(key ^ splitmix64_scalar(i + 1))
        if s > best:
            best, owner = s, i
    return owner
