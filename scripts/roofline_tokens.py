#!/usr/bin/env python
"""Bytes-moved-per-token roofline for the token-vocab sketch build.

Answers the round-4/5 VERDICT stretch question — is >110 M tokens/s
reachable on this guest, or is the recorded 102.2 M t/s quiet-window
record already at the machine's ceiling? — with measurements instead of
narrative:

1. **memcpy bandwidth** at P processes (fork pool, 256 MB streams):
   the guest's aggregate DRAM ceiling for *any* token-scale pass.
2. **kernel tokens/s** at 1 and P processes over the real bench fixture
   (`.fixtures/docs_bench_2000000`, 64 parquet files, 272 M int32
   tokens): the exact per-batch pipeline the Spark build runs inside
   `mapInArrow` — flatten -> composite bincount -> wang64 over distinct
   ids -> HLL(p=14)/CMS/Bloom updates from counts — WITHOUT the
   JVM/Arrow-IPC hop, isolating what the Python side could ever do.
3. **parquet-decode tokens/s** at P processes: the scan-side floor
   (page-cache-warm snappy decode + Arrow list assembly).

Implied ceiling = aggregate_bandwidth / bytes_touched_per_token, with
bytes_touched measured as (memcpy GB/s) / (kernel tokens/s) at
saturation. If the Spark pipeline's quiet-window record sits within
~25% of combine(kernel, decode) at P procs, the ceiling is reached and
the stretch item closes with numbers.

Run in a probe-certified window (the script embeds bench.py's
calibration probe and stamps its verdict in the JSON):

    python scripts/roofline_tokens.py [--procs 8] [--out BENCH/...json]
"""

from __future__ import annotations

import argparse
import glob
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, ".fixtures", "docs_bench_2000000")


def _memcpy_pass(_):
    import numpy as np

    src = np.empty(1 << 28, dtype=np.uint8)  # 256 MB
    src[:: 1 << 12] = 1  # fault pages in
    dst = np.empty_like(src)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        best = min(best, time.perf_counter() - t0)
    return (1 << 28) / best  # bytes/s one-directional (2x traffic on bus)


def _kernel_pass(files):
    """(tokens, decode_sec, kernel_sec) over a file subset — the same
    per-batch work _Accumulator.feed does for the bench's specs, minus
    the Arrow IPC hop."""
    import numpy as np
    import pyarrow.parquet as pq

    from grenier_spark.core import hll
    from grenier_spark.core.bits import U64, wang64
    from grenier_spark.core.bloom import Bloom
    from grenier_spark.core.countmin import CountMin

    state_h = hll.make_p(14)
    state_c = CountMin(depth=4, width=8192, seed=7)
    state_b = Bloom(m=1 << 20, k=5, seed=7)
    n_tok = 0
    t_dec = 0.0
    t_ker = 0.0
    for f in files:
        t0 = time.perf_counter()
        # use_threads=False: each pool process is ONE decoder, so the
        # aggregate is P single-threaded decoders — the same shape as
        # build_sketches_from_files tasks at n_tasks ~ cores
        col = pq.read_table(f, columns=["tokens"],
                            use_threads=False).column("tokens")
        chunks = [(c.values.to_numpy(zero_copy_only=False))
                  for c in col.chunks]
        t_dec += time.perf_counter() - t0
        for values in chunks:
            t0 = time.perf_counter()
            counts = np.bincount(values, minlength=0)
            nz = np.flatnonzero(counts)
            keys = nz.astype(np.int64).view(U64)
            mult = counts[nz].astype(np.int64)
            hll.add_batch(state_h, wang64(keys))
            state_c.update_batch(keys, weights=mult)
            state_b.update_batch(keys)
            t_ker += time.perf_counter() - t0
            n_tok += len(values)
    return n_tok, t_dec, t_ker


def measure(procs: int) -> dict:
    files = sorted(glob.glob(os.path.join(FIXTURE, "*.parquet")))
    if not files:
        raise SystemExit(f"fixture missing: {FIXTURE} (run bench.py once)")

    # page-cache warm (bench protocol does the same before timing)
    for f in files:
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass

    ctx = mp.get_context("fork")

    with ctx.Pool(procs) as pool:
        pool.map(_memcpy_pass, range(procs))  # warm forks + allocators
        bws = pool.map(_memcpy_pass, range(procs))
        agg_bw = sum(bws)

        shards = [files[i::procs] for i in range(procs)]
        t0 = time.perf_counter()
        parts = pool.map(_kernel_pass, shards)
        wall = time.perf_counter() - t0
    tokens = sum(p[0] for p in parts)
    dec_sec = max(p[1] for p in parts)   # critical-path shard
    ker_sec = max(p[2] for p in parts)
    combined_tps = tokens / wall

    single_tok, single_dec, single_ker = _kernel_pass(files[:8])

    return {
        "procs": procs,
        "n_tokens": tokens,
        "memcpy_agg_bytes_per_sec": round(agg_bw, 0),
        "kernel_tokens_per_sec_agg": round(tokens / ker_sec, 0),
        "decode_tokens_per_sec_agg": round(tokens / dec_sec, 0),
        "combined_tokens_per_sec_agg": round(combined_tps, 0),
        "single_core": {
            "n_tokens": single_tok,
            "kernel_tokens_per_sec": round(single_tok / single_ker, 0),
            "decode_tokens_per_sec": round(single_tok / single_dec, 0),
        },
        "effective_bytes_per_token": round(agg_bw / combined_tps, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench

    bw_ratio, par_eff = bench.calibration_probe()
    res = measure(args.procs)
    res["calibration"] = {
        "bw_ratio": round(bw_ratio, 2), "par_eff": round(par_eff, 2),
        "quiet": bw_ratio <= bench.CAL_LOUD_RATIO
                 and par_eff >= bench.CAL_PAR_QUIET_EFF}
    bw_ratio2, par_eff2 = bench.calibration_probe()
    res["calibration_post"] = {"bw_ratio": round(bw_ratio2, 2),
                               "par_eff": round(par_eff2, 2)}
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
