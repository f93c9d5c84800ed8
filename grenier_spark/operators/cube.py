"""Sketch CUBE: every GROUPING SET of a dimension list from ONE build.

The whole-cube-from-one-scan pattern for approximate distinct counts
(and any other byte-exact-mergeable sketch kind): the token/key scan
happens once at the leaf grouping, and every coarser cell — all 2^d
grouping sets down to the grand total — is a register-max/+/OR merge of
KB leaf blobs (``merge_partials``). At 10^12 rows the raw scan is the
only data-scale stage; the lattice is sketch algebra over sketch-count
rows. Rolled-up dimensions are labeled ``'ALL'`` (caller guarantees the
real dimension values never collide with the label, same contract as
SQL's COALESCE-on-ROLLUP idiom).

Exactness: merges are associative and byte-exact for order-insensitive
kinds (hll max / cms + / bloom OR / kmv bottom-k union), so every cell
equals a direct build at that grouping — the property the
``hll_cube_tokens`` driver gate checks against DuckDB's per-grouping-set
0-ULP estimator replay.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketch_build import SketchSpec, build_sketches, merge_partials

# order-INsensitive kinds whose merges are byte-exact at any fan-in/order
# (kll/tdigest/ddsum/mom/fd compact order-dependently, mg decrements
# depend on the grouping — cells would not equal direct builds)
_MERGEABLE = {"hll", "cms", "csk", "bloom", "kmv", "dd"}


def sketch_cube(df: DataFrame, dims: "list[str]", specs: "list[SketchSpec]",
                all_label: str = "ALL", fanout: int = 32) -> DataFrame:
    """One row per (grouping set x spec): ``dims`` columns (rolled-up ones
    = ``all_label``), sketch_name, sketch, n_rows, n_values — the same
    row shape as :func:`build_sketches`, so every downstream estimate
    helper applies unchanged.

    ONE leaf build pass at the finest grouping; the leaf frame is
    localCheckpoint-ed (KB rows: the product of dimension cardinalities
    x specs), then each coarser grouping set merges leaf blobs.
    """
    if not dims:
        raise ValueError("sketch_cube: need at least one dimension")
    bad = [s.kind for s in specs if s.kind not in _MERGEABLE]
    if bad:
        raise ValueError(
            f"sketch_cube: order-sensitive kinds {bad} cannot cube "
            f"(their merges are not byte-exact at arbitrary grouping); "
            f"supported: {sorted(_MERGEABLE)}")
    kind_of = {s.name: s.kind for s in specs}
    leaf = build_sketches(df, specs, group_cols=dims,
                          fanout=fanout).localCheckpoint()
    # leaf rows carry part_id = -1 (already merged); merge_partials salts
    # its first reduce wave by part_id, so re-stamp the REAL partition id
    # or a million-leaf dimension would funnel every blob of a coarse
    # cell into one task instead of the two bounded-fan-in waves
    salted = leaf.withColumn("part_id",
                             F.spark_partition_id().cast("int"))
    out = leaf
    for r in range(len(dims)):  # keep r of d dims; r == d is the leaf
        for keep in combinations(dims, r):
            up = salted
            for dcol in dims:
                if dcol not in keep:
                    up = up.withColumn(dcol, F.lit(all_label))
            out = out.unionByName(merge_partials(up, kind_of, dims,
                                                 fanout=fanout))
    return out
