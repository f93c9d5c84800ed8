"""Custom stateful streaming operator: per-key sketch state maintained in
the Structured Streaming state store via ``applyInPandasWithState``.

Complements streaming/incremental.py (foreachBatch + checkpoint table):
here the serialized sketch lives IN the state store, keyed by the group
column, and every trigger emits the refreshed estimate per key — the shape
you want for a live "distinct tokens per source" dashboard over a document
firehose. State is the grenier wire format (KB-sized), so the state store
stays tiny regardless of token volume; updates are the same vectorized
kernels as the batch path.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd

from ..core import hll
from ..core.bits import U64, wang64


def hll_state_stream(stream_df, group_col: str, tokens_col: str = "tokens",
                     p: int = 12):
    """(group, est_distinct, n_docs, n_tokens) per trigger per updated key.

    Usage::

        out = hll_state_stream(stream, "source", "tokens", p=12)
        q = (out.writeStream.outputMode("update").format("memory")
                .queryName("live").start())
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{group_col} string, est_distinct double, "
                  "n_docs bigint, n_tokens bigint")
    state_schema = "sketch binary, n_docs bigint, n_tokens bigint"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            blob, n_docs, n_tokens = state.get
            t = hll.from_bytes(bytes(blob))
        else:
            t, n_docs, n_tokens = hll.make_p(p), 0, 0
        for pdf in pdfs:
            toks = (np.concatenate([np.asarray(v) for v in pdf[tokens_col]])
                    if len(pdf) else np.empty(0, dtype=np.int64))
            if len(toks):
                hll.add_batch(t, wang64(toks.astype(np.int64).view(U64)))
            n_docs += len(pdf)
            n_tokens += len(toks)
        state.update((hll.to_bytes(t), n_docs, n_tokens))
        yield pd.DataFrame({group_col: [key[0]],
                            "est_distinct": [hll.card(t)],
                            "n_docs": [n_docs], "n_tokens": [n_tokens]})

    return (stream_df.groupBy(group_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))
