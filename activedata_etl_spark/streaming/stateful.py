"""Custom stateful streaming operator: per-key running counters via
``applyInPandasWithState``.

The engine's load-bearing state lives in the lake table (rerun-safe,
SURVEY §2.9) — but some monitoring-style operators genuinely need
cross-micro-batch in-stream state, the analog of the reference's running
ETL counters (keys/sec logging `activedata_etl/push_to_es.py:88-97`, queue
depth `:216-219`).  This module is that path: Arrow-batched state handler,
state checkpointed with the query, one output row per updated key per
micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "repo string, n_events long, n_deletes long, max_commit_seq long"
)
STATE_SCHEMA = "n long, d long, m long"


def keyed_running_counts(stream: DataFrame, key_col: str = "repo") -> DataFrame:
    """Cumulative (events, deletes, max commit_seq) per key across ALL
    micro-batches seen so far — emitted in `update` mode each time a key
    receives events."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n = d = m = 0
        if state.exists:
            n, d, m = state.get
        for pdf in pdfs:
            n += len(pdf)
            d += int((pdf["op"] == "delete").sum())
            m = max(m, int(pdf["commit_seq"].max()))
        state.update((n, d, m))
        yield pd.DataFrame(
            [{"repo": key[0], "n_events": n, "n_deletes": d, "max_commit_seq": m}]
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
