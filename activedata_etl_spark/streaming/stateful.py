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

STATE_SCHEMA = "n long, d long, m long"


def keyed_running_counts(
    stream: DataFrame,
    key_col: str = "repo",
    *,
    op_col: str = "op",
    seq_col: str = "commit_seq",
) -> DataFrame:
    """Cumulative (events, deletes, max seq) per key across ALL
    micro-batches seen so far — emitted in `update` mode each time a key
    receives events.  The output key column carries ``key_col``'s name (a
    hardcoded name would mislabel e.g. path-keyed counts as repos)."""
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, n_events long, n_deletes long, "
        "max_commit_seq long"
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n = d = 0
        m = None  # 'no seq seen yet' — emitting 0 would fabricate a real
                  # sequence number indistinguishable from seq 0 downstream
        if state.exists:
            n, d, m = state.get
        for pdf in pdfs:
            n += len(pdf)
            d += int((pdf[op_col] == "delete").sum())
            mx = pdf[seq_col].max()
            if pd.notna(mx):  # an all-null seq batch must not int(NaN)-crash
                m = int(mx) if m is None else max(m, int(mx))
        state.update((n, d, m))
        yield pd.DataFrame(
            [{key_col: key[0], "n_events": n, "n_deletes": d,
              "max_commit_seq": m}]
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def windowed_event_counts(
    stream: DataFrame,
    *,
    window_duration: str = "10 seconds",
    watermark_delay: str = "30 seconds",
    key_col: str = "repo",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over the event stream — the
    canonical Structured Streaming late-data pattern (the reference's only
    windowing is fixed message blocks, `pulse_logger.py:41`; rollover
    routing by `floor(ts, interval)` is the batch-side analog).

    ``withWatermark`` bounds state: windows older than the watermark are
    finalized and dropped from the store; events arriving later than
    ``watermark_delay`` past their window are discarded by the engine —
    complementary to the lake path, where late events are QUARANTINED
    (merge.apply_batch) because the converged table must stay exact.  Use
    this operator for monitoring aggregates, never as the system of
    record.  Output in append mode: one final row per (window, key).
    """
    from pyspark.sql import functions as F

    return (
        stream
        .withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("op") == F.lit("delete")).cast("long")
            ).alias("n_deletes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col, "n_events", "n_deletes",
        )
    )


def session_event_stats(
    stream: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark_delay: str = "30 seconds",
    key_col: str = "repo",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based SESSION windows over the event stream — Spark's native
    ``session_window`` (dynamic, per-key merging windows), the streaming
    twin of the batch `operators.temporal.sessionize`.

    The engine merges overlapping per-key windows as events arrive and
    finalizes a session once the watermark passes its close (start of the
    last event + ``gap``); append mode emits exactly one row per closed
    session.  State is bounded by the watermark like the tumbling variant;
    same monitoring-not-system-of-record caveat.  Batch mode runs the
    identical expression (tested for streaming==batch parity), so one
    definition serves live dashboards and backfills.
    """
    from pyspark.sql import functions as F

    return (
        stream
        .withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("commit_seq").alias("max_commit_seq"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col, "n_events", "max_commit_seq",
        )
    )
