"""Corpus-WIDE text hygiene operators: cross-document boilerplate removal
and global n-gram frequency ranking.

`functions.text` handles per-row scrubs (intra-doc repeated paragraphs,
PII) — pure Catalyst expressions, no shuffle.  This module holds the ops
whose decision needs the WHOLE corpus: a navigation header appearing in
90% of a crawl's pages is invisible per-document but dominates token
counts corpus-wide (the CCNet/RefinedWeb-style "remove segments shared by
many documents" pass).  The reference's analog is property pruning by
observed frequency across records (`vendor/jx_elasticsearch/meta.py:338`
tracks per-column cardinality over the whole index to decide treatment).

Scale shape (10^10 docs): one explode -> hash-agg on the segment (map-side
combine collapses repeats before the exchange), the surviving "common" set
is SMALL BY CONSTRUCTION (segments above a document-frequency floor obey
sum(df_i) <= total_segments / floor), so the removal join broadcasts; the
rebuild is one shuffle keyed by doc id.  Nothing is quadratic and nothing
collects to the driver.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from activedata_etl_spark.operators.dedup import fanout, shingled


def scrub_common_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n\n",
    min_docs: int = 2,
    broadcast_common: bool = True,
    out_col: str = "scrubbed",
) -> DataFrame:
    """Remove every text segment that appears in >= ``min_docs`` DISTINCT
    documents, preserving each survivor's position; returns
    ``(id_col, out_col, n_removed)``.

    ``sep`` is a LITERAL separator (escaped before Spark's regex split) so
    the SQL oracle's ``string_split`` computes the identical segmentation.
    A null text stays null; a text whose every segment is common comes
    back as ``''`` (the document survives, emptied — the caller's quality
    filter decides its fate, this op never drops rows).

    ``broadcast_common`` reflects the frequency-floor arithmetic above —
    at ``min_docs`` = O(corpus fraction) the common set is tiny.  Pass
    False for aggressive floors (``min_docs=2`` over a near-duplicate
    corpus can make it large), which keeps the sort-merge join.
    """
    if min_docs < 2:
        raise ValueError("min_docs < 2 would remove every segment")
    segs = (
        fanout(df.select(id_col, text_col))
        .where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.posexplode_outer(
                F.split(F.col(text_col), re.escape(sep))
            ).alias("__pos", "__seg"),
        )
    )
    common = (
        segs.groupBy("__seg")
        .agg(F.count_distinct("__id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__seg")
    )
    if broadcast_common:
        common = F.broadcast(common)
    kept = segs.join(common, "__seg", "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
                lambda s: s["__seg"],
            ),
            sep,
        ).alias("__kept_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    n_total = F.size(F.split(F.col(text_col), re.escape(sep)))
    return (
        df.select(id_col, text_col)
        .join(rebuilt, F.col(id_col) == F.col("__id"), "left")
        .select(
            F.col(id_col),
            F.when(
                F.col(text_col).isNotNull(),
                F.coalesce(F.col("__kept_text"), F.lit("")),
            ).alias(out_col),
            F.when(
                F.col(text_col).isNotNull(),
                n_total - F.coalesce(F.col("__n_kept"), F.lit(0)),
            ).cast("int").alias("n_removed"),
        )
    )


def ngram_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` word n-grams by DOCUMENT frequency: ``(shingle, n_docs)``,
    ordered by ``n_docs`` desc then shingle asc (deterministic ties).

    Document frequency (not occurrence count) on purpose: it is the
    boilerplate signal — a shingle in half the corpus is template text no
    matter how often one page repeats it — and `shingled` already emits
    each doc's DISTINCT shingles, so the count needs no second dedup.
    One partial-agg shuffle; the global top-k is Spark's TakeOrdered (per-
    partition heads only, never a full sort materialization).
    """
    sh = shingled(df, id_col, text_col, n=n)
    return (
        sh.select(F.explode_outer("sh").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("shingle"))
        .limit(k)
    )
