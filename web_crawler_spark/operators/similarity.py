"""Embedding similarity search over an ``array<float>`` column.

Beyond-reference additions for the training-data pipeline (the reference has
no vector operations; its only similarity notion is the phash column of the
pages table — SURVEY §1.1):

- ``cosine_topk``       brute-force exact top-k (the correctness baseline)
- ``lsh_assign`` / ``ann_lsh_topk``
                        random-hyperplane LSH bucketing — the scale path:
                        candidates come from the query's bucket only
- ``neardup_pairs``     near-duplicate pairs (cosine ≥ τ) within LSH buckets
- ``cosine_topk_numpy`` Arrow-batched numpy fast path (mapInPandas)

Determinism contract: embeddings are quantized to int64 at 1e6 scale first,
so every dot product and norm is **exact integer arithmetic**; cosine is a
single double division of exact ints. This makes results bit-identical
across engines (the DuckDB oracle replays the same algorithm) and across
cluster sizes. Hyperplane signs derive from ``md5_long('hp:p:d')`` parity —
no RNG, no driver state.

Scale notes (100 TB):
- brute force is O(|Q|·|C|): fine for |Q| small (re-ranking, eval); the
  bucketed path is O(|C|) build + per-query bucket scan.
- the corpus→bucket assignment is a narrow projection (no shuffle); the
  query-candidate join is an equi-join on bucket id, broadcast when the
  query set is small.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000
DEFAULT_PLANES = 12


def _py_md5_long(s: str) -> int:
    """Driver-side twin of functions.text.md5_long (verified in tests)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def plane_sign(p: int, d: int) -> int:
    """Deterministic ±1 hyperplane component from md5 parity."""
    return 1 if _py_md5_long(f"hp:{p}:{d}") % 2 == 0 else -1


def quantize(vec) -> F.Column:
    """array<float> → array<bigint> at 1e6 scale (exact from here on)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long"))


def dot_q(a, b) -> F.Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_q(a, b) -> F.Column:
    """Cosine from exact integer dot/norms. Zero-norm vectors yield NULL
    (error-as-data; ANSI mode would otherwise raise DIVIDE_BY_ZERO). The
    division chain shape (dot/√na/√nb) is frozen — the DuckDB oracle uses
    the identical shape so the doubles match bit-for-bit."""
    return F.when(
        (dot_q(a, a) > 0) & (dot_q(b, b) > 0),
        dot_q(a, b).cast("double")
        / F.sqrt(dot_q(a, a).cast("double"))
        / F.sqrt(dot_q(b, b).cast("double")),
    )


def cosine_topk(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_queries: int | None = 32,
) -> DataFrame:
    """Brute-force exact cosine top-k: each query row against the corpus.

    Output (query_id, neighbor_id, rank, cosine·4dp); self-matches excluded;
    ties broken by neighbor_id asc so results are a total order.
    """
    qv = quantize(F.col(vec_col))
    # norms are computed ONCE per vector, not once per pair; the division
    # chain dot/||a||/||b|| keeps the exact float shape of cosine_q
    q = corpus.select(
        F.col(id_col).alias("query_id"),
        qv.alias("qv"),
        F.sqrt(dot_q(qv, qv).cast("double")).alias("qn"),
    )
    if n_queries is not None:
        q = q.filter(F.col("query_id") < n_queries)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("cv"),
        F.sqrt(dot_q(qv, qv).cast("double")).alias("cn"),
    )
    from pyspark.sql import Window

    scored = (
        q.crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.when(
                (F.col("qn") > 0) & (F.col("cn") > 0),
                dot_q(F.col("qv"), F.col("cv")).cast("double") / F.col("qn") / F.col("cn"),
            ),
        )
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("cosine", 4).alias("cosine"))
    )


def lsh_assign(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = DEFAULT_PLANES,
    dims: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector.

    bucket = Σ_p (1<<p if Σ_d sign(p,d)·v_d > 0). The ±1 planes are literal
    constants in the plan (md5-parity derived, see ``plane_sign``), so the
    whole assignment is a narrow whole-stage-codegen projection — no
    shuffle, no RNG, reproducible on any cluster size.

    A vector whose length differs from ``dims`` fails LOUDLY: zip_with pads
    the shorter side with NULL, the projection goes NULL, and every plane
    bit silently reads 0 — all vectors land in bucket 0 and the bucketed
    join degrades to an undisclosed all-pairs cross join. NULL vectors pass
    through (their NULL norm drops them in the pair/top-k filters).
    """
    vec = F.col(vec_col)
    checked = F.when(
        vec.isNull() | (F.size(vec) == int(dims)), vec
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"lsh_assign: expected {int(dims)}-dim embedding, got "),
                F.size(vec).cast("string"),
            )
        )
    )
    qv = quantize(checked)
    bucket = None
    for p in range(planes):
        signs = [plane_sign(p, d) for d in range(dims)]
        proj = F.aggregate(
            F.zip_with(
                qv,
                F.array(*[F.lit(s).cast("long") for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return df.select(
        F.col(id_col).alias("vec_id_b"),
        qv.alias("qvec"),
        F.sqrt(dot_q(qv, qv).cast("double")).alias("qnorm"),
        bucket.alias("bucket"),
    )


def ann_lsh_topk(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    planes: int = DEFAULT_PLANES,
    dims: int = 64,
    n_queries: int | None = 32,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Output (query_id, neighbor_id, rank, cosine·4dp). Recall is tunable via
    ``planes`` (fewer planes → bigger buckets → higher recall, more work).
    The DuckDB oracle replays the same bucketing, so the check is exact even
    though the algorithm is approximate.
    """
    from pyspark.sql import Window

    assigned = lsh_assign(
        corpus, id_col=id_col, vec_col=vec_col, planes=planes, dims=dims
    )
    q = assigned.select(
        F.col("vec_id_b").alias("query_id"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    if n_queries is not None:
        q = q.filter(F.col("query_id") < n_queries)
    c = assigned.select(
        F.col("vec_id_b").alias("neighbor_id"),
        F.col("qvec").alias("cv"),
        F.col("qnorm").alias("cn"),
        F.col("bucket").alias("cbucket"),
    )
    scored = (
        q.join(c, F.col("qbucket") == F.col("cbucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.when(
                (F.col("qn") > 0) & (F.col("cn") > 0),
                dot_q(F.col("qv"), F.col("cv")).cast("double") / F.col("qn") / F.col("cn"),
            ),
        )
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("cosine", 4).alias("cosine"))
    )


def neardup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold among same-bucket
    candidates (coarse 8-plane buckets → high recall for near-identical
    vectors). Output (id_a, id_b, cosine·4dp), id_a < id_b."""
    assigned = lsh_assign(
        corpus, id_col=id_col, vec_col=vec_col, planes=planes, dims=dims
    )
    a = assigned.select(
        F.col("vec_id_b").alias("id_a"), F.col("qvec").alias("va"),
        F.col("qnorm").alias("na_"), F.col("bucket").alias("ba"),
    )
    b = assigned.select(
        F.col("vec_id_b").alias("id_b"), F.col("qvec").alias("vb"),
        F.col("qnorm").alias("nb_"), F.col("bucket").alias("bb"),
    )
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
        .withColumn(
            "__cos",
            # threshold on the EXACT cosine; rounding is display-only in the
            # output projection — round-then-compare would admit pairs whose
            # true cosine is just below τ (0.94996 rounds to 0.9500)
            F.when(
                (F.col("na_") > 0) & (F.col("nb_") > 0),
                dot_q(F.col("va"), F.col("vb")).cast("double") / F.col("na_") / F.col("nb_"),
            ),
        )
        .filter(F.col("__cos").isNotNull() & (F.col("__cos") >= threshold))
        .select("id_a", "id_b", F.round(F.col("__cos"), 4).alias("cosine"))
    )


def _quantized_vecs(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id_b, qvec, qnorm): the quantized corpus projection shared by
    k-means training, IVF assignment and probing — one definition so the
    quantization/norm shape can never drift between phases."""
    qv = quantize(F.col(vec_col))
    return corpus.select(
        F.col(id_col).alias("vec_id_b"),
        qv.alias("qvec"),
        F.sqrt(dot_q(qv, qv).cast("double")).alias("qnorm"),
    )


def _centroids_df(spark, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """(cell, quantized-vector) literals → broadcast-ready centroid frame
    with the shared exact-integer norm shape."""
    df = spark.createDataFrame(
        [(int(c), [int(x) for x in v]) for c, v in cents],
        "cell long, cv array<bigint>",
    )
    return df.select(
        "cell", "cv", F.sqrt(dot_q(F.col("cv"), F.col("cv")).cast("double")).alias("cn")
    )


def _assign_to_cells(vecs: DataFrame, cents_df: DataFrame) -> DataFrame:
    """argmax-cosine cell assignment with centroid-id tie-break; broadcast
    centroids, narrow projection — the only corpus-wide work per pass.
    ``vecs`` must carry (vec_id_b, qvec, qnorm)."""
    from pyspark.sql import Window

    scored = vecs.crossJoin(F.broadcast(cents_df)).withColumn(
        "cos_c",
        F.when(
            (F.col("qnorm") > 0) & (F.col("cn") > 0),
            dot_q(F.col("qvec"), F.col("cv")).cast("double")
            / F.col("qnorm")
            / F.col("cn"),
        ),
    )
    w = Window.partitionBy("vec_id_b").orderBy(
        F.col("cos_c").desc_nulls_last(), F.col("cell").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("vec_id_b", "qvec", "qnorm", "cell")
    )


# test/bench instrumentation: how many k-means training passes ran in this
# process — the build/probe split's contract is that repeated queries do NOT
# retrain (VERDICT r2 #1), and tests pin that via this counter
TRAIN_RUNS = 0


def kmeans_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    iters: int = 2,
    dims: int = 64,
) -> list[tuple[int, list[int]]]:
    """Deterministic integer-quantized Lloyd iterations (VERDICT r1 #5).

    Init is seeded (the first ``n_cells`` corpus vectors — no RNG), each
    iteration assigns by argmax-cosine (centroid-id tie-break) and updates
    centroids as the per-dimension FLOOR(AVG(qv[d])) over cell members —
    exact integers in, a correctly-rounded double division, FLOOR back to
    int64, so every engine replays the identical centroids bit-for-bit
    (the DuckDB oracle runs the same iterations in SQL). Empty cells keep
    their previous centroid.

    Scale: each iteration is one broadcast crossJoin (narrow, codegen) +
    one groupBy with 64 avg aggregates (map-side partial, one shuffle);
    only n_cells×dims integers ever reach the driver per iteration.
    """
    global TRAIN_RUNS
    TRAIN_RUNS += 1
    spark = corpus.sparkSession
    vecs = _quantized_vecs(corpus, id_col, vec_col)
    if iters > 0:
        vecs = vecs.persist()
    cents = sorted(
        (int(r["vec_id_b"]), [int(x) for x in r["qvec"]])
        for r in vecs.filter(F.col("vec_id_b") < n_cells)
        .select("vec_id_b", "qvec")
        .collect()
    )
    for _ in range(iters):
        assigned = _assign_to_cells(vecs, _centroids_df(spark, cents))
        rows = assigned.groupBy("cell").agg(
            *[
                F.floor(F.avg(F.element_at(F.col("qvec"), d + 1)))
                .cast("long")
                .alias(f"c{d}")
                for d in range(dims)
            ]
        ).collect()
        updated = {int(r["cell"]): [int(r[f"c{d}"]) for d in range(dims)] for r in rows}
        cents = [(cell, updated.get(cell, old)) for cell, old in cents]
    if iters > 0:
        vecs.unpersist()
    return cents


def neardup_clusters(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Cluster assignment over embedding near-dup pairs: connected
    components with the min-id representative — the embedding twin of
    ``textdedup.dedup_clusters`` (same label-propagation operator, so the
    whole dedup suite emits prunable cluster ids). Output
    (vec_id, cluster_id) for every vector with ≥1 near-duplicate."""
    from .textdedup import connected_components

    pairs = neardup_pairs(
        corpus, id_col=id_col, vec_col=vec_col,
        threshold=threshold, planes=planes, dims=dims,
    )
    return connected_components(
        pairs.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    ).select(F.col("doc_id").alias("vec_id"), "cluster_id")


def ivf_assign(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    kmeans_iters: int = 2,
) -> DataFrame:
    """IVF cell assignment: each vector joins its nearest k-means centroid's
    cell (``kmeans_iters`` deterministic Lloyd rounds over seeded init;
    0 = the plain first-n seeding). The centroid side is tiny → broadcast
    join; assignment is argmax-cosine with centroid-id tie-break, exact
    integer arithmetic. Output (vec_id_b, qvec, qnorm, cell).
    """
    cents = kmeans_centroids(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells, iters=kmeans_iters
    )
    vecs = _quantized_vecs(corpus, id_col, vec_col)
    return _assign_to_cells(vecs, _centroids_df(corpus.sparkSession, cents))


class IvfIndex:
    """Build/probe split for IVF-flat ANN (VERDICT r2 #1).

    Round 2's ``ann_ivf_topk`` retrained k-means on every invocation — a
    per-query O(corpus) training pass. The index factors the pipeline into:

    - **build** (once): train centroids (``kmeans_centroids``) and assign
      the corpus to cells; the assignment frame is persisted in-session so
      repeated probes reuse it without recomputation.
    - **save/load** (across sessions): centroids are tiny (n_cells × dims
      int64) and land in a ``SnapshotTable`` with the build parameters as
      commit metadata; ``load_or_build`` reloads them when the parameters
      match and only trains when they don't. Training is deterministic
      (seeded init, integer-exact Lloyd), so a loaded index is bit-identical
      to a rebuilt one — the correctness oracle is unchanged.
    - **probe** (per query batch): broadcast the centroids, pick each
      query's ``nprobe`` nearest cells, equi-join candidates on cell id.

    Scale: at 100 TB the corpus assignment would itself be written as a
    cell-bucketed table (one more commit in the same lake); here the
    assignment is a narrow broadcast projection recomputed per session,
    which costs one codegen pass and no shuffle.
    """

    def __init__(
        self,
        corpus: DataFrame,
        centroids: list[tuple[int, list[int]]],
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_cells: int = 8,
        kmeans_iters: int = 2,
    ):
        self.corpus = corpus
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_cells = n_cells
        self.kmeans_iters = kmeans_iters
        self._cents_df = _centroids_df(corpus.sparkSession, centroids)
        self._assigned: DataFrame | None = None

    # -- construction ------------------------------------------------------

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_cells: int = 8,
        kmeans_iters: int = 2,
    ) -> "IvfIndex":
        cents = kmeans_centroids(
            corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
            iters=kmeans_iters,
        )
        return cls(
            corpus, cents, id_col=id_col, vec_col=vec_col,
            n_cells=n_cells, kmeans_iters=kmeans_iters,
        )

    def _params(self) -> dict:
        return {"n_cells": self.n_cells, "kmeans_iters": self.kmeans_iters}

    def save(self, table) -> int:
        """Persist centroids to a SnapshotTable (params in commit meta)."""
        spark = self.corpus.sparkSession
        rows = spark.createDataFrame(
            [(int(c), [int(x) for x in v]) for c, v in self.centroids],
            "cell long, cv array<bigint>",
        )
        return table.overwrite(rows, meta={"ivf_params": json.dumps(self._params())})

    @classmethod
    def load(
        cls,
        table,
        corpus: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_cells: int = 8,
        kmeans_iters: int = 2,
    ) -> "IvfIndex | None":
        """Reload a saved index; None when absent or params mismatch."""
        sid = table.current_snapshot_id()
        if sid is None:
            return None
        meta = table._manifest(sid).get("meta") or {}
        want = {"n_cells": n_cells, "kmeans_iters": kmeans_iters}
        if json.loads(meta.get("ivf_params", "{}")) != want:
            return None
        rows = table.read(corpus.sparkSession).collect()
        cents = sorted((int(r["cell"]), [int(x) for x in r["cv"]]) for r in rows)
        return cls(
            corpus, cents, id_col=id_col, vec_col=vec_col,
            n_cells=n_cells, kmeans_iters=kmeans_iters,
        )

    @classmethod
    def load_or_build(cls, table, corpus: DataFrame, **kw) -> "IvfIndex":
        idx = cls.load(table, corpus, **kw)
        if idx is None:
            idx = cls.build(corpus, **kw)
            idx.save(table)
        return idx

    # -- probe -------------------------------------------------------------

    def assigned(self) -> DataFrame:
        """Corpus→cell assignment (vec_id_b, qvec, qnorm, cell), persisted
        in-session so repeated probes share one materialization."""
        if self._assigned is None:
            vecs = _quantized_vecs(self.corpus, self.id_col, self.vec_col)
            self._assigned = _assign_to_cells(vecs, self._cents_df).persist()
        return self._assigned

    def unpersist(self) -> None:
        if self._assigned is not None:
            self._assigned.unpersist()
            self._assigned = None

    def topk(
        self,
        *,
        k: int = 3,
        nprobe: int = 2,
        n_queries: int | None = 32,
    ) -> DataFrame:
        """Probe-only top-k: nprobe nearest cells per query, candidates via
        the cell equi-join — no training, no full-corpus scoring."""
        from pyspark.sql import Window

        cents = self._cents_df
        queries = _quantized_vecs(self.corpus, self.id_col, self.vec_col).select(
            F.col("vec_id_b").alias("query_id"),
            F.col("qvec").alias("qv"),
            F.col("qnorm").alias("qn"),
        )
        if n_queries is not None:
            queries = queries.filter(F.col("query_id") < n_queries)
        probe_w = Window.partitionBy("query_id").orderBy(
            F.col("cos_c").desc_nulls_last(), F.col("cell").asc()
        )
        probed_cells = (
            queries.crossJoin(F.broadcast(cents))
            .withColumn(
                "cos_c",
                F.when(
                    (F.col("qn") > 0) & (F.col("cn") > 0),
                    dot_q(F.col("qv"), F.col("cv")).cast("double") / F.col("qn") / F.col("cn"),
                ),
            )
            .withColumn("__r", F.row_number().over(probe_w))
            .filter(F.col("__r") <= nprobe)
            .select("query_id", "qv", "qn", "cell")
        )
        cand = (
            probed_cells.join(self.assigned(), "cell")
            .filter(F.col("vec_id_b") != F.col("query_id"))
            .withColumn(
                "cosine",
                F.when(
                    (F.col("qn") > 0) & (F.col("qnorm") > 0),
                    dot_q(F.col("qv"), F.col("qvec")).cast("double") / F.col("qn") / F.col("qnorm"),
                ),
            )
            .filter(F.col("cosine").isNotNull())
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("vec_id_b").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                F.col("vec_id_b").alias("neighbor_id"),
                F.col("rank").cast("long").alias("rank"),
                F.round("cosine", 4).alias("cosine"),
            )
        )


def ann_ivf_topk(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 2,
    n_queries: int | None = 32,
    kmeans_iters: int = 2,
    index: "IvfIndex | None" = None,
) -> DataFrame:
    """IVF-flat approximate top-k: each query scans only its ``nprobe``
    nearest cells. The cell equi-join is the only shuffle over the corpus;
    recall/cost trade via nprobe. Pass a prebuilt ``index`` (IvfIndex.build
    / load_or_build) to skip training — without one, centroids are trained
    on the spot (one deterministic pass). Output (query_id, neighbor_id,
    rank, cosine·4dp); DuckDB oracle replays the identical k-means +
    assignment + probe.
    """
    if index is None:
        index = IvfIndex.build(
            corpus, id_col=id_col, vec_col=vec_col,
            n_cells=n_cells, kmeans_iters=kmeans_iters,
        )
    return index.topk(k=k, nprobe=nprobe, n_queries=n_queries)


def cosine_topk_numpy(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_queries: int = 32,
) -> DataFrame:
    """Arrow-batched numpy fast path for brute-force top-k.

    The query block (small) is collected once and closed over; the corpus
    streams through ``mapInPandas`` partition-parallel, each batch doing one
    BLAS matmul; a final per-query window merges partial top-k. Same output
    contract as ``cosine_topk`` (verified equal in tests).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    # NULL embeddings drop here, BEFORE numpy: np.array over a list
    # containing None raises 'inhomogeneous shape' inside the worker, where
    # cosine_topk's column path just filters the NULL cosine — the two
    # paths' documented equal-output contract includes null rows
    qrows = (
        corpus.filter(F.col(id_col) < n_queries)
        .filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("qid"), quantize(F.col(vec_col)).alias("qv"))
        .collect()
    )
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))

    quantized = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.array(list(pdf["cv"]), dtype=np.float64)
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            sims = (qmat @ cmat.T) / qnorm[:, None] / cnorm[None, :]
            nids = pdf["neighbor_id"].to_numpy()
            # per-partition partial top-k keeps the merge tiny. The partial
            # cut must apply the FULL ordering (-cosine, neighbor_id): a bare
            # argpartition keeps an arbitrary subset of candidates tied at
            # the boundary cosine, which can drop the neighbor_id-asc
            # tie-winner and diverge from cosine_topk (ADVICE r1 #2).
            kk = min(k + 1, sims.shape[1])
            idx = np.lexsort(
                (np.broadcast_to(nids, sims.shape), -sims), axis=1
            )[:, :kk]
            out = {
                "query_id": np.repeat(qids, kk),
                "neighbor_id": nids[idx].ravel(),
                "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(out)

    partial = (
        quantized.mapInPandas(score, "query_id long, neighbor_id long, cosine double")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(~F.isnan("cosine") & F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("cosine", 4).alias("cosine"))
    )
