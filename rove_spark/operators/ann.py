"""Similarity search over embedding columns (array<float>).

Engine extras for training-data pipelines:
- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  set against the vector table; dot products are JVM-side
  ``zip_with``/``aggregate`` expressions; per-query rank via window.
  The correctness baseline, and the right plan whenever |queries| is small
  (the table side streams once, no shuffle of vectors).
- ``ivf_topk``: IVF-style scale path — deterministic coarse centroids,
  vectors assigned to their nearest centroid once (inverted lists), a
  query probes only the ``n_probe`` closest lists. Turns the scan side
  from |table| into |table|·n_probe/n_centroids.

Recall note: IVF is approximate — tests measure recall vs brute force and
assert ≥0.8 at n_probe=4 of 8 lists on the testdata embeddings; probing
all lists reproduces brute force exactly (asserted, and the driver query
runs full-probe against the exact-KNN DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_queries: int | None = 1024,
) -> DataFrame:
    """Exact cosine top-k for each query. Queries are broadcast — the big
    vector table never shuffles; ranking shuffles only (query, id, score)
    triples.

    The pre-rank row count is |vectors|·|queries|, which is the RIGHT
    plan only for small query batches — ``max_queries`` makes that
    contract explicit (eagerly counted; the count is one tiny job against
    what is by assumption a small frame). Larger batches should go to
    ``ivf_topk``, whose probed lists keep the scored row count
    sub-linear in |vectors|·|queries|. Raise the bound deliberately if a
    wide brute-force sweep is really intended, or pass
    ``max_queries=None`` to skip the guard (and its eager count job)
    entirely."""
    if max_queries is not None and queries.limit(max_queries + 1).count() > max_queries:
        raise ValueError(
            f"brute_force_topk got more than max_queries={max_queries} queries; "
            f"the crossJoin would score |vectors|x|queries| rows — route large "
            f"batches to ivf_topk, or raise max_queries explicitly"
        )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(query_vec_col).alias("_qv"),
            _norm(F.col(query_vec_col)).alias("_qn"),
        )
    )
    v = vectors.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_vv"),
        _norm(F.col(vec_col)).alias("_vn"),
    )
    scored = v.crossJoin(q).select(
        F.col("_qid").alias(query_id_col),
        F.col("_vid").alias(id_col),
        (_dot(F.col("_vv"), F.col("_qv")) / (F.col("_vn") * F.col("_qn"))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def build_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    lloyd_iters: int = 5,
    seed: int = 17,
) -> DataFrame:
    """Deterministic spherical k-means quantizer, trained on a bounded
    hash-ordered sample.

    Round-1 version averaged hash-RANDOM buckets once — every centroid
    landed near the global mean and list assignment was arbitrary. Now:
    k-means++ D²-seeding + ``lloyd_iters`` Lloyd rounds (cosine metric,
    centroids renormalized each round; empty clusters reseeded from the
    worst-served point), all on a driver-side numpy sample.

    Scale shape: the sample is a TakeOrdered over xxhash64(id) — a
    bounded, deterministic ~sample_size·dim·8-byte pull regardless of
    table size (the standard way IVF quantizers are trained: on a sample,
    not the corpus). Everything downstream (assignment, probing) stays
    distributed. Determinism: seeded RNG + hash-ordered sample with id
    tiebreak — identical centroids across runs and cluster sizes."""
    import numpy as np

    rows = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_h", F.xxhash64(F.col("_id").cast("string"), F.lit(seed)))
        .orderBy("_h", "_id")
        .limit(sample_size)
        .collect()
    )
    X = np.asarray([list(r._v) for r in rows], dtype=np.float64)
    if len(X) < n_centroids:
        raise ValueError(f"need ≥ {n_centroids} vectors to build {n_centroids} centroids")
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    rng = np.random.default_rng(seed)
    # k-means++ seeding on the unit sphere (D² = 1 - cosine)
    first = int(rng.integers(len(Xn)))
    C = [Xn[first]]
    d2 = 1.0 - Xn @ C[0]
    for _ in range(1, n_centroids):
        p = np.maximum(d2, 0.0)
        tot = float(p.sum())
        nxt = int(np.argmax(p)) if tot <= 0 else int(rng.choice(len(Xn), p=p / tot))
        C.append(Xn[nxt])
        d2 = np.minimum(d2, 1.0 - Xn @ C[-1])
    C = np.stack(C)

    for _ in range(max(0, lloyd_iters)):
        sims = Xn @ C.T
        assign = sims.argmax(axis=1)
        newC = np.zeros_like(C)
        for c in range(n_centroids):
            members = Xn[assign == c]
            if len(members) == 0:
                # reseed from the globally worst-served point
                worst = int(np.argmin(sims.max(axis=1)))
                newC[c] = Xn[worst]
            else:
                m = members.mean(axis=0)
                newC[c] = m / max(float(np.linalg.norm(m)), 1e-12)
        if np.allclose(newC, C):
            C = newC
            break
        C = newC

    spark = vectors.sparkSession
    data = [(i, [float(x) for x in C[i]]) for i in range(n_centroids)]
    return spark.createDataFrame(data, "centroid_id int, centroid array<double>")


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_sim: bool = False,
) -> DataFrame:
    """Inverted lists: each vector joins its max-cosine centroid.
    Centroids are tiny → broadcast; one narrow pass over the table.
    ``keep_sim`` retains the winning cosine as ``assign_sim`` — the
    quantization-quality signal the drift metric aggregates."""
    c = F.broadcast(centroids)
    scored = vectors.crossJoin(c).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine(F.col(vec_col), F.col("centroid")).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("centroid_id"))
    out = scored.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") == 1).drop("_r")
    if keep_sim:
        return out.withColumnRenamed("_sim", "assign_sim")
    return out.drop("_sim")


def persist_ivf_index(
    vectors: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    lloyd_iters: int = 5,
    seed: int = 17,
) -> None:
    """Materialize the IVF index on disk: inverted lists PARTITIONED BY
    centroid_id + a tiny centroid table. Probing a persisted index reads
    ONLY the probed lists' partitions — the probe→list join is a
    broadcast on centroid_id, so dynamic partition pruning turns
    n_probe/n_centroids into a physical scan reduction, not just a row
    filter. This is the realistic shape at 100 TB: the quantizer trains
    once, assignment is one pass, and every query batch afterwards is a
    pruned scan + per-list exact scoring."""
    centroids = build_ivf_centroids(
        vectors, n_centroids, id_col, vec_col, sample_size, lloyd_iters, seed
    )
    assigned = assign_to_centroids(vectors, centroids, id_col, vec_col, keep_sim=True)
    # consumed twice (parquet write + stats agg): materialize the
    # crossJoin + window assignment once (the CLAUDE.md N-references
    # lesson), instead of re-scoring the whole corpus for a count/sum
    assigned = assigned.withColumn("batch", F.lit("base")).localCheckpoint(eager=False)
    # lists are partitioned (batch, centroid_id): centroid pruning still
    # applies, and every batch owns disjoint partitions so appends can be
    # replayed idempotently via dynamic partition overwrite
    assigned.write.mode("overwrite").partitionBy("batch", "centroid_id").parquet(
        f"{path}/lists"
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n"), F.sum("assign_sim").alias("s")
    ).first()
    _write_index_stats(
        path,
        {
            "n_vectors": int(stats["n"]),
            "sum_assign_sim": float(stats["s"]),
            "appends": [],
        },
    )


def _stats_path(path: str) -> str:
    return f"{path}/_ivf_stats.json"


def _write_index_stats(path: str, doc: dict) -> None:
    import json
    from pathlib import Path

    p = Path(_stats_path(path))
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(doc, indent=1))
    tmp.replace(p)


def _read_index_stats(path: str) -> dict:
    import json
    from pathlib import Path

    return json.loads(Path(_stats_path(path)).read_text())


def append_to_ivf_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    drift_threshold: float = 0.05,
    batch_id: str | None = None,
) -> dict:
    """Incremental IVF maintenance (round-5 verdict item 7): a
    daily-append pipeline can't retrain k-means per batch, so new
    vectors are assigned to the NEAREST PERSISTED centroid and appended
    to the inverted lists — one broadcast-join pass, partitioned append,
    no reshuffle of the existing index.

    Crash/retry safety (same idempotence class as tier writes): each
    batch lands in its own ``batch=<id>`` partition level via DYNAMIC
    partition overwrite, so a replay rewrites the same partitions
    instead of duplicating rows (duplicated vec_ids would occupy two
    top-k slots and break the full-probe-exact contract). ``batch_id``
    defaults to a content digest of the batch (one narrow
    count+sum(xxhash64(id, vec)) pass), so an accidental re-append of
    the same batch is a no-op even without an explicit id; a daily
    pipeline should pass its natural id (e.g. the day). A batch already
    recorded in the sidecar returns its recorded result without
    touching data.

    Quality guard: the quantizer gradually mismatches a drifting corpus,
    so each append records its mean assignment cosine and compares it
    against the index's lifetime mean. ``drift = (mean_life −
    mean_batch) / mean_life`` (clamped at 0); ``needs_retrain`` fires
    when it exceeds ``drift_threshold``. Approximate (n_probe <
    n_centroids) recall degrades exactly when assignment similarity
    degrades — full probe stays exact regardless (tested: appended
    index ≡ fresh index ≡ brute force at full probe), so a missed
    retrain costs recall at partial probe, never correctness at full.

    Returns {batch_id, n_appended, mean_sim_batch, mean_sim_life,
    drift, needs_retrain}. Stats ride a JSON sidecar next to the lists
    (the Iceberg-properties analog, same pattern as the table
    manifests)."""
    if batch_id == "base":
        raise ValueError(
            "batch_id 'base' is reserved for the initial persist_ivf_index "
            "write — an append under it would dynamic-overwrite (and "
            "silently truncate) the base index partitions"
        )
    if batch_id is None:
        # order-free xor fold — summing hashes overflows under ANSI mode
        fp = new_vectors.select(
            F.xxhash64(F.col(id_col), F.col(vec_col)).alias("_h")
        ).agg(
            F.count(F.lit(1)).alias("n"), F.expr("bit_xor(_h)").alias("h")
        ).first()
        batch_id = f"auto-{fp['n']}-{(fp['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
    stats = _read_index_stats(path)
    for prior in stats["appends"]:
        if prior.get("batch_id") == batch_id:
            return prior  # already fully applied (data + sidecar)
    assigned = assign_to_centroids(
        new_vectors,
        spark.read.parquet(f"{path}/centroids"),
        id_col,
        vec_col,
        keep_sim=True,
    )
    # consumed twice (write + stats agg) — materialize once
    assigned = assigned.withColumn("batch", F.lit(batch_id)).localCheckpoint(eager=False)
    (
        assigned.write.mode("overwrite")
        .partitionBy("batch", "centroid_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(f"{path}/lists")
    )
    agg = assigned.agg(
        F.count(F.lit(1)).alias("n"), F.sum("assign_sim").alias("s")
    ).first()
    n_new, s_new = int(agg["n"]), float(agg["s"] or 0.0)
    mean_life = stats["sum_assign_sim"] / max(stats["n_vectors"], 1)
    mean_batch = s_new / max(n_new, 1)
    if n_new == 0:
        # an empty batch carries no drift evidence — without this guard
        # mean_batch=0 reads as drift=1.0 and a spurious retrain signal
        drift = 0.0
    else:
        drift = max(0.0, (mean_life - mean_batch) / max(abs(mean_life), 1e-12))
    result = {
        "batch_id": batch_id,
        "n_appended": n_new,
        "mean_sim_batch": round(mean_batch, 6),
        "mean_sim_life": round(mean_life, 6),
        "drift": round(drift, 6),
        "needs_retrain": drift > drift_threshold,
    }
    stats["n_vectors"] += n_new
    stats["sum_assign_sim"] += s_new
    stats["appends"].append(result)
    _write_index_stats(path, stats)
    return result


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(centroids, assigned) from a persisted index — pass both to
    ``ivf_topk`` to skip the build."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/lists"),
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF search: probe the n_probe nearest inverted lists per query,
    exact cosine within the probed lists. Pass precomputed
    ``centroids``/``assigned`` to amortize index build across query
    batches (the realistic usage at scale)."""
    if centroids is None:
        centroids = build_ivf_centroids(vectors, n_centroids, id_col, vec_col)
    if assigned is None:
        assigned = assign_to_centroids(vectors, centroids, id_col, vec_col)

    q = queries.select(F.col(query_id_col).alias("_qid"), F.col(query_vec_col).alias("_qv"))
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "_qid", "_qv", "centroid_id", cosine(F.col("_qv"), F.col("centroid")).alias("_sim")
    )
    wq = Window.partitionBy("_qid").orderBy(F.desc("_sim"), F.asc("centroid_id"))
    probes = qc.withColumn("_r", F.row_number().over(wq)).filter(F.col("_r") <= n_probe)

    cand = probes.select("_qid", "_qv", "centroid_id").join(
        assigned, on="centroid_id"
    )
    scored = cand.select(
        F.col("_qid").alias(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("_qv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
