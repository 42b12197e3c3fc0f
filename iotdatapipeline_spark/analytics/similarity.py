"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; IVF centroid
bucketing is the scale path (assign once, then search only the probe's
bucket). Dot products run as native ``zip_with``+``aggregate`` in
double precision — no Python, no UDF; at 100 TB the scan + broadcast
of the (small) query/centroid side is the whole cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from iotdatapipeline_spark.operators.skew import fanout_repartition


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double (sequential array order — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sq_l2_distance(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query by (rounded cosine DESC, neighbor id).
    Rounding makes the ranking stable across engines/summation orders.
    Output: qid, nid, rk, cos_sim."""
    # Norms are computed per ROW before the pair join (one interpreted
    # HOF pass each), not per PAIR inside it (which would re-aggregate
    # each side's norm once per partner — 3 array folds per pair
    # instead of 1). Same float result: cosine = dot/(|a|·|b|) either
    # way, and rounding happens after the division as before.
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")).withColumn(
        "__qn", l2_norm(F.col("qvec"))
    )
    # The per-pair HOF dot product is the whole cost; if the corpus
    # scan yields fewer partitions than cores (single-row-group file),
    # fan it out so scoring parallelizes. No-op at cluster scale.
    c = fanout_repartition(corpus).select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")
    ).withColumn("__nn", l2_norm(F.col("nvec")))
    pairs = c.join(F.broadcast(q), F.col("nid") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(
            dot(F.col("qvec"), F.col("nvec")) / (F.col("__qn") * F.col("__nn")), round_digits
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "rk", "cos_sim")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    round_digits: int = 6,
    n_probe: int = 1,
) -> DataFrame:
    """IVF bucketing: assign every vector to its nearest centroid
    (squared L2, rounded; centroid id breaks ties). The centroid set
    broadcasts; output partitioned by centroid_id is the index.
    ``n_probe > 1`` returns the n nearest buckets per vector (the
    union-bucket mitigation for blocked dedup recall — a vector then
    meets candidates in every probed bucket). Output: vec_id,
    centroid_id, dist_sq (one row per probed bucket)."""
    c = centroids.select(F.col(centroid_id_col).alias("__cid"), F.col(vec_col).alias("__cvec"))
    pairs = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(c))
    scored = pairs.select(
        id_col,
        F.col("__cid"),
        F.round(sq_l2_distance(F.col(vec_col), F.col("__cvec")), round_digits).alias("dist_sq"),
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("dist_sq"), F.asc("__cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probe)
        .select(F.col(id_col), F.col("__cid").alias(centroid_id_col), "dist_sq")
    )


def ivf_search(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    round_digits: int = 6,
) -> DataFrame:
    """IVF top-k: assign the corpus to nearest-centroid buckets, probe
    the ``n_probe`` nearest buckets per query, exact cosine top-k over
    only the probed candidates.

    The scale shape: the inverted-file assignment is computed once
    (and at 100 TB would be a materialized, bucket-partitioned index);
    a query then touches ~n_probe/n_centroids of the corpus instead of
    all of it. Centroids and the (small) query set broadcast; the only
    large-side work is one scan + one bucket-equi-join. Output: qid,
    nid, rk, cos_sim — same schema as ``knn_bruteforce`` so recall can
    be measured by direct comparison."""
    index = ivf_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col,
        centroid_id_col=centroid_id_col, round_digits=round_digits,
    ).select(F.col(id_col).alias("nid"), F.col(centroid_id_col))
    bucketed = (
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
        .withColumn("__nn", l2_norm(F.col("nvec")))
        .join(index, "nid")
    )

    c = centroids.select(F.col(centroid_id_col).alias("__cid"), F.col(vec_col).alias("__cvec"))
    qp = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")).crossJoin(
        F.broadcast(c)
    )
    qd = qp.select(
        "qid",
        "qvec",
        F.col("__cid"),
        F.round(sq_l2_distance(F.col("qvec"), F.col("__cvec")), round_digits).alias("__dist"),
    )
    wprobe = Window.partitionBy("qid").orderBy(F.asc("__dist"), F.asc("__cid"))
    probes = (
        qd.withColumn("__pn", F.row_number().over(wprobe))
        .filter(F.col("__pn") <= n_probe)
        .select("qid", "qvec", F.col("__cid").alias(centroid_id_col))
        .withColumn("__qn", l2_norm(F.col("qvec")))
    )

    cand = bucketed.join(F.broadcast(probes), centroid_id_col).filter(F.col("nid") != F.col("qid"))
    scored = cand.select(
        "qid",
        "nid",
        F.round(
            dot(F.col("qvec"), F.col("nvec")) / (F.col("__qn") * F.col("__nn")), round_digits
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "rk", "cos_sim")
    )


def kmeans_assignments(
    corpus: DataFrame,
    *,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Lloyd's k-means as driver-side iteration over DataFrame ops —
    the representative iterative workload (SURVEY.md extension).

    Exact-integer formulation so every engine agrees bit-for-bit:
    components are scaled to ``floor(x*scale)`` longs, distances are
    exact integer squared-L2, and each new centroid component is the
    FLOOR of the mean (integer division) — no floating-point summation
    order anywhere, so the trajectory is fully deterministic and even
    the iteration itself is oracle-checkable. Init: centroids = the k
    lowest ids. Ties in assignment break toward the lower centroid id.

    Scale shape per iteration: one broadcast of k centroids + one
    argmin per vector (W3 top-1), one posexplode + (cluster, dim)
    aggregation for the recompute — all shuffles keyed by high-
    cardinality or tiny keys; the corpus is scanned, never self-joined.
    Output: vec_id, cluster, dist_sq (after ``iters`` assignments).
    """
    ints = corpus.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * scale)).alias("__v"),
    )
    centroids = (
        ints.orderBy(id_col).limit(k).select(F.col(id_col).alias("__cid"), F.col("__v").alias("__c"))
    )
    # relabel centroid ids to 0..k-1 by ascending source id
    w0 = Window.orderBy("__cid")
    centroids = centroids.select((F.row_number().over(w0) - 1).alias("__cid"), "__c")

    def assign(cent: DataFrame) -> DataFrame:
        pairs = ints.crossJoin(F.broadcast(cent))
        d = F.aggregate(
            F.zip_with(F.col("__v"), F.col("__c"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        scored = pairs.select(F.col(id_col), F.col("__cid"), d.alias("dist_sq"))
        w = Window.partitionBy(id_col).orderBy(F.asc("dist_sq"), F.asc("__cid"))
        return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")

    for _ in range(iters - 1):
        a = assign(centroids)
        member = ints.join(a.select(id_col, "__cid"), id_col)
        dims = member.select("__cid", F.posexplode("__v").alias("__pos", "__val"))
        agg = dims.groupBy("__cid", "__pos").agg(
            F.floor(F.sum("__val") / F.count(F.lit(1))).alias("__m")
        )
        centroids = agg.groupBy("__cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("__pos"), F.col("__m")))),
                lambda s: s["__m"],
            ).alias("__c")
        )
    final = assign(centroids)
    return final.select(F.col(id_col), F.col("__cid").alias("cluster"), "dist_sq")


def neardup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    min_cos_x1e6: int = 350_000,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold,
    blocked on ``block_col`` (same block only — at scale use an LSH
    or IVF bucket as the block). Threshold compares the ×1e6-floored
    cosine so the cut is exact-integer. Output: id1, id2, cos_x1e6.

    Unblocked mode is an O(n²) self cross-join — a scale-killer on
    any real corpus — so it requires the explicit
    ``allow_quadratic=True`` opt-in (recall-audit use only); calling
    with neither a block nor the opt-in raises."""
    if block_col is None and not allow_quadratic:
        raise ValueError(
            "neardup_pairs without block_col is an O(n^2) all-pairs cross join; "
            "pass an LSH/IVF bucket as block_col, or opt in explicitly with "
            "allow_quadratic=True (recall-audit use only)"
        )
    left = corpus.select(
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("v1"),
        *([F.col(block_col).alias("blk1")] if block_col else []),
    ).withColumn("__n1", l2_norm(F.col("v1")))
    right = corpus.select(
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("v2"),
        *([F.col(block_col).alias("blk2")] if block_col else []),
    ).withColumn("__n2", l2_norm(F.col("v2")))
    cond = F.col("id1") < F.col("id2")
    if block_col:
        cond = cond & (F.col("blk1") == F.col("blk2"))
    pairs = left.join(right, cond)
    scored = pairs.select(
        "id1",
        "id2",
        F.floor(
            dot(F.col("v1"), F.col("v2")) / (F.col("__n1") * F.col("__n2")) * 1_000_000
        ).cast("long").alias("cos_x1e6"),
    )
    return scored.filter(F.col("cos_x1e6") >= min_cos_x1e6)


def pq_subvectors(
    vectors: DataFrame,
    *,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Slice each vector into ``m`` equal scaled-integer subvectors —
    the shared front end of PQ training (whole corpus), encoding, and
    steady-state query LUT building (a handful of probe rows). Output:
    (id, s, sv: array<long>), m rows per input vector."""
    d_expr = F.array_size(F.col(vec_col))
    ints = vectors.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * scale)).alias("__v"),
        (d_expr / m).cast("int").alias("__dsub"),
    )
    return ints.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        "__v",
        "__dsub",
    ).select(
        F.col(id_col),
        "s",
        F.slice(F.col("__v"), F.col("s") * F.col("__dsub") + 1, F.col("__dsub")).alias("sv"),
    )


def pq_codebooks(
    corpus: DataFrame,
    *,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization training: split each vector into ``m``
    equal subvectors and run the exact-integer Lloyd's of
    ``kmeans_assignments`` INDEPENDENTLY per subspace (the subspace id
    joins every grouping key, so all m trainings ride the same
    shuffles — no per-subspace jobs). Init per subspace: the ``ksub``
    lowest-id vectors' subvectors, relabeled 0..ksub-1.

    Returns ``(subvectors, codebooks)``:
    subvectors = (id, s, sv: array<long>) — the scaled inputs;
    codebooks = (s, cid, c: array<long>) — ``m·ksub`` centroids after
    ``iters`` assignment rounds. Both deterministic bit-for-bit, so the
    whole training trajectory is oracle-checkable like the k-means
    gate."""
    sub = pq_subvectors(corpus, m=m, id_col=id_col, vec_col=vec_col, scale=scale)
    w0 = Window.partitionBy("s").orderBy(id_col)
    cents = (
        sub.withColumn("__rn", F.row_number().over(w0))
        .filter(F.col("__rn") <= ksub)
        .select("s", (F.col("__rn") - 1).alias("cid"), F.col("sv").alias("c"))
    )

    def assign(cent: DataFrame) -> DataFrame:
        pairs = sub.join(F.broadcast(cent), "s")
        d = F.aggregate(
            F.zip_with(F.col("sv"), F.col("c"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        scored = pairs.select(F.col(id_col), "s", "cid", d.alias("dist_sq"))
        w = Window.partitionBy(id_col, "s").orderBy(F.asc("dist_sq"), F.asc("cid"))
        return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")

    for _ in range(iters - 1):
        a = assign(cents)
        member = sub.join(a.select(id_col, "s", "cid"), [id_col, "s"])
        dims = member.select("s", "cid", F.posexplode("sv").alias("pos", "val"))
        agg = dims.groupBy("s", "cid", "pos").agg(
            F.floor(F.sum("val") / F.count(F.lit(1))).alias("mval")
        )
        cents = agg.groupBy("s", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mval"))), lambda st: st["mval"]
            ).alias("c")
        )
    return sub, cents


def _sub_sq_dist(a: str, b: str):
    """Exact integer squared-L2 between two array<long> columns."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_encode(sub: DataFrame, cents: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Encode every vector as its nearest codebook centroid per
    subspace. Input: ``pq_codebooks`` outputs. Output: (nid, s, code)
    — the m-code compressed representation of the corpus."""
    pairs = sub.join(F.broadcast(cents), "s")
    scored = pairs.select(F.col(id_col), "s", "cid", _sub_sq_dist("sv", "c").alias("dist_sq"))
    wenc = Window.partitionBy(id_col, "s").orderBy(F.asc("dist_sq"), F.asc("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(wenc))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col).alias("nid"), "s", F.col("cid").alias("code"))
    )


def pq_query_lut(
    sub: DataFrame, cents: DataFrame, queries: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Per-query ADC lookup table: exact integer distance from each
    query subvector to every codebook centroid. Output:
    (qid, s, cid, dpart) — m·ksub rows per query, the broadcastable
    table ADC scoring sums over."""
    qsub = sub.join(queries.select(F.col(id_col)), id_col).select(
        F.col(id_col).alias("qid"), "s", F.col("sv").alias("qsv")
    )
    return qsub.join(F.broadcast(cents), "s").select(
        "qid", "s", "cid", _sub_sq_dist("qsv", "c").alias("dpart")
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """PQ search with asymmetric distance computation (ADC): neighbors
    are represented only by their m-byte code (nearest codebook
    centroid per subspace); a query's estimated distance to a neighbor
    is Σ_s d(query_subvector_s, codebook[s, code_s]) — m small exact
    lookups instead of a d-dimensional scan.

    Scale story: the corpus's PQ codes are m·log2(ksub) bits per
    vector (here 4 codes ≈ 2 B vs 256 B of floats) — the index that
    keeps a billion-vector search RAM-resident. The per-query lookup
    table (m·ksub exact integer distances) broadcasts; the candidate
    scoring join touches codes only. Output: qid, nid, rk, dist_est —
    fully integer-deterministic, so the gate hash-checks training,
    encoding, and search end-to-end."""
    sub, cents = pq_codebooks(
        corpus, m=m, ksub=ksub, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    codes = pq_encode(sub, cents, id_col)
    return pq_adc_search(
        codes, cents, queries, k=k, m=m, id_col=id_col, vec_col=vec_col, scale=scale
    )


def pq_pack_codebooks(cents: DataFrame) -> DataFrame:
    """Collapse the (s, cid, c) codebook rows into ONE row holding a
    flat array of centroid subvectors indexed by ``s·ksub + cid`` —
    the broadcastable form the packed ADC search folds against (the
    1-row broadcast-fold shape of docs_dsir_weights). m·ksub·d_sub
    longs total (here 4·8·16 = 512), constant in corpus size."""
    e = F.struct("s", "cid", "c").alias("e")
    return cents.select(e).groupBy().agg(
        F.transform(F.array_sort(F.collect_list("e")), lambda x: x["c"]).alias("cbs")
    )


def pq_pack_codes(codes: DataFrame, id_col: str = "nid") -> DataFrame:
    """Collapse the long-format (nid, s, code) encoding into one
    ``array<int>`` per vector ordered by subspace — the compressed
    corpus row the packed ADC search scans (m codes ≈ m bytes per
    vector, the RAM-resident billion-scale layout)."""
    return codes.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("s", "code"))), lambda x: x["code"].cast("int")
        ).alias("codes")
    )


def pq_adc_search_packed(
    codes_arr: DataFrame,
    cbs: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    m: int = 4,
    ksub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """ADC search over the PACKED materialized index — the minimal
    steady-state plan. Inputs: ``codes_arr`` (nid, codes: array<int>)
    from :func:`pq_pack_codes`; ``cbs`` — the 1-row packed codebook
    from :func:`pq_pack_codebooks`; ``queries`` — raw vectors.

    Shape: the 1-row codebook broadcast-folds against the probe rows
    (each query computes its full m·ksub LUT in ONE projection — no
    explode, no join, no shuffle); the per-query LUT rows broadcast
    against the code scan, where the estimated distance is an exact
    integer fold ``Σ_s lut[s·ksub + code_s]`` computed ROW-LOCALLY —
    the (qid, nid) aggregation of the long-format path disappears
    entirely. The only exchange left is the per-query top-k, over
    already-scored 3-column candidate rows (on a cluster, IVF
    pre-pruning — embeddings_ivfpq_topk — bounds that candidate set).
    Both folds are labeled broadcast folds: 1 codebook row, |queries|
    LUT rows.

    ``candidates`` (qid, nid) restricts scoring to an IVF-pruned pair
    set instead of the exhaustive code scan — the materialized IVFPQ
    composition (``embeddings_ivfpq_index_topk``): each candidate row
    joins its code row once, its query's LUT broadcasts, and the
    scored set IS the candidate set."""
    d_expr = F.array_size(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * scale)).alias("__qv"),
        (d_expr / m).cast("int").alias("__dsub"),
    )
    # 1-row broadcast codebook fold: per query, one projection builds
    # the whole LUT (exact integer sq-L2 of each centroid subvector
    # against the query's matching slice)
    lut_entry = lambda cvec, idx: F.aggregate(  # noqa: E731
        F.zip_with(
            cvec,
            F.slice(
                F.col("__qv"),
                F.floor(idx / F.lit(ksub)).cast("int") * F.col("__dsub") + 1,
                F.col("__dsub"),
            ),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    lut = q.crossJoin(F.broadcast(cbs)).select(
        "qid", F.transform(F.col("cbs"), lut_entry).alias("__lut")
    )
    # per-query LUT broadcast fold against the code scan: distance is
    # a row-local integer fold over the m stored codes
    dist = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, s: F.element_at(F.col("__lut"), (s * F.lit(ksub) + c + 1).cast("int")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    if candidates is not None:
        scored = (
            candidates.join(codes_arr, "nid")
            .join(F.broadcast(lut), "qid")
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid", dist.alias("dist_est"))
        )
    else:
        scored = (
            codes_arr.crossJoin(F.broadcast(lut))
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid", dist.alias("dist_est"))
        )
    w = Window.partitionBy("qid").orderBy(F.asc("dist_est"), F.asc("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "rk", F.col("dist_est").cast("long").alias("dist_est"))
    )


def pq_adc_search(
    codes: DataFrame,
    cents: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Steady-state ADC search over an ALREADY-TRAINED PQ index —
    the path a production user runs per query, with training and
    encoding amortized into an ingest (see the
    ``embeddings_pq_index_topk`` gate, which persists ``codes`` and
    ``cents`` in a VersionedTable). Inputs: ``codes`` (nid, s, code) —
    the compressed corpus; ``cents`` (s, cid, c) — the m·ksub
    codebooks; ``queries`` — raw vectors. The per-query work is: slice
    the probe vectors (m rows each), one broadcast join to the
    codebooks for the exact-integer LUT (m·ksub rows per query), one
    broadcast LUT join against the codes scan, one hash aggregate, one
    per-query top-k — no shuffle wider than the scored candidates,
    nothing recomputed from the corpus."""
    qsub = pq_subvectors(queries, m=m, id_col=id_col, vec_col=vec_col, scale=scale).select(
        F.col(id_col).alias("qid"), "s", F.col("sv").alias("qsv")
    )
    lut = qsub.join(F.broadcast(cents), "s").select(
        "qid", "s", "cid", _sub_sq_dist("qsv", "c").alias("dpart")
    )
    est = (
        codes.alias("cd")
        .join(
            F.broadcast(lut).alias("lt"),
            (F.col("cd.s") == F.col("lt.s")) & (F.col("cd.code") == F.col("lt.cid")),
        )
        .groupBy("qid", "nid")
        .agg(F.sum("dpart").alias("dist_est"))
        .filter(F.col("qid") != F.col("nid"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist_est"), F.asc("nid"))
    return (
        est.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "rk", F.col("dist_est").cast("long").alias("dist_est"))
    )


def bq_words(vec_col: str) -> Column:
    """The sign-bit packing EXPRESSION behind :func:`binary_quantize`,
    exposed so callers that must keep extra columns (the maintained
    index's change-feed tags) can pack row-locally without a
    re-attaching join."""
    return F.expr(
        f"transform(sequence(0, CAST(ceil(size({vec_col}) / 32.0) AS INT) - 1, 1), j -> "
        f"aggregate(transform(sequence(0, 31, 1), b -> "
        f"IF(j * 32 + b < size({vec_col}) AND {vec_col}[j * 32 + b] >= 0, "
        f"shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc | x))"
    )


def binary_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Sign-bit binary quantization: d float dims -> ceil(d/32) packed
    32-bit words in an ``array<bigint>`` (d/8 bytes per vector — the
    32× compression modern vector stores ship as their cheapest tier).
    32 bits per word, not 64, so every shift stays below the sign bit
    and the packed values are identical non-negative integers on any
    engine — the determinism that lets the DuckDB oracle replay the
    quantization bit-for-bit. Output: (id, bq array<bigint>)."""
    return df.select(F.col(id_col), bq_words(vec_col).alias("bq"))


def hamming_topk(
    corpus_bq: DataFrame, queries_bq: DataFrame, *, k: int
) -> DataFrame:
    """Top-k by Hamming distance over packed sign bits: the whole
    scoring pass is ``bit_count(xor)`` folds over tiny long arrays —
    integer, branch-free, and ~d/64 machine words per pair instead of
    d floats (why binary rescoring is the fastest first stage a
    billion-vector search runs). Ties break on neighbor id. Output:
    qid, nid, rk, hamming."""
    q = queries_bq.select(F.col("vec_id").alias("qid"), F.col("bq").alias("qbq"))
    n = corpus_bq.select(F.col("vec_id").alias("nid"), F.col("bq").alias("nbq"))
    pairs = fanout_repartition(n).join(F.broadcast(q), F.col("nid") != F.col("qid"))
    dist = F.expr(
        "aggregate(zip_with(qbq, nbq, (a, b) -> bit_count(a ^ b)), 0, (acc, x) -> acc + x)"
    )
    scored = pairs.select("qid", "nid", dist.cast("long").alias("hamming"))
    w = Window.partitionBy("qid").orderBy(F.asc("hamming"), F.asc("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "rk", "hamming")
    )
