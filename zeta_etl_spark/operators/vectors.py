"""Vector similarity operators over `array<float>` embedding columns:
brute-force cosine top-k, per-label centroids, nearest-centroid (IVF-style)
assignment.

Beyond-reference scale operators (BASELINE.json north star).

Determinism design: floats are scaled to exact BIGINTs via
``floor(x*1e6 + 0.5)`` (floor has no rounding-mode ambiguity, unlike
round/decimal casts, so Spark and DuckDB produce bit-identical integers);
dot products and norms are then exact integer arithmetic, and the final
double division/sqrt are IEEE-deterministic.

Scale design (100 TB): brute-force top-k is a broadcast of the (small) query
set against a partitioned scan of the corpus — no shuffle until the final
per-query top-k (AQE-coalesced).  The IVF path prunes with a broadcast
centroid table; signatures/norms are computed once per row inside whole-stage
codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from zeta_etl_spark.operators.scalar_frame import (
    scalar_frame_crossjoin,
    with_scalar_frame,
)

# Caller contract for every broadcast-queries operator below: the query
# set is a BOUNDED frame (the registry uses vec_id < 10); callers with
# larger query sets must batch them.  The bound pins the scalar-frame
# cross-join invariant at the site (operators/scalar_frame.py).
QUERY_SET_BOUND = 1024

SCALE = 1_000_000

_SCALED = (
    f"transform(embedding, x -> cast(floor(cast(x as double) * {SCALE}.0 + 0.5) "
    "as bigint))"
)


def scaled_vectors(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Project embeddings to exact integer vectors + squared norms."""
    return df.select(
        F.col(id_col),
        *[c for c in df.columns if c not in (id_col, "embedding")],
        F.expr(_SCALED).alias("sv"),
    ).withColumn(
        "norm2", F.expr("aggregate(zip_with(sv, sv, (x, y) -> x * y), 0L, (a, v) -> a + v)")
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast queries × corpus scan.

    ``vectors``/``queries`` must be outputs of :func:`scaled_vectors` (queries
    with columns renamed to ``query_id``/``qv``/``qn``).
    """
    dot = F.expr("aggregate(zip_with(qv, sv, (x, y) -> x * y), 0L, (a, v) -> a + v)")
    cos = dot.cast("double") / F.nullif(
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("norm2").cast("double")),
        F.lit(0.0),
    )
    pairs = (
        scalar_frame_crossjoin(vectors, queries, bound=QUERY_SET_BOUND)
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("knn_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("knn_rank") <= k)
    )


def hyperplane_params(n_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """Seeded integer hyperplanes in [-1000, 1000] — identical constants in
    the DuckDB oracle, exact BIGINT dot products."""
    import random

    rng = random.Random(seed)
    return [
        [rng.randrange(-1000, 1001) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(sv_col: str, planes: list[list[int]]) -> F.Column:
    """Random-hyperplane LSH bucket id: bit b = sign(<v, plane_b>).

    Components are exact integers (scaled vector × integer plane), so the
    bucket assignment is bit-identical across engines.  |v_i| ≤ 1e6 and
    |p_i| ≤ 1e3 → per-term ≤ 1e9, 64-dim sum ≤ 6.4e10 — no overflow.

    Expression shape: ONE 2-D literal array of planes folded with nested
    HOFs, not n_planes inlined dot-product trees — same values, but the
    generated codegen class is ~n_planes× smaller, which cuts the
    first-invocation Janino compile from ~1.3 s to ~0.3 s (the r5 bench
    'regression' on ann_lsh_top5 was exactly this one-time compile
    landing on the alphabetically-first vector query).
    """
    planes_lit = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{w}L" for w in plane) + ")"
            for plane in planes
        )
        + ")"
    )
    # bit b of the bucket = sign(<v, plane_b>) · 2^b; shift-accumulate via
    # a struct fold (acc.i tracks the bit position, acc.s the bucket sum)
    return F.expr(
        f"aggregate({planes_lit}, "
        "named_struct('s', 0L, 'i', 0), "
        f"(acc, p) -> named_struct("
        f"'s', acc.s + (case when aggregate(zip_with({sv_col}, p, "
        "(x, y) -> x * y), 0L, (a, v) -> a + v) > 0 "
        "then shiftleft(1L, acc.i) else 0L end), "
        "'i', acc.i + 1), "
        "acc -> acc.s)"
    )


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    planes: list[list[int]],
    k: int = 5,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: cosine ranking restricted to same-LSH-bucket
    candidates.  The bucket equi-join replaces the brute-force cross join —
    at 100 TB the corpus shuffles once on bucket id and each query probes one
    bucket, turning O(|Q|·|N|) similarity work into O(|Q|·bucket_size)."""
    v = vectors.withColumn("_bucket", lsh_bucket("sv", planes))
    q = queries.withColumn("_qbucket", lsh_bucket("qv", planes))
    dot = F.expr("aggregate(zip_with(qv, sv, (x, y) -> x * y), 0L, (a, v) -> a + v)")
    cos = dot.cast("double") / F.nullif(
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("norm2").cast("double")),
        F.lit(0.0),
    )
    pairs = (
        F.broadcast(q)
        .join(v, F.col("_qbucket") == F.col("_bucket"))
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("knn_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("knn_rank") <= k)
    )


def label_centroids(scaled: DataFrame, label_col: str = "label") -> DataFrame:
    """Per-(label, dim) centroid via exact integer sums."""
    exploded = scaled.select(
        F.col(label_col), F.posexplode("sv").alias("pos", "v")
    )
    return exploded.groupBy(
        F.col(label_col), (F.col("pos") + 1).cast("bigint").alias("dim")
    ).agg(
        (F.sum("v").cast("double") / (F.lit(float(SCALE)) * F.count(F.lit(1)))).alias(
            "centroid"
        ),
        F.count(F.lit(1)).alias("n_vectors"),
    )


def centroid_arrays(
    centroids: DataFrame, label_col: str = "label", out_id: str = "cent_id"
) -> DataFrame:
    """Pivot per-(label, dim) centroids into one integer-array row per
    centroid (``cv_arr``), the broadcast-friendly shape for assignment."""
    cint = centroids.select(
        F.col(label_col).alias(out_id),
        "dim",
        F.floor(F.col("centroid") * SCALE + F.lit(0.5)).cast("bigint").alias("cv"),
    )
    return (
        cint.groupBy(out_id)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("_s"))
        .select(out_id, F.expr("transform(_s, s -> s.cv)").alias("cv_arr"))
    )


def _packed_centroids(carr: DataFrame) -> DataFrame:
    """Collapse all centroid arrays into ONE row (array<struct<cent_id,
    cv_arr>>) so assignment is a broadcast cross join against a single row —
    distance computation and argmin stay entirely inside whole-stage codegen
    with zero shuffle on the vector side."""
    return carr.agg(
        F.array_sort(F.collect_list(F.struct("cent_id", "cv_arr"))).alias("cents")
    )


_DISTS_SORTED = (
    "array_sort(transform(cents, c -> struct("
    "aggregate(zip_with({sv}, c.cv_arr, (x, y) -> (x - y) * (x - y)), 0L, "
    "(a, v) -> a + v) AS dist2, c.cent_id AS cent_id)))"
)


def assign_lists(
    vectors: DataFrame, packed: DataFrame, id_col: str, id_out: str,
    rank_limit: int,
) -> DataFrame:
    """(id, cent_id) list assignments: each vector's ``rank_limit`` nearest
    centroids by exact integer L2².  Zero-shuffle: one broadcast packed-
    centroid row, per-row ``zip_with`` distances, ``array_sort`` + slice."""
    dists = F.expr(_DISTS_SORTED.format(sv="sv"))
    return (
        vectors.transform(with_scalar_frame(packed))
        .select(
            F.col(id_col).alias(id_out),
            F.explode(F.slice(dists, 1, rank_limit)).alias("_d"),
        )
        .select(id_out, F.col("_d.cent_id").alias("cent_id"))
    )


def with_assigned_lists(
    vectors: DataFrame, packed: DataFrame, rank_limit: int
) -> DataFrame:
    """Every column of ``vectors`` plus ``cent_id`` — one output row per
    assigned list (the vector's ``rank_limit`` nearest centroids).

    Optimization r14 (guide §2.4): the IVF paths used to compute
    :func:`assign_lists` from ``scaled`` and JOIN it back to ``scaled`` on
    the id — a corpus-sized equi-join (two exchanges + sort/hash of the
    whole vector table) whose right side was a pure per-row projection of
    its own left side.  Computing the assignment inline keeps the corpus
    un-shuffled: same broadcast packed-centroid row, same explode, exactly
    the row multiset of ``vectors ⋈ assign_lists(vectors, ...)``."""
    dists = F.expr(_DISTS_SORTED.format(sv="sv"))
    cols = vectors.columns
    return (
        vectors.transform(with_scalar_frame(packed))
        .select(*cols, F.explode(F.slice(dists, 1, rank_limit)).alias("_d"))
        .select(*cols, F.col("_d.cent_id").alias("cent_id"))
    )


def ivf_topk(
    scaled: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    label_col: str = "label",
) -> DataFrame:
    """IVF search: corpus vectors are partitioned into centroid lists (the
    coarse quantizer), each query probes its ``nprobe`` nearest centroids and
    ranks only those lists by exact cosine.

    Scale design (100 TB): the centroid table is packed into a single
    broadcast row of arrays; each corpus/query row computes distances to all
    centroids with ``zip_with``+``aggregate`` and picks its lists with one
    ``array_sort`` — no per-dim explode (the old shape multiplied rows by
    dims × centroids before its groupBy; see VERDICT r1 §wrong-1), no shuffle
    at all in the assignment step.  The only shuffle left is the corpus
    repartition by assigned list for the probe join.  All arithmetic is exact
    integers → deterministic across engines.
    """
    packed = _packed_centroids(centroid_arrays(centroids, label_col))
    # assignment fused into the scan (with_assigned_lists): no join-back of
    # the corpus to its own per-row projection
    corpus = with_assigned_lists(scaled, packed, 1)
    q = with_assigned_lists(
        queries.withColumnRenamed("qv", "sv"), packed, nprobe
    ).withColumnRenamed("sv", "qv")
    dot = F.expr("aggregate(zip_with(qv, sv, (x, y) -> x * y), 0L, (a, v) -> a + v)")
    cos = dot.cast("double") / F.nullif(
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("norm2").cast("double")),
        F.lit(0.0),
    )
    pairs = (
        F.broadcast(q)
        .join(corpus, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
        )
        .distinct()  # a pair may appear once per probed list
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("knn_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("knn_rank") <= k)
    )


def nearest_centroid(
    scaled: DataFrame, centroids: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Assign each vector to its nearest centroid by exact integer L2²
    (centroids re-scaled to ints with the same floor trick).

    Same zero-shuffle shape as :func:`ivf_topk`'s assignment: one broadcast
    row of centroid arrays, per-row ``zip_with`` distances, argmin via
    ``element_at(array_sort(...), 1)`` — the vector side is never exploded
    or shuffled."""
    packed = _packed_centroids(centroid_arrays(centroids, label_col))
    # try_element_at: an empty centroid table must yield zero assignments
    # (the old join shape's behavior), not an array-index error
    best = F.expr("try_element_at(" + _DISTS_SORTED.format(sv="sv") + ", 1)")
    return (
        scaled.transform(with_scalar_frame(packed))
        .select(
            "vec_id",
            F.col(label_col).alias("true_label"),
            best.alias("_b"),
        )
        .filter(F.col("_b").isNotNull())
        .select(
            "vec_id",
            "true_label",
            F.col("_b.cent_id").alias("assigned_label"),
            F.col("_b.dist2").cast("bigint").alias("dist2"),
            F.when(F.col("true_label") == F.col("_b.cent_id"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_correct"),
        )
    )


def int8_quantize(scaled: DataFrame) -> DataFrame:
    """Per-dimension symmetric int8 scalar quantization of scaled vectors.

    The compression half of large-scale ANN (SQ8): each dimension d gets a
    scale ``s_d = max |v_d| / 127`` over the corpus, values quantize to
    ``round(v / s_d) ∈ [-127, 127]``.  Memory drops 8× (int64→int8 per
    component conceptually; arrays stay bigint-typed but bounded ±127, so a
    real columnar sink stores them as TINYINT), and distance arithmetic
    stays exact integers → cross-engine deterministic.

    Executor plan: one per-dim max aggregation over posexploded vectors
    (map-side combined, k·dims groups) packed back into ONE broadcast row of
    scales; quantization itself is a zip_with — zero shuffle on the corpus.
    """
    ex = scaled.select(F.posexplode("sv").alias("pos", "v"))
    dim_scales = (
        ex.groupBy((F.col("pos") + 1).cast("bigint").alias("dim"))
        .agg(F.max(F.abs(F.col("v"))).alias("vmax"))
        .select("dim", F.greatest(F.col("vmax"), F.lit(1)).alias("vmax"))
    )
    packed = (
        dim_scales.groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("dim", "vmax"))).alias("_s"))
        .select(F.expr("transform(_s, s -> s.vmax)").alias("vmaxes"))
    )
    # q_d = floor(v * 127 / vmax_d + 0.5) with floor-based symmetric rounding
    # (floor(x+0.5) matches the engine-wide no-ambiguity rounding rule);
    # integer-exact because v*127 stays well under 2^63
    quant = (
        "zip_with(sv, vmaxes, (v, m) -> cast(floor((v * 127.0) / m + 0.5) "
        "as bigint))"
    )
    return scaled.transform(with_scalar_frame(packed)).select(
        *[c for c in scaled.columns if c != "norm2"],
        F.expr(quant).alias("qv"),
    )


def sq8_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors (SQ8 rerank-free
    form): same broadcast-queries shape as :func:`cosine_topk`, but dots and
    norms run over the ±127-bounded arrays — the arithmetic an int8 SIMD
    kernel would do, expressed in codegen.

    ``vectors`` carry ``qv`` from :func:`int8_quantize`; ``queries`` carry
    ``qqv`` (same quantization, renamed).
    """
    dot = F.expr("aggregate(zip_with(qqv, qv, (x, y) -> x * y), 0L, (a, v) -> a + v)")
    qn = F.expr("aggregate(zip_with(qqv, qqv, (x, y) -> x * y), 0L, (a, v) -> a + v)")
    vn = F.expr("aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (a, v) -> a + v)")
    cos = dot.cast("double") / F.nullif(
        F.sqrt(qn.cast("double")) * F.sqrt(vn.cast("double")), F.lit(0.0)
    )
    pairs = (
        scalar_frame_crossjoin(vectors, queries, bound=QUERY_SET_BOUND)
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            cos.alias("cosine_q"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_q").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("knn_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("knn_rank") <= k)
    )


def _adc_dot_sql(m: int, sub: int) -> str:
    """ADC scoring expression shared by the PQ paths: per-subspace dot of the
    full-precision query slice against the codebook reconstruction of the
    candidate's code."""
    return (
        f"aggregate(sequence(0, {m - 1}), 0L, (acc, s) -> acc + "
        f"aggregate(zip_with(slice(qv, s * {sub} + 1, {sub}), "
        f"element_at(filter(cb, c -> c.s = s AND "
        f"c.code = element_at(codes, s + 1)), 1).cv, "
        f"(x, y) -> x * y), 0L, (a, v) -> a + v))"
    )


def exact_rerank_topk(cand: DataFrame, scaled: DataFrame, k: int) -> DataFrame:
    """Shared exact-rerank tail of every quantized ANN path (SQ8, PQ,
    IVF×SQ8, IVF×PQ): join full-precision vectors for the (query_id,
    neighbor_id) candidate rows ONLY, exact integer cosine, cut to top-k
    with the engine-wide (cosine DESC, neighbor_id) tie-break."""
    nq = scaled.select(
        F.col("vec_id").alias("query_id"),
        F.col("sv").alias("qv_x"),
        F.col("norm2").alias("qn_x"),
    )
    nn = scaled.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("sv").alias("nv_x"),
        F.col("norm2").alias("nn_x"),
    )
    dot = F.expr(
        "aggregate(zip_with(qv_x, nv_x, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    cos = dot.cast("double") / F.nullif(
        F.sqrt(F.col("qn_x").cast("double"))
        * F.sqrt(F.col("nn_x").cast("double")),
        F.lit(0.0),
    )
    rer = (
        cand.join(F.broadcast(nq), "query_id")
        .join(nn, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("knn_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("knn_rank") <= k)
    )


def ivf_sq8_rerank_topk(
    scaled: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    wide: int = 20,
    label_col: str = "label",
) -> DataFrame:
    """The composed production ANN stack (VERDICT r2 next-2): IVF nprobe
    PRUNING × SQ8 quantized SCORING × exact RERANK, one plan.

    Stage 1 — prune: corpus vectors are assigned to their nearest centroid
    list, queries probe their ``nprobe`` nearest lists (broadcast packed
    centroids, zero shuffle — :func:`assign_lists`).
    Stage 2 — score: within probed lists only, candidates are ranked by
    cosine over int8-quantized vectors (8× compressed scan) and cut to a
    WIDE set of ``wide`` per query.
    Stage 3 — rerank: full-precision vectors are joined for the |Q|·wide
    candidate rows ONLY and cut to the final top ``k``.

    At 100 TB this is the deployment shape: the exact-vector store is
    touched for candidate rows alone, the quantized scan covers just the
    probed lists (~nprobe/|lists| of the corpus), and every stage's
    arithmetic is exact integers → deterministic across engines.

    ``queries`` must be a (query_id, qv, qn) projection of ``scaled`` rows
    (the identity row is excluded from results).
    """
    packed = _packed_centroids(centroid_arrays(centroids, label_col))

    # quantization AND list assignment fused into one corpus pass
    # (with_assigned_lists — int8_quantize keeps `sv`, so the assignment
    # rides the same projection; no corpus join-back)
    q8 = int8_quantize(scaled)
    q8c = with_assigned_lists(q8, packed, 1).select(
        "vec_id", "qv", "cent_id"
    )
    qq = with_assigned_lists(
        q8.join(
            queries.select("query_id"),
            q8["vec_id"] == F.col("query_id"),
        ).select("query_id", F.col("qv").alias("qqv"), "sv"),
        packed,
        nprobe,
    ).drop("sv")

    dot_q = F.expr(
        "aggregate(zip_with(qqv, qv, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    qn_q = F.expr(
        "aggregate(zip_with(qqv, qqv, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    vn_q = F.expr(
        "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (a, v) -> a + v)"
    )
    cos_q = dot_q.cast("double") / F.nullif(
        F.sqrt(qn_q.cast("double")) * F.sqrt(vn_q.cast("double")), F.lit(0.0)
    )
    # corpus_lists is top-1 per corpus vector, so each (query, neighbor)
    # pair appears in at most one probed list — no dedup needed
    scored = (
        F.broadcast(qq)
        .join(q8c, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            cos_q.alias("cosine_q"),
        )
    )
    w_wide = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("_rn", F.row_number().over(w_wide))
        .filter(F.col("_rn") <= wide)
        .select("query_id", "neighbor_id")
    )

    return exact_rerank_topk(cand, scaled, k)


# --- Product quantization (PQ) ----------------------------------------------

PQ_M = 4  # subspaces
PQ_K = 16  # codes per subspace


def pq_codebook(
    scaled: DataFrame, dim: int = 64, m: int = PQ_M, k: int = PQ_K
) -> DataFrame:
    """One-row broadcast PQ codebook: ``cb`` = array<struct<s, code, cv>>.

    Codebook entries are the ``k`` lowest-``vec_id`` corpus vectors'
    subvectors per subspace — deterministic seeding (Lloyd refinement is a
    separate, already-verified operator: ``kmeans_lloyd_assign``); at
    deployment scale the codebook is trained offline on a sample and shipped
    as a literal, exactly this broadcast shape."""
    sub = dim // m
    w = Window.orderBy("vec_id")
    coded = (
        scaled.orderBy("vec_id")
        .limit(k)
        .select("vec_id", "sv")
        .withColumn("code", (F.row_number().over(w) - 1).cast("bigint"))
    )
    entries = coded.select(
        "code",
        F.explode(
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> "
                f"struct(cast(s as bigint) as s, "
                f"slice(sv, s * {sub} + 1, {sub}) as cv))"
            )
        ).alias("e"),
    ).select(F.col("e.s").alias("s"), "code", F.col("e.cv").alias("cv"))
    return entries.agg(
        F.array_sort(F.collect_list(F.struct("s", "code", "cv"))).alias("cb")
    )


def pq_encode(
    scaled: DataFrame,
    codebook: DataFrame,
    dim: int = 64,
    m: int = PQ_M,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector as ``m`` codebook indices + the reconstruction's
    squared norm: ``(vec_id, codes array<bigint>, recon2 bigint)``.

    64 floats compress to 4 nibbles (+ one bigint norm) — the 100 TB memory
    story.  Zero shuffle: one broadcast codebook row; per-subspace argmin is
    ``array_sort`` over k=16 exact integer L2² distances inside whole-stage
    codegen, tie-broken on code id (same order both engines)."""
    sub = dim // m
    best = (
        f"transform(sequence(0, {m - 1}), s -> element_at(array_sort("
        f"transform(filter(cb, c -> c.s = s), c -> struct("
        f"aggregate(zip_with(slice(sv, s * {sub} + 1, {sub}), c.cv, "
        f"(x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v) AS d, "
        f"c.code AS code, "
        f"aggregate(zip_with(c.cv, c.cv, (x, y) -> x * y), 0L, "
        f"(a, v) -> a + v) AS n2))), 1))"
    )
    return (
        scaled.transform(with_scalar_frame(codebook))
        .withColumn("_best", F.expr(best))
        .select(
            "vec_id",
            *keep,
            F.expr("transform(_best, b -> b.code)").alias("codes"),
            F.expr("aggregate(_best, 0L, (a, b) -> a + b.n2)").alias(
                "recon2"
            ),
        )
    )


def pq_adc_rerank_topk(
    scaled: DataFrame,
    queries: DataFrame,
    k: int = 5,
    wide: int = 20,
    dim: int = 64,
    m: int = PQ_M,
) -> DataFrame:
    """PQ search with asymmetric distance computation + exact rerank.

    Stage 1 — ADC scan: the corpus is scanned as PQ codes (m bigint codes +
    one norm per row, 256× narrower than float32 vectors); each query keeps
    full precision and scores a candidate via per-subspace dot products
    against the RECONSTRUCTION (codebook lookup) — exact integer arithmetic.
    Stage 2 — exact rerank of the ``wide`` best per query, cut to top ``k``
    (same candidate-only full-precision access as the SQ8/IVF rerank paths).

    ``queries`` must be (query_id, qv, qn) projections of ``scaled`` rows.
    """
    sub = dim // m
    cbp = pq_codebook(scaled, dim=dim, m=m)
    enc = pq_encode(scaled, cbp, dim=dim, m=m)
    adc_dot = _adc_dot_sql(m, sub)
    cos_q = F.expr(adc_dot).cast("double") / F.nullif(
        F.sqrt(F.col("qn").cast("double"))
        * F.sqrt(F.col("recon2").cast("double")),
        F.lit(0.0),
    )
    scored = (
        enc.transform(with_scalar_frame(queries, bound=QUERY_SET_BOUND))
        .transform(with_scalar_frame(cbp))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos_q.alias("cosine_q"),
        )
    )
    w_wide = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("_rn", F.row_number().over(w_wide))
        .filter(F.col("_rn") <= wide)
        .select("query_id", "neighbor_id")
    )
    return exact_rerank_topk(cand, scaled, k)


def ivf_pq_rerank_topk(
    scaled: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    wide: int = 20,
    dim: int = 64,
    m: int = PQ_M,
    label_col: str = "label",
) -> DataFrame:
    """IVF nprobe PRUNING × PQ-ADC SCORING × exact RERANK — the corpus-scale
    composition promised by :func:`pq_adc_rerank_topk` (whose flat ADC scan
    is linear in the corpus): the quantized-code scan covers only the probed
    lists (~nprobe/|lists| of the corpus), codes are 4 nibbles + 1 norm per
    row, and full-precision vectors are touched for |Q|×wide candidates
    only.  Identical staging to :func:`ivf_sq8_rerank_topk` with PQ codes in
    place of SQ8 vectors.

    ``queries`` must be (query_id, qv, qn) projections of ``scaled`` rows.
    """
    sub = dim // m
    packed = _packed_centroids(centroid_arrays(centroids, label_col))
    cbp = pq_codebook(scaled, dim=dim, m=m)
    # PQ encoding AND list assignment fused into one corpus pass: the
    # assignment column rides through pq_encode (keep=) instead of being
    # joined back on vec_id (a corpus-sized self-join)
    enc = pq_encode(
        with_assigned_lists(scaled, packed, 1),
        cbp, dim=dim, m=m, keep=("cent_id",),
    )
    qq = with_assigned_lists(
        queries.withColumnRenamed("qv", "sv"), packed, nprobe
    ).withColumnRenamed("sv", "qv")
    adc_dot = _adc_dot_sql(m, sub)
    cos_q = F.expr(adc_dot).cast("double") / F.nullif(
        F.sqrt(F.col("qn").cast("double"))
        * F.sqrt(F.col("recon2").cast("double")),
        F.lit(0.0),
    )
    # corpus_lists is top-1 per corpus vector -> each (query, neighbor) pair
    # appears in at most one probed list, no dedup needed
    scored = (
        F.broadcast(qq)
        .join(enc, "cent_id")
        .transform(with_scalar_frame(cbp))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos_q.alias("cosine_q"),
        )
    )
    w_wide = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("_rn", F.row_number().over(w_wide))
        .filter(F.col("_rn") <= wide)
        .select("query_id", "neighbor_id")
    )
    return exact_rerank_topk(cand, scaled, k)


def adaptive_plane_count(
    n_vectors: int, target_bucket: int = 32, min_planes: int = 6,
    max_planes: int = 24,
) -> int:
    """Plane count for random-hyperplane LSH that holds expected bucket
    density constant as the corpus grows: ``2^planes ≈ n / target_bucket``,
    i.e. one extra plane per corpus doubling.

    This is the PERF.md round-5 scale rule as code: with a FIXED plane
    count, candidate verification grows as n²/2^planes (measured 103× at a
    10× corpus); deriving planes from the corpus count keeps the candidate
    volume ~linear (measured: +4 planes at 10× → ~8× candidates).  Clamped
    to [min_planes, max_planes]; higher counts trade recall, which a
    deployment buys back with b banded tables (same pattern as the MinHash
    band join)."""
    import math

    if n_vectors <= 0:
        return min_planes
    raw = math.ceil(math.log2(max(n_vectors / target_bucket, 1.0)))
    return max(min_planes, min(max_planes, raw))


def duck_hyperplane_bucket_sql(planes: list[list[int]]) -> str:
    """DuckDB SQL expression computing the same bucket id as
    :func:`lsh_bucket` over a ``sv`` BIGINT-array column — the ONE oracle
    twin of the hyperplane bucketing, shared by every LSH-bucketed query's
    oracle (a drifted copy would silently break that query's oracle
    equality)."""
    terms = []
    for b, plane in enumerate(planes):
        lit = "[" + ",".join(str(w) for w in plane) + "]"
        # list_dot_product is DuckDB's vectorized C++ kernel — measured
        # ~500x faster than the per-element lambda form at sf10 (112 s ->
        # 0.2 s per pass over 200k x 64), which had every LSH oracle's
        # bucket pass dominating its wall (DuckDB also re-evaluates a CTE
        # per scalar-subquery reference even under AS MATERIALIZED, so the
        # per-pass cost multiplies).  It returns DOUBLE, but the dot of
        # BIGINT-scaled vectors stays far below 2^53, so the value — and
        # therefore the sign bit — is exactly representable; A/B-verified
        # bit-identical to the integer lambda form on every scale dir.
        dot = f"list_dot_product(sv, {lit})"
        terms.append(
            f"(CASE WHEN ({dot}) > 0 THEN CAST({1 << b} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)
