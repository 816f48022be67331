"""Similarity search over embedding columns (array<float>).

Two paths, per the 100-TB design brief:

* **Brute-force cosine top-k** — the exactness baseline.  The query
  vector rides along as a broadcast single-row cross join; the dot
  product is a JVM-side ``zip_with`` + ``aggregate`` fold (no Python,
  no shuffle until the final TakeOrdered top-k).  Linear scan: right
  answer for one-off queries and the verification oracle for the
  bucketed path.
* **Bucketed ANN (IVF-flavored)** — a coarse quantizer (sign bits of
  leading dimensions; pluggable) assigns every vector to a bucket;
  search only scans the query's bucket.  On a cluster the table would
  be written partitioned/bucketed by this key so a probe touches one
  partition — the classic inverted-file layout on parquet.

Determinism: doubles accumulated left-to-right in array order (both
Spark's ``aggregate`` and the oracle's list functions), cosine rounded
to 6 decimals, ties broken by id.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(emb: DataFrame, query: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_vec_col: str = "query_vec") -> DataFrame:
    """Exact top-k by cosine against a (broadcast) single-row query."""
    joined = emb.crossJoin(F.broadcast(query))
    scored = joined.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
         .alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def cosine_radius(emb: DataFrame, query: DataFrame, threshold: float,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  query_vec_col: str = "query_vec") -> DataFrame:
    """Range search: every corpus vector with cosine >= ``threshold``
    against a (broadcast) single-row query — the radius twin of
    :func:`cosine_topk`.  A pure narrow scan (broadcast + projection +
    filter, zero shuffles), so it parallelizes embarrassingly at any
    corpus size; the threshold compares the ROUNDED score so boundary
    ties resolve identically in any engine.  For repeated radius
    queries at scale, the same IVF/sign-bucket prefilters used by the
    top-k path apply (probe cells whose centroid similarity bounds
    admit the radius)."""
    joined = emb.crossJoin(F.broadcast(query))
    scored = joined.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
         .alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def sign_bucket(vec: Column, n_bits: int = 4) -> Column:
    """Coarse quantizer: bitmask of the signs of the leading n_bits
    dimensions (1-based element_at) — a 2^n_bits-cell IVF grid."""
    out = F.lit(0)
    for i in range(n_bits):
        bit = F.when(F.element_at(_as_double(vec), i + 1) >= 0, F.lit(1)) \
            .otherwise(F.lit(0))
        out = out + (bit * F.lit(1 << i))
    return out.cast("bigint")


def auto_sign_bits(emb: DataFrame, vec_col: str = "embedding",
                   target_cell: int = 128) -> int:
    """Corpus-derived sign-grid size: ``round(log2(n / target_cell))``
    clamped to [1, min(16, d)] — the measured scale-safe sizing rule,
    now computable instead of caller-side folklore.  One cheap
    keys-free aggregate (count + min array size — a single job whose
    scan prunes to the vector column).  The rule reproduces both
    measured good points: n≈2.2k → 4 (the sf0.1 steady state) and
    n≈22k → 7 (the sf1.0 re-size that ran 1.89 s vs 10.93 s at the
    stale fixed 4, identical output).  Per-cell population stays
    ≈ ``target_cell`` as the corpus grows, so the per-cell quadratic
    term stays CONSTANT per unit of data — the property a fixed grid
    loses with the square of growth (BENCH_sf1.json: 24.5× wall at a
    10× data step)."""
    import math

    row = emb.select(F.count(F.lit(1)).alias("n"),
                     F.min(F.size(F.col(vec_col))).alias("d")).first()
    n, d = row["n"] or 0, row["d"] or 16
    if n <= target_cell:
        return 1
    return max(1, min(16, d, round(math.log2(n / target_cell))))


def embed_near_dup_pairs(emb: DataFrame, threshold: float,
                         n_bits: int | str = "auto",
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join.

    Sign-random-projection LSH with one band: vectors can only be
    near-duplicates if they share the coarse sign bucket (cosine≈1 ⇒
    same orthant for the leading dims), so the self-join is an
    equi-join on the bucket key — per-bucket quadratic instead of
    corpus quadratic, the same scale shape as text LSH dedup.  At
    100 TB the table is bucketed/partitioned by this key so each
    bucket joins co-located.

    ``n_bits`` defaults to ``"auto"`` — sized from the corpus by
    :func:`auto_sign_bits` (≈ log2(n) − log2(target cell size)), the
    measured scale-safe rule: the per-bucket quadratic means a FIXED
    grid degrades with the square of growth — measured on the sf1.0
    scale sweep (BENCH_sf1.json): 20k vectors at n_bits=4 run 10.9 s,
    at n_bits=7 1.89 s with identical output.  Pass a fixed int when
    the bucket key must be stable across corpora (e.g. the registered
    driver query pins 4 so its closed-form DuckDB oracle stays
    closed-form; a production table whose bucket column is the
    partition key sizes once at ingest).  The trade is recall: more
    sign bits = more near-dup pairs split across buckets (one-band
    sign-LSH misses a pair whose signs differ on any leading dim);
    when that tail matters, band like the text LSH or fall back to
    ``semantic_dedup``'s learned cells.
    """
    if n_bits == "auto":
        n_bits = auto_sign_bits(emb, vec_col)
    b = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__e"),
                   sign_bucket(F.col(vec_col), n_bits).alias("__bkt"))
    a = b.select(F.col(id_col).alias("id_a"), F.col("__e").alias("__ea"),
                 "__bkt")
    c = b.select(F.col(id_col).alias("id_b"), F.col("__e").alias("__eb"),
                 "__bkt")
    return (
        a.join(c, "__bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine(F.col("__ea"), F.col("__eb")), 6)
                 .alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ann_bucketed_topk(emb: DataFrame, query: DataFrame, k: int,
                      n_bits: int = 4,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      query_vec_col: str = "query_vec") -> DataFrame:
    """IVF-style probe: scan only vectors in the query's sign bucket.

    At scale the bucket column is the table's partition/bucket key, so
    this plan prunes to one partition instead of filtering a full scan.
    """
    bucketed = emb.withColumn("bucket", sign_bucket(F.col(vec_col), n_bits))
    q = query.withColumn("bucket", sign_bucket(F.col(query_vec_col), n_bits))
    joined = bucketed.join(F.broadcast(q), "bucket")
    scored = joined.select(
        F.col(id_col),
        F.col("bucket"),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
         .alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def _centroid_lit(c: list[float]) -> Column:
    # Single Literal node (ArrayType), NOT F.array(*[F.lit(x), ...]):
    # the per-element form puts d leaf nodes in the tree per centroid,
    # and k×d literal leaves measurably stall Catalyst's optimizer
    # passes on argmax-shaped expressions (seconds of driver time per
    # plan at k=8, d=64).
    return F.lit([float(x) for x in c])


def _codebook_2d_lit(centroids: list[list[float]]) -> Column:
    """The whole k×d codebook as ONE Literal node (array<array<double>>)."""
    return F.lit([[float(x) for x in c] for c in centroids])


def l2_normalized(vec: Column) -> Column:
    """Unit-normalize a double array (cosine order ≡ dot order after
    this, so spherical k-means can cluster by plain dot product).

    NOTE the cost model: the norm is referenced INSIDE the transform
    lambda, and higher-order lambdas re-evaluate referenced subtrees
    per element — so this costs O(d²) per row (d=64: ~4k interpreted
    ops).  Fine for a one-shot projection; for iterative or
    argmax-heavy consumers use ``with_l2_normalized`` which hoists the
    norm into its own projection step (O(d))."""
    nrm = F.sqrt(dot(vec, vec))
    return F.transform(vec, lambda x: x / nrm)


def with_l2_normalized(df: DataFrame, vec_col: str,
                       out_col: str) -> DataFrame:
    """O(d) normalization as TWO projections: the norm lands in its
    own column first, so the divide-lambda reads a plain attribute
    instead of re-evaluating the dot-product fold per element.

    The ``isNotNull`` guard is LOAD-BEARING, not defensive styling:
    CollapseProject inlines a SINGLE-referenced alias back into the
    lambda body (restoring the O(d²) shape this function exists to
    avoid — verified on the optimized plan), but refuses for
    multiply-referenced non-trivial aliases; the guard is the second
    reference.  Semantics are unchanged: a NULL norm comes only from a
    NULL vector, where the unhoisted form also yields NULL."""
    e = _as_double(F.col(vec_col))
    step = df.withColumn("__l2nrm", F.sqrt(dot(e, e)))
    out = step.withColumn(
        out_col,
        F.when(F.col("__l2nrm").isNotNull(),
               F.transform(e, lambda x: x / F.col("__l2nrm"))))
    return out.drop("__l2nrm")


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Argmax-dot centroid index for a unit vector; ties resolve to the
    lowest index (strict-greater fold keeps the first maximum).

    Single-pass on purpose: the old greatest + CASE-chain form
    referenced each dot ~9 times and ``vec`` ~70 times — higher-order
    functions are interpreted (no codegen) and re-evaluate referenced
    subtrees per use, which turned a k·d argmax into minutes at sf0.1
    (351 s observed for embed_ann_ivf).  Here each dot is computed
    once and folded once; ``vec`` is still EVALUATED k times at
    runtime (once per lambda invocation), so iterative callers should
    pass a plain column attribute — project/persist first.

    The expression TREE is O(1) in k and d: the codebook is one
    nested-array Literal node and ``vec`` appears exactly once (inside
    the transform lambda).  Tree size matters independently of runtime
    — the previous form held k×d literal leaves plus k copies of
    ``vec``'s subtree, and Catalyst optimization alone took seconds
    per plan when ``vec`` was a derived expression.
    """
    if len(centroids) == 1:
        return F.lit(0)
    cb = _codebook_2d_lit(centroids)
    # struct max orders by (d, ni); ties on d pick the LARGEST ni,
    # i.e. the lowest index — same first-maximum tie-break as before.
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(
            dot(vec, F.element_at(cb, i + 1)).alias("d"),
            (-i).alias("ni")))
    return (-F.array_max(pairs)["ni"]).cast("int")


def kmeans_fit(emb: DataFrame, k: int = 8, n_iter: int = 3,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> list[list[float]]:
    """Spherical k-means: the learned coarse quantizer for real IVF.

    Pure DataFrame iterations — assignment is a broadcast-constant
    argmax expression (narrow), the update is posexplode → per
    (cluster, dim) decimal-sum aggregate (map-side combinable; k·d
    rows to the driver, the model state, like any trained model).
    Deterministic: seeds are the k lowest-id vectors, sums are
    decimal-accumulated (order-independent), fixed iteration count —
    rerunning on any partitioning yields bit-identical centroids.

    At 100 TB: each iteration is one corpus scan + a k·d-row shuffle;
    fit on a deterministic sample, assign the full corpus once.

    Driver-barrier cost: each of the ``n_iter`` iterations collects
    k·d aggregate rows to the driver (the centroid update is the model
    state, like any trained model) — that is k·n_iter synchronous
    driver round-trips, fine for IVF-scale k (10²–10⁴) but NOT for
    k ~ 10⁵+; use a sampled fit or a tree-reduce trainer there.
    """
    from pyspark.sql.types import DecimalType
    acc = DecimalType(32, 12)
    # Hoisted-norm projection + persist: the training set is scanned
    # n_iter+1 times with the assignment argmax referencing __v k
    # times — without materialization every reference re-derives the
    # input lineage through interpreted higher-order lambdas (this
    # exact shape measured 350 s at sf0.1 before the rework).
    # Persisting the normalized corpus per fit is what MLlib's KMeans
    # does too; at 100 TB fit on a deterministic sample.
    v = with_l2_normalized(
        emb.select(F.col(id_col).alias("__id"), F.col(vec_col)),
        vec_col, "__v").select("__id", "__v").persist()
    try:
        centroids = [r["__v"] for r in v.orderBy("__id").limit(k).collect()]
        for _ in range(n_iter):
            assigned = v.select(
                nearest_centroid(F.col("__v"), centroids).alias("__c"),
                "__v")
            stats = (
                assigned.select("__c",
                                F.posexplode("__v").alias("__d", "__x"))
                .groupBy("__c", "__d")
                .agg(F.sum(F.col("__x").cast(acc)).alias("__s"),
                     F.count(F.lit(1)).alias("__n"))
                .collect()
            )
            sums: dict[int, dict[int, float]] = {}
            for r in stats:
                sums.setdefault(r["__c"], {})[r["__d"]] = \
                    float(r["__s"]) / r["__n"]
            new = []
            for i, old in enumerate(centroids):
                if i not in sums:
                    new.append(old)  # empty cluster keeps its centroid
                    continue
                mean = [sums[i][d] for d in range(len(old))]
                nrm = sum(x * x for x in mean) ** 0.5
                new.append([x / nrm for x in mean] if nrm > 0 else old)
            centroids = new
    finally:
        v.unpersist()
    return centroids


def kmeans_fit_sampled(emb: DataFrame, k: int = 8, n_iter: int = 3,
                       sample_target: int = 4096,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> list[list[float]]:
    """`kmeans_fit` on a DETERMINISTIC hash sample — the ingest-time
    fit for corpora where the full O(n·k·d) iterations are the
    bottleneck (the sf10.0 curve measured the full fit sub-linear but
    dominant: 76.6 s of the auto-k SemDeDup wall at 100×;
    `BENCH_sf1.json` → `round9_sf10`).

    The sample is ``xxhash64(id) % m == 0`` with ``m = n //
    sample_target`` — a pure function of the ids, so the fit is
    reproducible across runs and partitionings (re-running ingest
    yields bit-identical centroids, unlike ``rand()`` sampling), and
    the filter pushes into the scan (no shuffle; the sample never
    materializes as a separate table).  Cost drops from O(n·k·d·iters)
    to O(sample_target·k·d·iters) + two counts (the corpus count that
    sizes ``m`` and the degenerate-sample guard below — both
    metadata-cheap on parquet); because ``m = n // sample_target``
    floors, the realized sample can overshoot ``sample_target`` by up
    to ~2× (n/m < 2·sample_target), which only tightens the fit.
    Downstream assignment
    still sees the full corpus, so `semantic_dedup` / IVF semantics
    are unchanged — only the quantizer's training set shrinks.
    k-means on a uniform sample converges to the same local structure
    when every cluster is represented (sample_target ≫ k); the
    planted-fixture law in tests/test_semantic_dedup.py pins the
    strongest version of that claim (identical kept set).  Falls back
    to the full fit when the corpus (or the sample) is small enough
    that sampling buys nothing.

    Regime boundary, measured honestly: at bench scales the fit wall
    is K-dominated, not data-dominated — the per-iteration argmax
    carries k·d centroid literals whose analysis/codegen cost is
    row-count-invariant (sf3.0, 66k×16d, k=128: sampled 21.6 s vs
    full 21.1 s, kept set identical; across k the full fit walls
    7.5/12.9/21 s at k=8/64/128 — linear in k, flat in n).  The
    sample pays off once the corpus scan term exceeds that fixed
    k·d overhead — the regime every 100 TB corpus is in, and the one
    this function exists for; it is NOT a bench-scale speedup."""
    n = emb.count()
    m = max(1, n // max(sample_target, k))
    if m <= 1:
        return kmeans_fit(emb, k=k, n_iter=n_iter,
                          id_col=id_col, vec_col=vec_col)
    sample = emb.filter(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0)
    if sample.count() < k:  # degenerate sample: train on everything
        return kmeans_fit(emb, k=k, n_iter=n_iter,
                          id_col=id_col, vec_col=vec_col)
    return kmeans_fit(sample, k=k, n_iter=n_iter,
                      id_col=id_col, vec_col=vec_col)


def ann_ivf_topk(emb: DataFrame, query: DataFrame, k: int,
                 centroids: list[list[float]], nprobe: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_vec_col: str = "query_vec") -> DataFrame:
    """IVF probe with a LEARNED quantizer: assign every vector to its
    nearest centroid (the inverted list key; at scale the table's
    partition/bucket column, written once at ingest), then scan only
    the query's ``nprobe`` closest lists.

    Unlike the sign-bucket grid, the lists follow the data
    distribution, so recall per scanned fraction is what IVF actually
    promises.  Probes arrive as broadcast join keys — partition-
    prunable, never a corpus scan.
    """
    # Assignment is NORM-INVARIANT: with unit centroids,
    # argmax_c dot(v, c) = argmax_c cos(v, c) for ANY |v| — so the
    # corpus vector is never normalized here.  This matters beyond
    # elegance: normalize-then-argmax re-evaluates the normalization
    # inside each centroid dot (higher-order lambdas are interpreted
    # and the optimizer re-inlines hoisted norms into lambda bodies),
    # which measured 351 s at sf0.1; the raw-vector argmax is O(k·d).
    bucketed = emb.withColumn(
        "bucket",
        nearest_centroid(_as_double(F.col(vec_col)), centroids))
    qn = l2_normalized(_as_double(F.col(query_vec_col)))
    cb = _codebook_2d_lit(centroids)
    ranked = F.reverse(F.array_sort(F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(dot(qn, F.element_at(cb, i + 1)).alias("d"),
                           i.alias("i")))))
    q = query.select(
        F.col(query_vec_col),
        F.explode(
            F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])
        ).alias("bucket"))
    joined = bucketed.join(F.broadcast(q), "bucket")
    scored = joined.select(
        F.col(id_col),
        F.col("bucket"),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
         .alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def ann_ivf_topk_batch(emb: DataFrame, queries: DataFrame, k: int,
                       centroids: list[list[float]], nprobe: int = 2,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       q_id_col: str = "query_id",
                       q_vec_col: str = "query_vec") -> DataFrame:
    """Batch ANN serving: top-k neighbors for EVERY query in one
    bucket join — the shape real retrieval runs (embed a batch of
    requests, answer them together), not one job per query.

    Plan: the corpus is bucketed once by nearest centroid (at scale a
    stored partition column written at ingest); each query explodes to
    its ``nprobe`` closest buckets and the (query, bucket) pairs
    BROADCAST onto the corpus — the scan touches only probed buckets
    (partition-prunable), every query's candidates emerge from the one
    join, and a per-query window takes k.  Corpus rows are never
    replicated per query beyond bucket matches; queries are assumed a
    small batch (broadcast side).

    Cost notes, per the interpreted-lambda lessons pinned on
    ``nearest_centroid``: bucket RANKING uses the hoisted-norm
    normalized query (O(d) per query), while the SCORE uses the
    ORIGINAL query vector so the float op sequence matches the exact
    brute-force oracle bit-for-bit."""
    from pyspark.sql import Window

    bucketed = emb.withColumn(
        "bucket",
        nearest_centroid(_as_double(F.col(vec_col)), centroids))
    qn = with_l2_normalized(
        queries.select(F.col(q_id_col), F.col(q_vec_col)),
        q_vec_col, "__qn")
    cb = _codebook_2d_lit(centroids)
    ranked = F.reverse(F.array_sort(F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(
            dot(F.col("__qn"), F.element_at(cb, i + 1)).alias("d"),
            i.alias("i")))))
    q = qn.select(
        F.col(q_id_col), F.col(q_vec_col),
        F.explode(
            F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])
        ).alias("bucket"))
    joined = bucketed.join(F.broadcast(q), "bucket")
    scored = joined.select(
        F.col(q_id_col), F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(q_vec_col)), 6)
         .alias("cos_sim"))
    w = Window.partitionBy(q_id_col) \
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def ann_multiprobe_topk(emb: DataFrame, query: DataFrame, k: int,
                        n_bits: int = 4,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        query_vec_col: str = "query_vec") -> DataFrame:
    """Multi-probe IVF: scan the query's sign bucket plus every bucket
    at Hamming distance 1 (1 + n_bits cells of the 2^n_bits grid).

    Single-probe recall collapses for queries near a sign boundary —
    one flipped bit puts the true neighbor in an adjacent cell.
    Probing the Hamming-1 shell recovers exactly those neighbors (the
    multi-probe LSH idea: perturb the code, not the query) for
    (1+n_bits)/2^n_bits of the scan cost, still partition-prunable at
    scale because probes arrive as join keys.  Each corpus vector
    lives in one bucket, so probes never duplicate candidates.
    """
    bucketed = emb.withColumn("bucket", sign_bucket(F.col(vec_col), n_bits))
    qb = query.withColumn("__qb", sign_bucket(F.col(query_vec_col), n_bits))
    probes = F.array(
        F.col("__qb"),
        *[F.col("__qb").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)])
    q = qb.select(F.col(query_vec_col),
                  F.explode(probes).alias("bucket"))
    joined = bucketed.join(F.broadcast(q), "bucket")
    scored = joined.select(
        F.col(id_col),
        F.col("bucket"),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6)
         .alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


# --------------------------------------------------------------------------
# Product quantization (IVF-PQ's second stage): 8-byte codes for
# billion-scale ANN
# --------------------------------------------------------------------------

def _codebook_lit(codebooks: list[list[list[float]]]) -> Column:
    """Nested literal array CB[sub][code][dim] (1-indexed element_at).

    One Literal node for the whole m×k×d' codebook — the per-element
    F.array(F.lit(...)) form puts m·k·d' leaf nodes in the tree and
    stalls Catalyst on argmin-shaped expressions (see
    ``nearest_centroid``)."""
    return F.lit([[[float(x) for x in c] for c in sub]
                  for sub in codebooks])


def _argmin_code(sv: Column, cents: Column, k: int) -> Column:
    """Argmin-L2 codebook index for one subvector against a k-entry
    centroid array (ties -> lowest code via array_position's first
    match).  THE single assignment rule — pq_train's in-loop
    assignment and _sub_codes' encoding both call it, so train-time
    and encode-time can never diverge on a tie-break or fold order."""
    dists = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda c: F.aggregate(
            F.zip_with(sv, F.element_at(cents, c + 1),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _sub_codes(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """In-row PQ encoding: for each subspace, the argmin-L2 codebook
    index.  Pure JVM expressions over literal codebooks — zero
    shuffle, zero Python."""
    m = len(codebooks)
    kk = len(codebooks[0])
    dm = len(codebooks[0][0])
    cb = _codebook_lit(codebooks)
    v = _as_double(vec)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _argmin_code(F.slice(v, s * dm + 1, dm),
                               F.element_at(cb, s + 1), kk))


def pq_train(emb: DataFrame, m: int = 8, k: int = 16, n_iter: int = 2,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> list[list[list[float]]]:
    """Train PQ codebooks: independent L2 k-means in each of ``m``
    subspaces — but run as ONE DataFrame job per iteration across all
    subspaces (explode to (sub, subvector) rows; assignment is an
    in-row argmin against the literal codebooks; the update is a
    map-combinable (sub, code, dim) decimal-sum aggregate).  m·k·(d/m)
    floats come back to the driver per iteration — the model, like
    kmeans_fit's centroids, with the same k·n_iter driver-barrier
    caveat.

    Deterministic: seeds are the k lowest-id vectors' subvectors,
    decimal accumulation, fixed iterations — bit-identical on any
    partitioning.  At 100 TB: train on a deterministic sample
    (content-hash filter), encode the full corpus with the frozen
    codebooks.
    """
    from pyspark.sql.types import DecimalType
    acc = DecimalType(32, 12)
    first = emb.select(_as_double(F.col(vec_col)).alias("v")).first()
    if first is None or first["v"] is None:
        raise ValueError("pq_train: empty input (or NULL first vector)")
    d = len(first["v"])
    if d % m != 0:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dm = d // m

    seeds = [r["v"] for r in
             emb.select(F.col(id_col).alias("i"),
                        _as_double(F.col(vec_col)).alias("v"))
             .orderBy("i").limit(k).collect()]
    # Fewer corpus vectors than k: clamp so the codebooks, the in-row
    # argmin probe, and the update loop all agree on the entry count —
    # otherwise _argmin_code's element_at(codebook, k) walks past the
    # end and fails the whole job under Spark 4's default ANSI mode.
    k = min(k, len(seeds))
    codebooks = [[list(v[s * dm:(s + 1) * dm]) for v in seeds]
                 for s in range(m)]

    v = emb.select(_as_double(F.col(vec_col)).alias("v"))
    subs = v.select(F.explode(F.array(*[
        F.struct(F.lit(s).alias("sub"),
                 F.slice("v", s * dm + 1, dm).alias("sv"))
        for s in range(m)])).alias("e")).select("e.sub", "e.sv")

    for _ in range(n_iter):
        cb = _codebook_lit(codebooks)
        code = _argmin_code(F.col("sv"),
                            F.element_at(cb, F.col("sub") + 1), k)
        stats = (subs.select("sub", code.alias("code"),
                             F.posexplode("sv").alias("dim", "x"))
                 .groupBy("sub", "code", "dim")
                 .agg(F.sum(F.col("x").cast(acc)).alias("s"),
                      F.count(F.lit(1)).alias("n"))
                 .collect())
        means: dict[tuple[int, int], dict[int, float]] = {}
        for r in stats:
            means.setdefault((r["sub"], r["code"]), {})[r["dim"]] = \
                float(r["s"]) / r["n"]
        for s in range(m):
            for c in range(k):
                got = means.get((s, c))
                if got:
                    codebooks[s][c] = [got[i] for i in range(dm)]
                # empty cluster: keep previous centroid
    return codebooks


def pq_encode(emb: DataFrame, codebooks: list[list[list[float]]],
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode each vector to its m-byte PQ code array — (id, codes).
    In-row JVM expression only: at 100 TB this is the narrow pass
    that shrinks a 256-byte float embedding to m bytes (32x for
    64-dim float32 at m=8), which is what makes exhaustive ANN scans
    of billion-row tables memory-feasible."""
    return emb.select(
        F.col(id_col),
        _sub_codes(F.col(vec_col), codebooks).alias("codes"))


def _check_query_dim(query_vec: list[float],
                     codebooks: list[list[list[float]]],
                     who: str) -> None:
    """A wrong-length query must fail loudly: zip would silently
    truncate, zeroing the later subspaces' contribution and returning
    plausible-but-wrong neighbors."""
    want = len(codebooks) * len(codebooks[0][0])
    if len(query_vec) != want:
        raise ValueError(
            f"{who}: query_vec has {len(query_vec)} dims, codebooks "
            f"expect {want} (m={len(codebooks)} x "
            f"dm={len(codebooks[0][0])})")


def pq_adc_topk(codes: DataFrame, query_vec: list[float],
                codebooks: list[list[list[float]]], k: int,
                id_col: str = "vec_id",
                carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Asymmetric distance computation: the query stays un-quantized;
    per-subspace distances to every codebook centroid are computed
    ONCE on the driver (m·k doubles — the classic ADC lookup table)
    and shipped as a literal, so scanning a vector costs m array
    lookups + adds, no float vector math at all.  Top-k is a
    TakeOrdered (ties by id); at scale, combine with the IVF coarse
    quantizer to prune the scan to nprobe cells first, then refine
    the top candidates against the exact vectors.

    ``carry_cols``: extra ``codes`` columns projected through to the
    result (e.g. the exact vector for a refine stage) — carrying them
    through the ONE scan beats a join back that would re-derive the
    scan."""
    _check_query_dim(query_vec, codebooks, "pq_adc_topk")
    m = len(codebooks)
    dm = len(codebooks[0][0])
    table = [[sum((float(q) - float(c)) ** 2
                  for q, c in zip(query_vec[s * dm:(s + 1) * dm],
                                  codebooks[s][code]))
              for code in range(len(codebooks[0]))]
             for s in range(m)]
    t = F.array(*[F.array(*[F.lit(x) for x in row]) for row in table])
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
        lambda acc, s: acc + F.element_at(
            F.element_at(t, s + 1),
            F.element_at("codes", s + 1) + 1))
    return (codes.select(F.col(id_col), *carry_cols,
                         F.round(dist, 6).alias("adc_dist"))
            .orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(k))


def ann_ivfpq_topk(emb: DataFrame, query_vec: list[float],
                   centroids: list[list[float]],
                   codebooks: list[list[list[float]]],
                   k: int, nprobe: int = 2, refine: int = 0,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """The full two-stage billion-scale ANN: IVF coarse quantizer
    prunes the scan to ``nprobe`` cells, PQ/ADC ranks inside them,
    and (optionally) the top ``refine`` survivors re-rank against the
    exact vectors.  Everything runs on L2-NORMALIZED vectors so L2
    order ≡ cosine order end-to-end (||a−b||² = 2−2·cos for unit
    vectors) — the IVF stage's spherical centroids and the PQ
    codebooks must both have been trained on normalized input.

    At 100 TB: the table is written partitioned by the IVF cell and
    stores only (id, m-byte codes [+ exact vector for refine]); a
    query touches nprobe partitions, scans codes with m lookups/row,
    and reads exact vectors for just the refine set.  Driver work is
    the centroid argsort + the m×k ADC table — microseconds.
    """
    import math

    q = list(map(float, query_vec))
    _check_query_dim(q, codebooks, "ann_ivfpq_topk")
    if centroids and len(q) != len(centroids[0]):
        raise ValueError(
            f"ann_ivfpq_topk: query_vec has {len(q)} dims, centroids "
            f"have {len(centroids[0])}")
    nrm = math.sqrt(sum(x * x for x in q)) or 1.0
    q = [x / nrm for x in q]
    order = sorted(range(len(centroids)),
                   key=lambda i: -sum(a * b for a, b
                                      in zip(q, centroids[i])))
    probes = order[:nprobe]

    nv = l2_normalized(_as_double(F.col(vec_col)))
    pruned = emb.filter(nearest_centroid(nv, centroids).isin(probes))
    codes = pruned.select(F.col(id_col),
                          _sub_codes(nv, codebooks).alias("codes"),
                          nv.alias("__nv"))
    if refine <= 0:
        return pq_adc_topk(codes, q, codebooks, k=k, id_col=id_col) \
            .select(id_col, "adc_dist")
    # Carry the exact vector THROUGH the single pruned-cell scan — a
    # join back to `codes` here would re-derive the scan, cell
    # assignment, and normalization a second time.
    cand = pq_adc_topk(codes, q, codebooks, k=max(k, refine),
                       id_col=id_col, carry_cols=("__nv",))
    qlit = F.array(*[F.lit(x) for x in q])
    exact = cand.select(
        F.col(id_col),
        F.round(2.0 - 2.0 * dot(F.col("__nv"), qlit), 6)
         .alias("l2sq_dist"))
    return exact.orderBy(F.asc("l2sq_dist"), F.asc(id_col)).limit(k)


_SEMDEDUP_PINNED: list[DataFrame] = []
_SEMDEDUP_PINNED_LOCK = threading.Lock()


def _evict_semdedup_pins() -> None:
    """Unpersist assignment tables pinned by PRIOR semantic_dedup /
    semantic_dedup_incremental invocations.  Without this every call
    leaked one (or two, incremental) CacheManager entries for the
    session lifetime — repeated bench warm+timed runs and driver
    rounds accumulate unboundedly.  Contract (the _fresh_work_dir
    one): results must be materialized before the NEXT invocation;
    the eviction happens at public-entry time, never mid-call, so one
    call's two assignment tables coexist.

    The pin list is PROCESS-GLOBAL, so this eviction contract is also
    single-threaded across the whole process, not just per call:
    concurrent semantic_dedup calls from different threads would evict
    each other's live assignment caches mid-computation — results stay
    correct, but a still-unmaterialized prior result silently regresses
    to the documented 351-s per-pair lineage-recompute shape.  The lock
    only keeps the list itself consistent (no lost/double unpersists);
    it cannot restore the perf contract for concurrent callers —
    serialize semantic_dedup* invocations (as bench and the driver
    do)."""
    with _SEMDEDUP_PINNED_LOCK:
        pins, _SEMDEDUP_PINNED[:] = _SEMDEDUP_PINNED[:], []
    for df in pins:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to evict


def _pin_semdedup(df: DataFrame) -> None:
    with _SEMDEDUP_PINNED_LOCK:
        _SEMDEDUP_PINNED.append(df)


def _semdedup_assign(emb: DataFrame, cents: list[list[float]],
                     id_col: str, vec_col: str,
                     n_probe: int = 1) -> DataFrame:
    """(id, __v, cluster, centroid_sim[, probes]) for every vector
    under FIXED centroids — SemDeDup's assignment table, MATERIALIZED
    before any pair join: the pair filter's interpreted dot would
    otherwise re-derive __v's whole lineage (normalization lambda,
    plus whatever derivation the caller's frame carries) once per PAIR
    per element — the measured-351-s shape documented at _ivf_model.
    Persisting pins __v as a stored array column, so each pair dot
    reads two arrays.  At 100 TB this materialization is the
    assignment table you would write to storage at ingest.

    ``n_probe > 1`` additionally emits ``probes`` — the item's
    n_probe nearest cell indices, nearest first (``probes[0]`` ==
    ``cluster``) — the multi-probe assignment the cross-cluster
    mitigation joins on.  Same tie-break as nearest_centroid (dot
    desc, lowest index first), so the two derivations agree."""
    from pyspark.storagelevel import StorageLevel

    cb = _codebook_2d_lit(cents)
    dots = F.transform(cb, lambda c: dot(F.col("__v"), c))
    cols = [F.col(id_col), F.col("__v"),
            nearest_centroid(F.col("__v"), cents).alias("cluster"),
            F.round(F.array_max(dots), 6).alias("centroid_sim")]
    if n_probe > 1:
        pairs = F.transform(
            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
            lambda i: F.struct(
                (-dot(F.col("__v"), F.element_at(cb, i + 1)))
                .alias("nd"),
                i.alias("i")))
        cols.append(F.transform(
            F.slice(F.array_sort(pairs), 1, min(n_probe, len(cents))),
            lambda p: p["i"]).alias("probes"))
    out = (
        with_l2_normalized(
            emb.select(F.col(id_col), F.col(vec_col)), vec_col, "__v")
        .select(*cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _pin_semdedup(out)
    return out


def auto_semdedup_k(emb: DataFrame) -> int:
    """Corpus-derived SemDeDup cluster count: ``max(2, round(√n / 2))``
    — the paper's k ~ c·√n with c calibrated to the measured sf1.0
    mitigation (n≈22k → k≈74; the measured result-identical re-size
    used k=64 and ran 5× faster end-to-end than the fixed k=8 whose
    cluster-local quadratic bent the sf1→sf3 step to exponent 1.91).
    √n keeps the expected cluster size √n·c too, so BOTH the fit cost
    (O(n·k·d)) and the per-cluster pair join grow ~n^1.5 in the worst
    case and ~n when cluster sizes stay balanced — never the fixed-k
    n²/k.  One cheap count()."""
    import math

    n = emb.count()
    return max(2, min(int(round(math.sqrt(max(n, 1)) / 2)), max(n, 2)))


def semantic_dedup(emb: DataFrame, threshold: float = 0.95,
                   k: int | str = "auto", n_iter: int = 3,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   centroids: list[list[float]] | None = None,
                   n_probe: int = 1) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering the embedding space and comparing
    pairs ONLY within a cluster — the scale trick that makes
    embedding dedup tractable where the corpus-quadratic cosine
    matrix is not.  Returns the KEPT rows (id, cluster, centroid
    similarity).

    Policy per the paper: within each k-means cluster, any item whose
    cosine to a HIGHER-PRIORITY cluster-mate reaches ``threshold`` is
    dropped, where priority = (closer to the cluster centroid, then
    lower id) — so every duplicate group keeps exactly its most
    prototypical member, deterministically (centroid similarities are
    rounded to 6 dp before comparison so float noise cannot flip the
    order; ``kmeans_fit`` itself is bit-deterministic).

    Scale shape: the centroid fit is the documented kmeans_fit cost;
    assignment is one narrow broadcast-argmax scan; the only shuffle
    is the per-cluster self-join, quadratic in CLUSTER size, never in
    corpus size.  ``k`` defaults to ``"auto"`` — sized from the
    corpus by :func:`auto_semdedup_k` (the paper's k ~ √n·c), the
    measured scale-safe rule: a FIXED k means cluster sizes grow
    linearly with the corpus and the pair join quadratically
    (measured: exponent 1.91 on the sf1→sf3 step at k=8 vs ≤ 0.80
    banded tiers, BENCH_sf1.json); pass a fixed int when the oracle
    or an ingest-time model pins the cell structure (the registered
    driver query pins k=8 so its closed-form DuckDB oracle stays
    closed-form).  ``k`` is only consulted when ``centroids`` is
    omitted — a provided model fixes the cell count.  At 100 TB
    pre-partition by cluster id so each cell joins co-located.  Cross-cluster near-duplicates are missed BY
    DESIGN at ``n_probe=1`` (the paper's recall trade-off); the
    opt-in mitigation is ``n_probe=2``: each item is additionally
    compared against members of its second-nearest cell (multi-probe
    assignment, the same machinery ann_ivf_topk probes with), which
    catches duplicate pairs straddling a cell boundary.  Scale note:
    the probe factor multiplies the CLUSTER-LOCAL quadratic term only
    (each item joins ≤ n_probe cells' members; the assignment scan,
    fit, and shuffle count are unchanged), so n_probe=2 ≲ doubles the
    pair-join cost and nothing else.  Compose with
    ``embed_near_dup_pairs`` when the full cross-corpus tail matters."""
    _evict_semdedup_pins()  # prior calls' assignment tables
    # ``centroids`` lets callers reuse an ingest-time model (the
    # production pattern — and what the memoized driver query does);
    # omitted, the fit runs here with its documented kmeans_fit cost.
    if centroids is None and k == "auto":
        k = auto_semdedup_k(emb)  # one count(); skipped when a model
        #                           is provided (its size wins anyway)
    cents = centroids if centroids is not None else kmeans_fit(
        emb, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    assigned = _semdedup_assign(emb, cents, id_col, vec_col,
                                n_probe=n_probe)
    if n_probe > 1:
        # Multi-probe pair domain, ASYMMETRIC on purpose: the beater
        # side keeps only its primary cell while the beaten side
        # explodes its n_probe cells — (a, b) compare iff b's probe
        # set contains a's primary.  This catches straddling pairs
        # whose probe sets overlap — the common case as cosine → 1,
        # where the two vectors' centroid rankings nearly coincide —
        # but it is a recall MITIGATION, not a guarantee: at
        # threshold-level similarity (e.g. 0.95) the beaten item's
        # n_probe-set can rank a third cell above the beater's
        # primary and the pair is still missed.
        # Exploding BOTH sides would catch the same pairs at
        # n_probe² the per-cell join volume (measured 3.4× wall at
        # n_probe=2 vs 1.6× asymmetric); this keeps the cost factor
        # ≤ n_probe on the cluster-local term.  Priority is unchanged
        # (sim to OWN primary centroid, then id) — the keeper policy
        # stays the paper's, only the miss set shrinks.  A pair can
        # match at most once (a's single cell vs b's distinct
        # probes), so no multiplicity enters the beaten set.
        a = assigned.select(F.col(id_col).alias("__ida"),
                            F.col("__v").alias("__va"),
                            F.col("centroid_sim").alias("__pa"),
                            F.col("cluster").alias("__cell"))
        b = assigned.select(F.col(id_col).alias("__idb"),
                            F.col("__v").alias("__vb"),
                            F.col("centroid_sim").alias("__pb"),
                            F.explode("probes").alias("__cell"))
        join_key = "__cell"
    else:
        a = assigned.select(F.col(id_col).alias("__ida"),
                            F.col("__v").alias("__va"),
                            F.col("cluster"),
                            F.col("centroid_sim").alias("__pa"))
        b = assigned.select(F.col(id_col).alias("__idb"),
                            F.col("__v").alias("__vb"),
                            F.col("cluster"),
                            F.col("centroid_sim").alias("__pb"))
        join_key = "cluster"
    beaten = (
        a.join(b, join_key)
        .filter(F.col("__ida") != F.col("__idb"))
        # b loses to a when a is strictly higher priority...
        .filter((F.col("__pa") > F.col("__pb"))
                | ((F.col("__pa") == F.col("__pb"))
                   & (F.col("__ida") < F.col("__idb"))))
        # ...and they are semantic duplicates.
        .filter(F.round(dot(F.col("__va"), F.col("__vb")), 6)
                >= threshold)
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    return (assigned.join(beaten, id_col, "left_anti")
            .select(id_col, "cluster", "centroid_sim"))


def semantic_dedup_incremental(warehouse: DataFrame, batch: DataFrame,
                               centroids: list[list[float]],
                               threshold: float = 0.95,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """Arrival-path SemDeDup — the nightly form, mirroring
    ``dedup.incremental`` for MinHash: the deduplicated WAREHOUSE is
    canonical and never re-deduplicated or evicted; a NEW BATCH is
    assigned to the warehouse's FIXED k-means cells (the ingest-time
    model — no refit, the production pattern), and a new vector is
    dropped iff a semantic duplicate (cosine ≥ ``threshold``) exists
    among (a) the warehouse keepers of ITS OWN cell — warehouse
    outranks any arrival — or (b) a higher-priority batch mate in the
    same cell, priority = (centroid proximity, lower id), exactly the
    batch policy.  Returns the kept BATCH rows (id, cluster,
    centroid_sim) — union them into the warehouse to complete the
    load.

    Scale shape: both sides assign with one narrow broadcast-argmax
    scan; the joins are batch×(warehouse ∩ same cell) and
    batch×batch within cells — never warehouse×warehouse, so the
    nightly cost is O(batch · cell-occupancy), not O(corpus²).  At
    100 TB the warehouse assignment table is stored partitioned by
    cluster id, so the batch's cells prune the warehouse scan the way
    band keys prune the LSH warehouse.

    Identity law (tests/test_semantic_dedup.py): with the same fixed
    centroids, keep(incremental(W, B)) == keep(batch-policy over
    W ∪ B with every warehouse row outranking every batch row) — the
    same warehouse-is-canonical semantics as the reference's
    anti-join incremental load."""
    _evict_semdedup_pins()  # prior calls' assignment tables
    wh = _semdedup_assign(warehouse, centroids, id_col, vec_col)
    nb = _semdedup_assign(batch, centroids, id_col, vec_col)

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(F.col(id_col).alias(f"__id{tag}"),
                         F.col("__v").alias(f"__v{tag}"),
                         F.col("cluster"),
                         F.col("centroid_sim").alias(f"__p{tag}"))

    dup = F.round(dot(F.col("__va"), F.col("__vb")), 6) >= threshold
    # (a) beaten by a warehouse keeper in the same cell.
    beaten_wh = (side(wh, "a").join(side(nb, "b"), "cluster")
                 .filter(dup)
                 .select(F.col("__idb").alias(id_col)))
    # (b) beaten by a higher-priority batch mate in the same cell.
    beaten_nb = (side(nb, "a").join(side(nb, "b"), "cluster")
                 .filter(F.col("__ida") != F.col("__idb"))
                 .filter((F.col("__pa") > F.col("__pb"))
                         | ((F.col("__pa") == F.col("__pb"))
                            & (F.col("__ida") < F.col("__idb"))))
                 .filter(dup)
                 .select(F.col("__idb").alias(id_col)))
    beaten = beaten_wh.unionByName(beaten_nb).distinct()
    return (nb.join(beaten, id_col, "left_anti")
            .select(id_col, "cluster", "centroid_sim"))
