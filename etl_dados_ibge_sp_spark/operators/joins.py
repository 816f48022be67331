"""Join operators (SURVEY §2.3 J1-J3).

Scale notes (the part that matters at 100 TB):

* J1 enrichment joins a small dimension — always a broadcast hash
  join: no shuffle of the fact table, no skew sensitivity.  We mark the
  dim with ``F.broadcast`` explicitly instead of relying on the
  threshold.
* J2 anti-join dedup shuffles both sides on the composite key.  At
  scale the warehouse side should be reduced to DISTINCT keys *before*
  the exchange (done here), and the fact table should be bucketed or
  pre-partitioned on the dedup key so repeated incremental loads reuse
  the layout.  AQE converts to broadcast when the key snapshot is
  small (the common case: keys-only is tiny relative to facts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .repair import normalize_string_key


def enrich_left_join(fact: DataFrame, dim: DataFrame,
                     fact_key: str, dim_key: str,
                     dim_value: str, out_col: str,
                     normalize: bool = True,
                     default=None) -> DataFrame:
    """J1 — broadcast left equi-join against a small dimension with
    normalized string keys (reference pipeline.py:96-106).

    Takes ``dim_value`` from the dim, writes it as ``out_col`` on the
    fact; optionally fills misses with ``default`` (P6 fallback)."""
    jk = "__join_key"
    fk = F.col(fact_key)
    dk = F.col(dim_key)
    if normalize:
        fk = normalize_string_key(fk)
        dk = normalize_string_key(dk)
    dim_small = dim.select(dk.alias(jk), F.col(dim_value).alias(out_col))
    # Dedup the dim on the key: a left enrichment join must not fan out.
    # min() (not first()) so duplicate dim keys resolve deterministically
    # regardless of partitioning — same tie-break as the SQL oracle.
    dim_small = dim_small.groupBy(jk).agg(F.min(out_col).alias(out_col))
    out = fact.withColumn(jk, fk).join(F.broadcast(dim_small), jk, "left")
    if default is not None:
        out = out.fillna({out_col: default})
    return out.drop(jk)


def anti_join_dedup(incoming: DataFrame, warehouse: DataFrame,
                    keys: Sequence[str]) -> DataFrame:
    """J2 — incremental dedup: keep incoming rows whose composite key
    does not already exist in the warehouse snapshot
    (dags/etl_municipios.py:138-142).

    The warehouse side is reduced to distinct keys first so the shuffle
    (or broadcast) moves keys, not rows."""
    snapshot = warehouse.select(*keys).distinct()
    return incoming.join(snapshot, on=list(keys), how="left_anti")


def semi_join(left: DataFrame, right: DataFrame,
              keys: Sequence[str]) -> DataFrame:
    """Complement of J2 — rows whose key DOES exist on the right."""
    snapshot = right.select(*keys).distinct()
    return left.join(snapshot, on=list(keys), how="left_semi")


def salted_join(big: DataFrame, medium: DataFrame,
                keys: Sequence[str], how: str = "inner",
                n_salts: int = 8) -> DataFrame:
    """Skew-mitigating equi-join for when neither side broadcasts.

    A hot key (one município, one event_type carrying 30% of a 100 TB
    table) lands its entire volume on one reducer in a plain shuffle
    join.  Salting scatters it: the big side gets a deterministic salt
    in [0, n_salts) (hash of the whole row — NOT the join key, which
    would undo the scatter), the medium side is replicated n_salts×
    via one posexplode, and the join key becomes (keys..., salt).
    For inner/left joins the result is row-identical to the unsalted
    join; the hot key's work is spread over n_salts reducers at the
    cost of replicating the medium side's shuffle n_salts×.

    ``how`` is restricted to inner/left/left_semi/left_anti: in a
    right or full-outer join an unmatched medium row would surface
    once per replica (n_salts null-extended copies), so those modes
    are rejected rather than silently wrong.

    AQE's skew-join split handles most of this automatically at
    runtime (session.py turns it on); this operator is the explicit
    form for planners that need guaranteed layout — e.g. feeding a
    bucketed writer — or for engines/pipelines with AQE off.
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left-family joins only, got "
            f"{how!r}: the replicated medium side would emit unmatched "
            f"rows once per salt in right/full-outer modes")
    keys = list(keys)
    salt_src = [c for c in big.columns if c not in keys] or keys
    big_s = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in salt_src]),
                         F.lit(n_salts)))
    medium_s = medium.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return big_s.join(medium_s, keys + ["__salt"], how).drop("__salt")


def asof_join(left: DataFrame, right: DataFrame, keys: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_vals: Sequence[str] = ("value",),
              strict: bool = True) -> DataFrame:
    """As-of join: attach to each left row the most recent right row
    with ``right_ts < left_ts`` (``<=`` when strict=False) per key —
    an operator Spark lacks natively, composed from built-ins.

    Shape: tag both sides, union, one window pass per key ordered by
    (ts, side) taking the last non-null right payload.  ONE shuffle on
    the keys total — at 100 TB this beats any join-based formulation
    (a range join would be quadratic per key; a groupBy-max subquery
    shuffles twice).  Strictness is encoded in the tie order: at equal
    ts the left row sorts before (strict) or after (non-strict) the
    right row, so visibility does the comparison for free.

    Right rows should be unique per (keys, right_ts) — pre-aggregate
    otherwise, or the tie winner among equal timestamps is the last in
    (arbitrary) union order.  Output: all left columns plus
    ``matched_ts`` and the requested right value columns (null when no
    earlier right row exists — LEFT asof semantics).
    """
    from pyspark.sql import Window

    keys = list(keys)
    ls, rs = (0, 1) if strict else (1, 0)
    rpay = F.struct(F.col(right_ts).alias("matched_ts"),
                    *[F.col(c) for c in right_vals])
    r = right.select(*keys, F.col(right_ts).alias("__ts"),
                     F.lit(rs).alias("__side"), rpay.alias("__r"))
    lpay = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(*keys, F.col(left_ts).alias("__ts"),
                    F.lit(ls).alias("__side"), lpay.alias("__l"),
                    F.lit(None).cast(r.schema["__r"].dataType).alias("__r"))
    r = r.withColumn(
        "__l", F.lit(None).cast(l.schema["__l"].dataType)) \
        .select(*l.columns)
    u = l.unionByName(r)
    w = (Window.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__l").isNotNull())
        .select("__l.*", "__m.*")
    )


def banded_range_join(fact: DataFrame, bands: DataFrame,
                      value_col: str, lo_col: str, hi_col: str,
                      band_width: int) -> DataFrame:
    """Range join (lo <= value < hi) without the quadratic blowup.

    A naive range join is a cross product filtered by the predicate —
    unusable at scale.  When band boundaries are aligned to a uniform
    ``band_width`` grid, each fact row's candidate bands collapse to
    exactly one grid cell: join on ``floor(value / width) ==
    floor(lo / width)`` (bands spanning k cells are exploded into k
    rows first), then re-check the exact predicate.  The range join
    becomes an equi-join — broadcastable, AQE-skew-splittable, one
    narrow pass of band explosion on the (small) band side.
    """
    cell = (F.floor(F.col(value_col) / band_width)).cast("bigint")
    b = bands.withColumn(
        "__cell",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / band_width).cast("bigint"),
            F.floor((F.col(hi_col) - 1e-9) / band_width).cast("bigint"))))
    return (
        fact.withColumn("__cell", cell)
        .join(F.broadcast(b), "__cell")
        .filter((F.col(value_col) >= F.col(lo_col)) &
                (F.col(value_col) < F.col(hi_col)))
        .drop("__cell")
    )


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_col: str, right_col: str, max_dist: int) -> DataFrame:
    """Edit-distance join: pairs with ``levenshtein <= max_dist``,
    without the full cross product.

    Blocking rule: edit distance <= k forces ``|len(a) - len(b)| <= k``,
    so with length cells of width ``k + 1`` a matching pair's cells
    differ by at most 1.  The left side keeps its own cell; the right
    side is replicated to cells {c-1, c, c+1}; the join is then a plain
    equi-join on the cell id (shuffle-partitioned / broadcastable /
    AQE-skew-splittable) and the exact ``levenshtein`` predicate
    re-checks candidates JVM-side.  Each true pair meets in exactly one
    cell, so no dedup pass is needed.  Worst case (all strings the same
    length) degenerates to per-cell quadratic — the documented next
    step at scale is q-gram prefix blocking on top of the same shape.

    Returns left ++ right columns plus ``distance``.
    """
    w = max_dist + 1
    lc = F.floor(F.length(left_col) / w).cast("bigint")
    rc = F.floor(F.length(right_col) / w).cast("bigint")
    r = right.withColumn(
        "__cell", F.explode(F.array(rc - 1, rc, rc + 1)))
    return (
        left.withColumn("__cell", lc)
        .join(r, "__cell")
        .withColumn("distance",
                    F.levenshtein(left_col, right_col).cast("bigint"))
        .filter(F.col("distance") <= max_dist)
        .drop("__cell")
    )


def fuzzy_join_qgrams(left: DataFrame, right: DataFrame,
                      left_col: str, right_col: str,
                      max_dist: int = 2, q: int = 3) -> DataFrame:
    """Edit-distance-<=k join by **q-gram prefix blocking** (the
    Ed-Join family) — the general-k fix for length-cell blocking's
    same-length worst case (``fuzzy_join``) that deletion-neighborhood
    blocking (``fuzzy_join_deletes``) only solves for k=1.

    Count-filter bound: one edit destroys at most ``q`` of a string's
    distinct q-grams, so ``levenshtein(a, b) <= k`` forces
    ``|G(a) ∩ G(b)| >= |G(a)| - k*q``.  Under a shared global gram
    order (document-frequency ascending — the same rarest-first trick
    as ``dedup.jaccard_pairs``), a qualifying pair must collide inside
    each side's ``k*q + 1`` rarest grams (its *prefix*), so indexing
    only prefixes gives an equi-join whose buckets are keyed by RARE
    grams — near-singleton, never corpus-quadratic — with zero false
    negatives.  The exact ``levenshtein`` recheck then filters the
    candidates JVM-side.

    Strings with fewer than ``k*q + 1`` grams (length < q*(k+1)) make
    the count bound vacuous; they take a length-blocked fallback join
    against the (also short, length < q*(k+1) + k) strings they could
    match.  That bucket is bounded by the short-string population —
    tiny in entity-name workloads; document-scale inputs never land
    there.

    ``q`` is the selectivity knob (as in Ed-Join): the gram space is
    |alphabet|^q, and prefix buckets stop discriminating when
    n_strings * grams_per_string approaches it.  q=3 suits natural-
    language names; dense alphabets (hex ids, digit strings) need q=4+
    — measured here, q=2 on 15k hex-ish strings left only 276 gram
    values and a 30M-pair candidate set vs ~260k at q=4.

    Shuffle budget: blocking runs over the DISTINCT (side, string)
    union — grams, prefixes, and candidates are all keyed by string
    VALUES, never row ids, so both sides share one gram pipeline and
    one document-frequency aggregate, and nothing nondeterministic
    needs pinning (no row-id checkpoint: a recomputed partition
    reproduces the same candidates by construction — fault-tolerant at
    cluster scale for free).  Candidate string pairs dedup once; one
    equi-join per side rehydrates the full rows, so genuinely
    duplicate input rows keep their multiplicity, matching the naive
    cross-join semantics.  Returns left ++ right columns plus
    ``distance``; left and right must not share column names.
    """
    kq = max_dist * q
    short_len = q * (max_dist + 1)

    from pyspark.storagelevel import StorageLevel

    s = F.col("__s")
    # persist, not checkpoint: every frame here is a deterministic
    # function of the inputs (string values, no generated ids), so a
    # lost cached partition just recomputes — the cache only stops the
    # five consumers of the union (gram pipeline x2, short fallback
    # x2, rehydration) from re-running the distinct per branch.
    u = (left.select(F.col(left_col).alias("__s"))
         .withColumn("__side", F.lit(0))
         .unionAll(right.select(F.col(right_col).alias("__s"))
                   .withColumn("__side", F.lit(1)))
         .distinct()
         .persist(StorageLevel.MEMORY_AND_DISK))

    gram_arr = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.length(s) - q + 1),
        lambda i: F.substring(s, i, F.lit(q))))
    g = (u.filter(F.length(s) >= short_len)
         .select("__side", "__s", F.length(s).alias("__len"),
                 F.explode(gram_arr).alias("__g")))
    dfreq = g.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))

    # Per-string rarest-(kq+1) grams via an IN-ROW array sort instead
    # of a row_number window: the gram table regroups on the string
    # either way (one shuffle), but sorting happens inside each
    # <=|string| element array, not across whole partitions — and the
    # (df, gram) struct order gives a deterministic global tie-break
    # shared by both sides (it is literally the same computation).
    pref = (g.join(dfreq, "__g")
            .groupBy("__side", "__s", "__len")
            .agg(F.collect_list(F.struct("__df", "__g")).alias("__gs"))
            .select("__side", "__s", "__len",
                    F.explode(F.slice(F.array_sort("__gs"), 1, kq + 1))
                    .alias("__t"))
            .select("__side", "__s", "__len",
                    F.col("__t.__g").alias("__g"))
            .persist(StorageLevel.MEMORY_AND_DISK))

    lp = pref.filter(F.col("__side") == 0).select(
        F.col("__s").alias("__ls"), F.col("__len").alias("__ll"), "__g")
    rp = pref.filter(F.col("__side") == 1).select(
        F.col("__s").alias("__rs"), F.col("__len").alias("__rl"), "__g")
    cand_pref = (
        lp.join(rp, "__g")
        .filter(F.abs(F.col("__ll") - F.col("__rl")) <= max_dist)
        .select("__ls", "__rs")
    )

    # Short-string fallback: length-blocked candidates for strings the
    # count filter can't cover (either side shorter than q*(k+1)).
    lu = u.filter(F.col("__side") == 0).select(
        F.col("__s").alias("__ls"), F.length("__s").alias("__llen"))
    ru = u.filter(F.col("__side") == 1).select(
        F.col("__s").alias("__rs"), F.length("__s").alias("__rlen"))
    ls_short = lu.filter(F.col("__llen") < short_len)
    rs_short = ru.filter(F.col("__rlen") < short_len)
    r_compat = ru.filter(F.col("__rlen") < short_len + max_dist)
    l_long = lu.filter((F.col("__llen") >= short_len) &
                       (F.col("__llen") < short_len + max_dist))
    neighborhood = F.explode(F.sequence(
        F.greatest(F.col("__rlen") - max_dist, F.lit(0)),
        F.col("__rlen") + max_dist)).alias("__llen")
    cand_short = (
        ls_short.join(r_compat.select("__rs", neighborhood), "__llen")
        .select("__ls", "__rs")
        .unionAll(
            l_long.join(rs_short.select("__rs", neighborhood), "__llen")
            .select("__ls", "__rs"))
    )

    cand = cand_pref.unionAll(cand_short).distinct()
    return (
        left.join(cand, left[left_col] == cand["__ls"])
        .join(right, cand["__rs"] == right[right_col])
        .withColumn("distance",
                    F.levenshtein(left_col, right_col).cast("bigint"))
        .filter(F.col("distance") <= max_dist)
        .drop("__ls", "__rs")
    )


def _delete_at(s: "F.Column", i: "F.Column") -> "F.Column":
    """``s`` with the character at 1-based position ``i`` removed;
    ``i == 0`` (and any ``i`` past the end) is the identity — so a
    position sequence ``0..L`` enumerates "no deletion" plus every
    single deletion without branching on the string's length."""
    return F.when(i == 0, s).otherwise(
        F.concat(F.substring(s, F.lit(1), i - 1),
                 F.substring(s, i + 1, F.lit(2147483647))))


def _deletion_keys(col: str, max_dist: int = 1) -> "F.Column":
    """``array_distinct`` of every variant of the string with UP TO
    ``max_dist`` characters deleted — 1 + L + C(L,2) + … distinct
    keys, built entirely in-row (nested ``transform`` over position
    sequences; a second-level deletion applies to each first-level
    variant, identity positions make ragged lengths uniform).  All
    JVM expressions inside whole-stage codegen; nothing leaves the
    row until the explode."""
    keys = F.array(F.col(col))
    for _ in range(max_dist):
        keys = F.flatten(F.transform(
            keys,
            lambda v: F.transform(
                F.sequence(F.lit(0), F.length(v)),
                lambda i: _delete_at(v, i))))
    return F.array_distinct(keys)


def fuzzy_join_deletes(left: DataFrame, right: DataFrame,
                       left_col: str, right_col: str,
                       max_dist: int = 1,
                       left_source: DataFrame | None = None,
                       right_source: DataFrame | None = None) -> DataFrame:
    """Edit-distance-<=k join by **deletion-neighborhood blocking**
    (the FastSS family) — the fix for length-cell blocking's worst
    case (every string the same length, one cell quadratic) AND, at
    ``max_dist=2``, for q-gram prefix blocking's short-string regime
    (round-10 scale finding, SCALE.md: with L <= q·(k+1) the count
    filter's prefix is the string's ENTIRE gram set, and once
    n·L outgrows the |alphabet|^q gram space the candidate join is
    quadratic — measured exponent 1.77 on the sf1→sf3 step).

    Each side expands to its <=k-deletion neighborhood (in-row
    ``array_distinct``, 1 + L + C(L,2) + … keys per string — ~79 for
    L=12, k=2).  Any pair within edit distance k shares a key: walk
    an optimal alignment — a substitution deletes one character from
    EACH side, an insertion/deletion deletes from one — so both
    strings reach a common subsequence with at most k deletions
    apiece.  The equi-join on variants therefore finds every true
    pair (zero false negatives); the exact ``levenshtein`` recheck
    discards neighborhood collisions at larger true distance.
    Candidate volume is O(rows × L^k) keys with near-singleton
    buckets — LINEAR in rows at any length skew or alphabet density,
    never O(rows²).

    Returns left ++ right columns plus ``distance``.  A pair that
    matches through several deletion keys is emitted once per input
    row pair — row ids (not full-row dedup) collapse the multi-key
    duplicates, so genuinely duplicate input rows keep their
    multiplicity, matching the naive cross-join semantics.  Left and
    right must not share column names (same contract as the equi-join
    itself).

    ``left_source`` / ``right_source``: optional probe proxies for the
    fan-out partition check — pass the base frame when left/right are
    narrow transforms of it (ensure_parallelism's ``source`` contract)
    so the per-invocation ``.rdd`` planning pass is replaced by the
    base frame's cached count (optimization r12).
    """
    # Fan the inputs out BEFORE the neighborhood explode: the
    # expansion is the expensive per-row work (O(L^k) substring
    # builds), and a single-row-group parquet scan would otherwise
    # serialize it on one core (measured: the whole sf1.0 join ran
    # single-threaded off the 1-partition customer scan).  No-op when
    # the input already has cluster-width partitions — the 100 TB
    # case (same contract as sources.parquet_source.ensure_parallelism).
    from ..sources.parquet_source import ensure_parallelism

    left = ensure_parallelism(left, left.sparkSession,
                              source=left_source)
    right = ensure_parallelism(right, right.sparkSession,
                               source=right_source)
    lk = (left.withColumn("__lid", F.monotonically_increasing_id())
          .withColumn("__k", F.explode(
              _deletion_keys(left_col, max_dist))))
    rk = (right.withColumn("__rid", F.monotonically_increasing_id())
          .withColumn("__k", F.explode(
              _deletion_keys(right_col, max_dist))))
    # SMJ hint for the same reason as dedup.incremental_neardup_verdict
    # (the r9 scale catch): Catalyst's stats pass the PRE-explode size
    # through Generate, so it sizes each variant side at ~the input
    # scan and auto-broadcasts an O(rows·L^k) relation — measured
    # BuildRight on a 35M-row side at sf3.0, OOM-ing the 8 GB local
    # JVM.  Skinny (key, id) rows through a shuffle instead; pinned by
    # the no-explode-broadcast law in tests/test_plan_hygiene.py.
    return (
        lk.hint("merge").join(rk.hint("merge"), "__k")
        .drop("__k")
        .dropDuplicates(["__lid", "__rid"])
        .drop("__lid", "__rid")
        .withColumn("distance",
                    F.levenshtein(left_col, right_col).cast("bigint"))
        .filter(F.col("distance") <= max_dist)
    )


def resolve_dim_columns(columns: Sequence[str],
                        name_col: str, code_col: str) -> tuple[str, str]:
    """J3 — name-or-positional dim column resolution (reference
    pipeline.py:97-98): prefer the expected header names, fall back to
    last column for the name and second column for the code."""
    name = name_col if name_col in columns else columns[-1]
    code = code_col if code_col in columns else columns[1]
    return name, code
