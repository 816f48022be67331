"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash (BASELINE.json north star; the reference's only dedup is the
key-based anti-join J2, operators/joins.py).

Scale design:

* **Exact** dedup is a hash-groupBy on a fingerprint — one shuffle of
  (fingerprint, id), never of document bodies.
* **Jaccard pairs** via shingle inverted index (self-join on shingle)
  is quadratic in bucket size — correct as an oracle/verification
  path, bounded by `max_id` in queries; the scale path is LSH.
* **MinHash+LSH**: signatures are a single explode+groupBy pass
  (k aggregations, map-side combined); banding turns pair discovery
  into an equi-join on band keys, so candidate generation is linear in
  bucket sizes instead of quadratic in corpus size.
* **SimHash**: one explode over (token × bit) then two groupBys; at
  scale the bit dimension is a constant 16-64×, all map-side
  combinable.

Portability: all hashes are md5-hex based (identical in any engine);
MinHash "permutations" are md5(seed || shingle) compared as hex
strings (uniform order, engine-portable min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalized_text


def word_shingles(df: DataFrame, id_col: str, text_col: str,
                  n: int = 1) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    if n == 1:
        return df.select(
            F.col(id_col),
            F.explode(F.array_distinct(toks)).alias("shingle"))
    # Materialize the token array before the lambda so the split isn't
    # re-evaluated per element (same trap as char_shingles).
    tk = df.select(F.col(id_col), toks.alias("__tk"))
    # Docs shorter than n tokens have no n-grams; without the guard
    # sequence(1, size-n+1) DESCENDS when size < n and slice(_, 0, _)
    # throws.
    grams = F.when(
        F.size("__tk") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__tk") - (n - 1)),
            lambda i: F.array_join(F.slice("__tk", i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return tk.select(F.col(id_col),
                     F.explode(F.array_distinct(grams)).alias("shingle"))


def char_shingles(df: DataFrame, id_col: str, text_col: str,
                  n: int = 4, distinct: bool = False) -> DataFrame:
    """Character n-gram shingles of the normalized text.

    Two deliberate shapes for the 100-TB path:

    * The normalization (regexp_replace+lower) is materialized in its
      own projection BEFORE the position explode.  Referencing the
      normalization expression from inside a higher-order lambda makes
      Spark re-evaluate the regex once per array element (~300× per
      document) — measured 21× slower at sf0.1.  With the projection
      split, the generator's substring reads a plain attribute.
    * ``distinct=False`` by default: MinHash is invariant under shingle
      multiplicity (min over a multiset equals min over its set), and
      the per-row dedup / ``distinct()`` shuffle is pure overhead on
      the LSH path.  Ask for distinct only when set semantics matter
      (Jaccard sizes).  In particular the default output is NOT valid
      input to ``jaccard_pairs`` — its intersection count assumes
      distinct (id, shingle) rows, and it guards the assumption with a
      runtime raise (see its docstring)."""
    nt = df.select(F.col(id_col),
                   normalized_text(F.col(text_col)).alias("__nt"))
    positions = F.sequence(
        F.lit(1), F.greatest(F.length("__nt") - (n - 1), F.lit(1)))
    out = (
        nt.select(F.col(id_col), "__nt",
                  F.explode(positions).alias("__i"))
        .select(F.col(id_col),
                F.substring(F.col("__nt"), F.col("__i"), F.lit(n))
                 .alias("shingle"))
    )
    return out.distinct() if distinct else out


def shingle_set_arrays(df: DataFrame, id_col: str, text_col: str,
                       n: int = 4) -> DataFrame:
    """Per-document DISTINCT shingle set as one in-row array column
    ``shingles`` — the zero-shuffle twin of
    ``char_shingles(distinct=True)`` + collect_set.

    Same shingle definition as ``char_shingles`` (normalized text,
    positions 1..max(len-n+1, 1)), so Jaccard numbers computed from
    either representation are identical.  The normalization lands in
    its own projection and is referenced twice there (length + the
    substring lambda), which keeps CollapseProject from inlining the
    regex into the lambda body — inlined, it would re-run once per
    shingle position (the char_shingles lesson).  Use this for
    bounded-width texts feeding per-pair set comparisons; use the
    exploded form when downstream needs shingle-level joins or
    aggregation."""
    nt = df.select(F.col(id_col),
                   normalized_text(F.col(text_col)).alias("__nt"))
    positions = F.sequence(
        F.lit(1), F.greatest(F.length("__nt") - (n - 1), F.lit(1)))
    return nt.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(positions,
                        lambda i: F.substring(F.col("__nt"), i, F.lit(n)))
        ).alias("shingles"))


def exact_dedup_groups(df: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one row per
    distinct content with the keeper id and the duplicate count."""
    return (
        df.select(F.col(id_col),
                  F.md5(normalized_text(F.col(text_col))).alias("content_key"))
        .groupBy("content_key")
        .agg(F.min(id_col).alias("keeper_id"),
             F.count(F.lit(1)).alias("n_docs"))
    )


def prefix_dedup_groups(df: DataFrame, id_col: str, text_col: str,
                        prefix_len: int = 100) -> DataFrame:
    """Prefix-hash dedup (the C4/Gopher "same first k characters"
    heuristic): documents sharing their first ``prefix_len`` raw
    characters are near-certain template duplicates — cheaper than
    MinHash and catches the boilerplate class exact dedup misses
    (same lede, diverging tails).  Same shuffle shape as exact dedup:
    only (hash, id) pairs move, never bodies."""
    return (
        df.select(F.col(id_col),
                  F.md5(F.substring(F.trim(F.col(text_col)), 1, prefix_len))
                   .alias("prefix_key"))
        .groupBy("prefix_key")
        .agg(F.min(id_col).alias("keeper_id"),
             F.count(F.lit(1)).alias("n_docs"))
    )


def jaccard_pairs(shingles: DataFrame, id_col: str,
                  threshold: float, *,
                  pin_shuffle: bool = False) -> DataFrame:
    """All-pairs set Jaccard >= threshold, exact, via **prefix
    filtering** (the AllPairs/PPJoin family).

    The naive inverted-index join is quadratic per shingle bucket — a
    stopword shared by every document yields |corpus|² candidate pairs.
    Prefix filtering is the exact fix: under any global token order, if
    J(x,y) >= t then |x∩y| >= ceil(t·|x|), so the minimum common token
    cannot be avoided by x's ``|x| - ceil(t·|x|) + 1`` smallest tokens
    (its *prefix*) — and symmetrically for y.  Indexing only prefixes,
    ordered rarest-first (document frequency asc), makes the join keys
    the RAREST tokens: bucket sizes collapse from corpus-wide to a
    handful, with zero false negatives.  Candidates are then verified
    by counting shared shingles AGAINST THE INVERTED INDEX itself
    (canonical PPJoin): skinny (id, shingle) rows join to the
    candidate pairs and a pair-keyed count is the exact intersection.

    ``shingles`` must be DISTINCT (id, shingle) rows — what
    `word_shingles` / `char_shingles(distinct=True)` emit — since the
    overlap count is the SET intersection only without duplicates.
    A multiset input inflates the count by the multiplicity product
    (jaccard can exceed 1), so the contract is GUARDED, not just
    documented: any pair whose counted intersection exceeds either
    set size — impossible for set input — raises at execution time
    (one scalar comparison per candidate pair, inside codegen; no
    extra shuffle, no defensive ``.distinct()`` tax on correct
    callers).  The guard is necessary-not-sufficient (some multiset
    inputs stay under the bound), but it turns the likely misuse —
    ``char_shingles`` with its default ``distinct=False`` — into a
    loud error instead of silent >1.0 similarities.

    Verification deliberately never materializes per-doc token
    arrays.  The collect_list alternative (one array join per pair
    side) fails BOTH ways at scale, measured at the sf10.0 curve
    point: Catalyst sizes the array projection from the scan's string
    stats — blind to the ~text-length× expansion — and auto-broadcasts
    the O(corpus) side until the exchange build OOMs the driver; pin
    SMJ instead and the candidate side drags full arrays through two
    sort spills, |cand|×|doc| wide (a 450 MB input filled ~60 GB of
    /tmp before dying).  Skinny exploded rows shuffle linearly,
    spill in small units, and leave nothing wide for the planner to
    misestimate.

    Still the verification path at extreme scale (LSH first), but now
    usable directly up to very large corpora.

    Plan shape: the exploded shingle set feeds four subtrees (doc
    frequency, per-doc sizes, the prefix join, the verify count) that
    Catalyst cannot fuse — they key differently — so it is persisted
    (memory-and-disk) rather than recomputed per consumer."""
    from pyspark.storagelevel import StorageLevel

    shingles = shingles.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    dfreq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))

    # Join-strategy contract.  Several sides below are O(corpus)-
    # scaled (document frequency over the shingle vocabulary, the
    # prefix slices, per-doc sizes) but sit above AGGREGATES whose
    # static Catalyst size estimate collapses to a constant — off by
    # an unbounded factor.  That is safe under the operator's
    # sanctioned execution mode, ADAPTIVE: every such side is
    # post-shuffle, so AQE re-plans the join from the real stage size
    # and demotes the broadcast as the data grows (measured fast at
    # sf1/sf3, the 100x point included once callers stopped compiling
    # statically).  It is NOT safe under static compilation
    # (`Dataset.checkpoint` / `localCheckpoint` of this plan): the
    # collapsed estimates become static BroadcastExchanges of
    # O(corpus) tables and the build OOMs the driver — measured at the
    # round-10 sf10.0 curve point via corpus_curate before
    # connected_components switched to adaptive lineage cuts.
    #
    # ``pin_shuffle=True`` is the escape hatch for callers that MUST
    # compile this plan statically: every join is hint-pinned to
    # sort-merge (zero static broadcasts; law in
    # tests/test_plan_hygiene_jaccard.py).  It is not the default
    # because the (id_b, shingle) verify join then MATERIALIZES the
    # |cand| x |doc| verification volume as shuffle+sort data — linear
    # and partitionable, so a cluster's aggregate shuffle capacity
    # absorbs it, but measured at ~60-80 GB from a 450 MB sf3.0 input
    # on one box (ENOSPC on a shared 80 GB /tmp), where the pipelined
    # broadcast streams the same volume through the probe without
    # touching disk.  Neither shape survives the 100x point on one
    # box (broadcast: index outgrows the heap; shuffle: disk) — past
    # sf3 the answer is algorithmic, not a join hint: LSH-banded
    # candidates + bounded verify.
    def _h(df: DataFrame) -> DataFrame:
        return df.hint("merge") if pin_shuffle else df
    # Rarest-first total order realized IN-ROW: regroup the df-tagged
    # tokens per doc and slice the (df, shingle)-sorted array to the
    # prefix length — same single shuffle on the id as the row_number
    # window had, same tie-break, but the sort is per-array (<= |doc|
    # tokens) instead of a partition-wide window sort, and the set
    # size falls out of the array length (no extra `sizes` join).
    # Round before ceil so float noise in t*sz can never shorten the
    # prefix (boundary-exactness guard).
    plen = (F.size("__gs")
            - F.ceil(F.round(threshold * F.size("__gs"), 6)) + 1)
    prefix = (
        shingles.join(_h(dfreq), "shingle")
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("__df", "shingle")).alias("__gs"))
        .select(F.col(id_col),
                F.explode(F.slice(F.array_sort("__gs"), F.lit(1),
                                  plen.cast("int"))).alias("__s"))
        .select(F.col(id_col), F.col("__s.shingle").alias("shingle"))
    )
    cand = (
        prefix.select(F.col(id_col).alias("id_a"), "shingle")
        .join(_h(prefix.select(F.col(id_col).alias("id_b"), "shingle")),
              "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact intersection per candidate pair from the inverted index:
    # attach id_a's shingles to the pair, then inner-join on
    # (id_b, shingle) — a row survives iff BOTH docs contain the
    # shingle — and count per pair.  Every row in flight is
    # (long, long, short string); the joins and the count shuffle
    # skinny data keyed by ids/shingles, so the planner's size
    # estimates are off by at most a bounded factor and every sort
    # spill unit is one row, not one document's token array.  Pairs
    # with zero overlap drop out of the inner join, which is correct:
    # they cannot meet any threshold > 0 (cand pairs share a prefix
    # token by construction anyway).
    inter = (
        cand
        .join(_h(shingles.select(F.col(id_col).alias("id_a"), "shingle")),
              "id_a")
        .join(_h(shingles.select(F.col(id_col).alias("id_b"), "shingle")),
              ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    checked_i = F.when(
        F.col("__i") > F.least("__sa", "__sb"),
        F.raise_error(F.concat(
            F.lit("jaccard_pairs: intersection count exceeds a set "
                  "size for pair ("),
            F.col("id_a").cast("string"), F.lit(", "),
            F.col("id_b").cast("string"),
            F.lit(") — input was not DISTINCT (id, shingle) rows; "
                  "use word_shingles / char_shingles(distinct=True) "
                  "or .distinct() the input"))).cast("long"),
    ).otherwise(F.col("__i"))
    return (
        inter
        .join(_h(sizes.select(F.col(id_col).alias("id_a"),
                              F.col("sz").alias("__sa"))), "id_a")
        .join(_h(sizes.select(F.col(id_col).alias("id_b"),
                              F.col("sz").alias("__sb"))), "id_b")
        .withColumn("__i", checked_i)
        .withColumn("jaccard", F.round(
            F.col("__i").cast("double") /
            (F.col("__sa") + F.col("__sb") - F.col("__i")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(shingles: DataFrame, id_col: str,
                      n_hashes: int = 8) -> DataFrame:
    """MinHash signature per id: n_hashes "permutations", each the
    minimum of an 8-hex-char slice of a salted md5 over the shingle
    set.  Four slices per digest, so 8 permutations cost 2 md5
    evaluations per shingle instead of 8 — the hash is the hot loop of
    LSH dedup at scale.

    Hex-string min is a valid MinHash (md5 is uniform over the slice
    order) and is bit-identical in any engine with md5 + substr.
    """
    aggs = []
    for i in range(n_hashes):
        salt, chunk = divmod(i, 4)
        digest = F.md5(F.concat(F.lit(f"s{salt}:"), F.col("shingle")))
        aggs.append(
            F.min(F.substring(digest, chunk * 8 + 1, 8)).alias(f"mh{i}"))
    return shingles.groupBy(id_col).agg(*aggs)


def banded_keys(signatures: DataFrame, id_col: str,
                rows_per_band: int = 2) -> DataFrame:
    """(id, band, band_key) rows from a signature frame — ONE
    posexplode over the band array (see lsh_candidate_pairs for why
    not per-band unions)."""
    mh_cols = [c for c in signatures.columns if c.startswith("mh")]
    n_bands = len(mh_cols) // rows_per_band
    band_arr = F.array(*[
        F.concat_ws("|", *mh_cols[b * rows_per_band:(b + 1) * rows_per_band])
        for b in range(n_bands)
    ])
    return signatures.select(
        F.col(id_col), F.posexplode(band_arr).alias("band", "band_key"))


def incremental_lsh_candidates(new_sigs: DataFrame,
                               warehouse_sigs: DataFrame,
                               id_col: str,
                               rows_per_band: int = 2,
                               max_bucket: int | None = None,
                               wh_bands: DataFrame | None = None) -> DataFrame:
    """Incremental dedup's pair discovery: candidates between a NEW
    batch and the existing signature warehouse — the production
    arrival path, where the corpus is never re-shingled and never
    self-joined.

    Both sides band identically; the join is new-bands × warehouse-
    bands only, so the work is O(new × bucket), independent of corpus
    size — at 100 TB the warehouse side is a bucketed/partitioned
    signature table and the band join prunes to the new batch's
    buckets.  Intra-batch duplicates are found separately with
    ``lsh_candidate_pairs`` over the (small) batch itself.

    Returns distinct (new_id, old_id) candidate pairs; verify with an
    exact Jaccard recheck as usual.

    ``wh_bands``: the PRE-BANDED warehouse — (id_col, band, band_key)
    rows with the hot-band cap ALREADY applied (what a production
    warehouse stores: signatures partitioned by band key, written at
    ingest).  When provided, ``warehouse_sigs``/``max_bucket`` are
    ignored for the warehouse side and the per-arrival banding +
    bucket-census window are skipped (optimization r12) — the caller
    owns keeping the staged table's cap in sync.
    """
    from pyspark.sql import Window

    nb = banded_keys(new_sigs, id_col, rows_per_band) \
        .withColumnRenamed(id_col, "new_id")
    if wh_bands is not None:
        wb = wh_bands.withColumnRenamed(id_col, "old_id")
    else:
        wb = banded_keys(warehouse_sigs, id_col, rows_per_band) \
            .withColumnRenamed(id_col, "old_id")
        if max_bucket is not None:
            # Same hot-band guard as lsh_candidate_pairs, applied to
            # the warehouse side: a stopband-like band_key shared by
            # many warehouse signatures would otherwise re-introduce
            # the quadratic fanout on exactly the arrival path this
            # function exists to keep O(new x bucket).  The window
            # count rides the join key's own partitioning — no extra
            # shuffle.
            w = Window.partitionBy("band", "band_key")
            wb = (wb.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
                    .filter(F.col("__bucket_n") <= max_bucket)
                    .drop("__bucket_n"))
    return (
        nb.join(wb, ["band", "band_key"])
        .select("new_id", "old_id")
        .distinct()
    )


def incremental_neardup_verdict(new_docs: DataFrame, wh_docs: DataFrame,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                n_shingle: int = 4,
                                threshold: float = 0.8,
                                max_bucket: int | None = 500,
                                wh_sigs: DataFrame | None = None,
                                wh_bands: DataFrame | None = None,
                                wh_shingle_arrays: DataFrame | None = None,
                                ) -> DataFrame:
    """Per-new-doc load verdict against an existing corpus: (id,
    matched_old, loaded) where ``matched_old`` is the LOWEST warehouse
    near-duplicate id (NULL if none) and ``loaded`` = 1 iff the doc
    survives to load — the complete arrival-path decision.

    Stages (each the operator the standalone dedup queries verify):
    batch minhash signatures → ``incremental_lsh_candidates`` against
    the warehouse signatures (new-bands × warehouse-bands only,
    hot-band capped) → exact char-n-gram Jaccard recheck of JUST the
    candidate pairs via in-row shingle-set intersects (never
    all-pairs) → left-join verdict.

    ``wh_sigs``: pass the materialized warehouse signature table to
    skip re-shingling the corpus — at 100 TB the signatures are stored
    (partitioned by band key) and this argument is mandatory in
    spirit; when None they are derived from ``wh_docs`` (the small-SF
    test path).  ``wh_bands``: the pre-banded, hot-capped warehouse
    band keys (incremental_lsh_candidates' staged-table contract) —
    skips the per-arrival banding + bucket-census window.
    ``wh_shingle_arrays``: the stored per-doc shingle-set table
    ((id_col, shingles) rows, shingle_set_arrays' shape) the recheck
    uses instead of re-projecting every warehouse text per arrival —
    exactly the "stored per-doc shingle table" the paragraph below
    prescribes for cluster scale.  The exact recheck otherwise scans
    the FULL ``wh_docs`` for its zero-shuffle shingle-set projection
    and prunes row-by-row via the inner join on the candidate old ids
    — deliberately NOT a semi-join prefilter, which would force the
    heavy candidate subtree to evaluate twice (see the inline comment
    below); at cluster scale substitute a stored per-doc shingle table
    or a runtime bloom join so the warehouse TEXT scan itself is
    pruned.
    """
    sig_n = minhash_signature(
        char_shingles(new_docs, id_col, text_col, n=n_shingle),
        id_col, n_hashes=8)
    if wh_sigs is None and wh_bands is None:
        wh_sigs = minhash_signature(
            char_shingles(wh_docs, id_col, text_col, n=n_shingle),
            id_col, n_hashes=8)
    cand = incremental_lsh_candidates(sig_n, wh_sigs, id_col,
                                      rows_per_band=2,
                                      max_bucket=max_bucket,
                                      wh_bands=wh_bands)

    # Exact recheck: compare per-doc shingle-SET arrays with an in-row
    # hash-set intersect.  Three shapes rejected on measurement:
    # (1) the (pair × shingle) equi-join materializes |cand| ×
    # |shingles per doc| intermediate rows (46M for 157k candidates at
    # sf0.1 — it dominated the pipeline); (2) explode + collect_set
    # shuffles every shingle just to glue it back into an array;
    # (3) a left-semi prune of the warehouse by candidate old ids
    # forces ``cand`` — the heaviest subtree (signature groupBy, band
    # window, pair join, distinct) — to be evaluated TWICE, because
    # column pruning makes the two references structurally different
    # plans that share no exchange.  The shingle set is a PROJECTION
    # of the text (sequence/transform/array_distinct, zero shuffle),
    # so the inner join on old_id prunes row-by-row with ``cand``
    # referenced exactly once.  At cluster scale add the stored
    # per-doc signature/shingle table or Spark's runtime bloom-filter
    # join so the warehouse text scan itself is pruned.  Row width
    # bound: a doc's distinct-shingle array is O(text length); cap
    # document size upstream (doc_chunk) before feeding book-sized
    # blobs through here.
    arr_n = shingle_set_arrays(new_docs, id_col, text_col,
                               n=n_shingle) \
        .withColumnRenamed(id_col, "new_id") \
        .withColumnRenamed("shingles", "__sn")
    arr_w = (wh_shingle_arrays if wh_shingle_arrays is not None
             else shingle_set_arrays(wh_docs, id_col, text_col,
                                     n=n_shingle)) \
        .withColumnRenamed(id_col, "old_id") \
        .withColumnRenamed("shingles", "__sw")
    # Explicit hash repartition on the pair flow: with every join
    # broadcast, the pair pipeline is NARROW all the way down to the
    # batch-signature exchange, whose bytes are tiny — so AQE
    # coalesces it to ONE partition and the per-pair set intersects
    # (the pipeline's compute-heaviest stage) run single-threaded
    # (measured as a 13 s one-task stage at sf0.1).  Classic cheap-
    # bytes/expensive-compute AQE trap.  A REPARTITION_BY_NUM shuffle
    # is exempt from AQE coalescing, and re-shuffling |cand| skinny id
    # pairs costs nothing.  Keyed on BOTH pair keys deliberately:
    # keyed on new_id alone the exchange is planned away (the child
    # already hash-partitions on the aliased batch id, pre-AQE), and
    # the elision is exactly what the upstream coalesce invalidates.
    from ..session import default_shuffle_partitions
    pairs = cand.repartition(default_shuffle_partitions(),
                             "new_id", "old_id")
    # The shingle-array sides must join by SHUFFLE, never broadcast:
    # both scale with the data (arr_w is O(corpus); arr_n is O(batch),
    # and a nightly batch at 100 TB is itself TBs), while Catalyst's
    # width estimate for the shingle-array projection is the scan's
    # string stats — it cannot see the ~text-length× array expansion,
    # so the static planner sizes both sides under the broadcast
    # threshold and picks BroadcastHashJoin.  Measured at the 100×
    # curve point (sf10.0): the warehouse-side BroadcastExchange build
    # OOMs the driver ("Not enough memory to build and broadcast"),
    # the exact failure a fixed-size driver hits first at cluster
    # scale.  The merge hint pins SMJ: keys ride the explicit pair
    # repartition, and at cluster scale the stored per-doc shingle
    # table is bucketed by id, making the sort side shuffle-free.
    scored = (pairs.join(arr_n.hint("merge"), "new_id")
              .join(arr_w.hint("merge"), "old_id")
              .select("new_id", "old_id",
                      F.size(F.array_intersect("__sn", "__sw"))
                       .alias("__i"),
                      F.size("__sn").alias("__nsz"),
                      F.size("__sw").alias("__osz")))
    jac = F.round(
        F.col("__i").cast("double") /
        (F.col("__nsz") + F.col("__osz") - F.col("__i")), 6)
    dups = (scored.filter(jac >= threshold)
            .groupBy("new_id")
            .agg(F.min("old_id").alias("matched_old")))

    return (new_docs.select(id_col)
            .join(dups, new_docs[id_col] == dups["new_id"], "left")
            .select(id_col, "matched_old",
                    F.when(F.col("matched_old").isNull(), F.lit(1))
                     .otherwise(F.lit(0)).cast("long").alias("loaded")))


def lsh_candidate_pairs(signatures: DataFrame, id_col: str,
                        rows_per_band: int = 2,
                        max_bucket: int | None = None) -> DataFrame:
    """Band the signature and emit distinct candidate pairs (a<b) that
    collide in at least one band — the linear-time pair discovery.

    ``max_bucket`` drops band buckets larger than the cap before the
    self-join: an over-full bucket means the band key carries no
    discriminative signal (everything "matches" everything), and its
    pair fanout is quadratic — at 100 TB a single hot bucket would
    dominate the whole job.  Standard LSH practice; the cap bounds
    per-key join fanout to max_bucket², keeping the stage skew-free.
    """
    from pyspark.sql import Window

    mh_cols = [c for c in signatures.columns if c.startswith("mh")]
    n_bands = len(mh_cols) // rows_per_band
    # One posexplode over an array of band keys: the signature pipeline
    # is computed ONCE and fanned out n_bands×.  (A per-band
    # select+union recomputes the whole upstream — shingle, md5,
    # groupBy — once per band; at 8 bands that plan was 8 scans.)
    band_arr = F.array(*[
        F.concat_ws("|", *mh_cols[b * rows_per_band:(b + 1) * rows_per_band])
        for b in range(n_bands)
    ])
    banded = signatures.select(
        F.col(id_col), F.posexplode(band_arr).alias("band", "band_key"))
    if max_bucket is not None:
        # Window count over the join key's own partitioning — the
        # bucket-size filter rides the same shuffle the self-join
        # needs, instead of a separate aggregate + semi-join.
        w = Window.partitionBy("band", "band_key")
        banded = (
            banded.withColumn("__c", F.count(F.lit(1)).over(w))
            .filter(F.col("__c") <= max_bucket)
            .drop("__c")
        )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         node_col: str = "node",
                         max_iter: int = 20,
                         checkpoint_dir: str | None = None) -> DataFrame:
    """Connected components by iterative min-label propagation: the
    keeper-assignment stage of dedup (every document in a near-dup
    cluster maps to the cluster's minimum id).

    Driver-side loop, executor-side work: each round is one join +
    min-aggregation; convergence needs O(component diameter) rounds —
    LSH/Jaccard clusters are near-cliques, so 2-4 in practice (same
    algorithm as GraphX/GraphFrames CC).  Checkpointing truncates the
    lineage each round so the plan doesn't grow with iterations — the
    standard Spark iterative-algorithm pattern.

    Convergence: each round batches two hops and carries the first
    hop's label through the second; the round's single materializing
    aggregate counts ``l1 != l2`` rows.  Propagation is idempotent
    exactly at the fixed point and labels only ever decrease, so a
    zero count IS convergence — detected inside the same round, for
    any orderable id type, with no extra confirm pass.

    ``checkpoint_dir``: when set, rounds use *reliable* checkpoints
    written to that directory (HDFS/S3 on a cluster).  Default is
    ``localCheckpoint`` — fine single-node, but executor-local blocks
    are not fault-tolerant: at 1000 executors one lost node invalidates
    the iteration, so long-running cluster jobs should pass a dir.

    ``nodes``: one column (node ids); ``pairs``: (id_a, id_b) edges.
    Returns (node_col, component_id).
    """
    from pyspark.storagelevel import StorageLevel

    if checkpoint_dir is not None:
        nodes.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=False)
    else:
        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=False)

    # The CALLER-SUPPLIED plans (pairs, nodes) must NEVER be
    # checkpointed directly: a checkpoint compiles its child plan
    # STATICALLY, skipping AQE's runtime demotion of misestimated
    # broadcasts — so an edge pipeline whose join sides sit above
    # aggregates (size estimates collapsed to constants, e.g.
    # jaccard_pairs' document-frequency and prefix tables, O(corpus)
    # each) gets static BroadcastExchanges whose build OOMs the
    # driver.  Measured at the round-10 sf10.0 curve point via
    # corpus_curate: the identical query was fine under normal AQE
    # execution at every scale and died only inside this checkpoint
    # compile.  `adaptive_cut` therefore materializes the plan through
    # AQE first (persist + count), then checkpoints the CACHED frame —
    # which compiles to a bare InMemoryTableScan, trivially safe — and
    # drops the cache.  The result is the same true leaf (lineage cut,
    # round plans stay flat) at the cost of one counting job and one
    # cache->blocks copy per input, once per CC call.  The law in
    # tests/test_plan_hygiene_jaccard.py intercepts every checkpoint
    # this function takes and asserts raw scans/joins never reach one.
    def adaptive_cut(df: DataFrame) -> DataFrame:
        cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached.count()
        if checkpoint_dir is not None:
            out = cached.checkpoint(eager=True)
        else:
            out = cached.localCheckpoint(eager=True)
        cached.unpersist(blocking=True)
        return out

    edges = adaptive_cut(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionAll(pairs.select(F.col("id_b").alias("u"),
                               F.col("id_a").alias("v")))
    )
    # Per-round label cuts are NON-eager checkpoints: each round's
    # convergence aggregate doubles as the materializing action, so a
    # round costs ONE Spark job, not two (checkpoint job + sum job) —
    # driver-side job latency dominates iteration at interactive
    # scale, and rounds are halved again by the 2-hop batching below.
    # Static compilation is safe for ROUND plans: their only leaves
    # are the edge/label checkpoint RDDs, whose conservative default
    # statistics can never fake a small broadcast side.
    labels = adaptive_cut(nodes.select(F.col(node_col).alias("n"),
                                       F.col(node_col).alias("l")))

    def hop(lbl: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
        lv = lbl.select("n", "l")
        neigh = (
            edges.join(lv, edges.v == lv.n)
            .groupBy("u").agg(F.min("l").alias("nl"))
        )
        return (
            lbl.join(neigh, lbl.n == neigh.u, "left")
            .select("n", *extra,
                    F.least(F.col("l"), F.coalesce("nl", "l")).alias("l"))
        )

    for _ in range(max_iter):
        # TWO propagation hops per materialization: min-label
        # propagation is confluent (extra hops never overshoot the
        # fixed point), so batching halves the round count.  The
        # second hop carries the first hop's label, and convergence is
        # read off the SAME aggregate that materializes the round's
        # checkpoint: hop is idempotent exactly at the fixed point, so
        # l1 == l2 everywhere <=> converged (labels only decrease, no
        # oscillation).  One Spark action per round, and a near-clique
        # cluster set (diameter <= 2) finishes in ONE round with no
        # separate confirm pass — this detection works for any
        # orderable id type, numeric or not.
        one = hop(labels)
        new_labels = ckpt(hop(one.withColumn("l1", F.col("l")), ("l1",)))
        n_changed = new_labels.agg(
            F.sum((F.col("l") != F.col("l1")).cast("long")).alias("c")
        ).first()["c"]
        labels = new_labels.select("n", "l")
        if not n_changed:
            break
    return labels.select(F.col("n").alias(node_col),
                         F.col("l").alias("component_id"))


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over whitespace tokens (with multiplicity).

    bit_j(doc) = sign of sum over tokens of ±1 where the j-th bit of
    md5(token)[:4] decides the sign.  Near-duplicate documents land at
    small Hamming distance; equal-simhash grouping is the cheapest
    near-dup bucketing.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    vals = toks.select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10)
         .cast("int").alias("v"),
    )
    bits = (
        vals.select(F.col(id_col), "v",
                    F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"))
        .withColumn("sign", F.when(
            F.expr("shiftright(v, j) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)))
        .groupBy(id_col, "j")
        .agg(F.sum("sign").alias("s"))
    )
    return (
        bits.withColumn("bitval", F.when(
            F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")
        ).otherwise(F.lit(0)))
        .groupBy(id_col)
        .agg(F.sum("bitval").cast("bigint").alias("simhash"))
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

def contamination_stats(train: DataFrame, eval_docs: DataFrame,
                        id_col: str, text_col: str, n: int = 3,
                        flag_threshold: float = 0.2) -> DataFrame:
    """Per-document n-gram overlap against an evaluation corpus — the
    standard decontamination gate a training-data pipeline runs before
    a benchmark ships in the training set.

    Output: (id, n_grams, n_contaminated, contamination_ratio,
    contaminated) where the ratio is |distinct doc n-grams ∩ eval
    n-grams| / |distinct doc n-grams|.

    Scale shape (100 TB training side, ~10^6-gram eval side):

    - the eval gram set is distinct-ed and **broadcast** — benchmark
      suites are tiny next to a training corpus, so the train side is
      never shuffled by the membership probe;
    - ONE scan, ONE shuffle: the per-doc total rides the exploded rows
      (``explode_outer`` keeps zero-gram docs), every row probes the
      broadcast set for a 0/1 hit mark, and a single (id)-keyed
      groupBy folds both the total and the hit count — map-side
      partial-aggregated, so the shuffle carries one row per doc.
    """
    grams_expr = F.array_distinct(
        F.when(
            F.size("__tk") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("__tk") - (n - 1)),
                lambda i: F.array_join(F.slice("__tk", i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>")))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = (train.select(F.col(id_col), toks.alias("__tk"))
                .select(F.col(id_col), grams_expr.alias("__grams"))
                .select(F.col(id_col),
                        F.size("__grams").cast("bigint").alias("n_grams"),
                        F.explode_outer("__grams").alias("shingle")))
    eval_grams = (word_shingles(eval_docs, id_col, text_col, n=n)
                  .select("shingle").distinct()
                  .withColumn("__hit", F.lit(1)))
    marked = exploded.join(F.broadcast(eval_grams), "shingle", "left")
    ratio = F.when(
        F.col("n_grams") > 0,
        F.round(F.col("n_contaminated").cast("double") / F.col("n_grams"), 6)
    ).otherwise(F.lit(0.0))
    return (marked.groupBy(id_col)
            .agg(F.first("n_grams").alias("n_grams"),
                 F.sum(F.coalesce("__hit", F.lit(0)))
                  .cast("bigint").alias("n_contaminated"))
            .withColumn("contamination_ratio", ratio)
            .withColumn("contaminated",
                        F.col("contamination_ratio") >= flag_threshold))


def bloom_decontaminate(train: DataFrame, eval_docs: DataFrame,
                        id_col: str, text_col: str, n: int = 3,
                        flag_threshold: float = 0.2,
                        m_bits: int = 1 << 20) -> DataFrame:
    """:func:`contamination_stats` with a Bloom prefilter on the gram
    probe — the decontamination shape the big pretraining pipelines
    run (an n-gram Bloom of the benchmark suite, not the benchmark
    text itself, is what ships to the cluster).

    The eval grams aggregate into a fixed-size bit array
    (sketches.bloom_build: only the bitmap is collected, never the
    grams — ~256 KB at m=2^20 versus a multi-MB broadcast of raw gram
    strings), the exploded train grams drop non-members AT THE SCAN,
    and only the survivors (true hits + the tiny fp mass) probe the
    exact broadcast gram set.  Per-doc totals are captured before the
    prune, so the output is ROW-IDENTICAL to contamination_stats —
    pinned by the equality law in tests/test_sketches.py."""
    from .sketches import bloom_build, bloom_prune

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams_expr = F.array_distinct(
        F.when(
            F.size("__tk") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("__tk") - (n - 1)),
                lambda i: F.array_join(F.slice("__tk", i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>")))
    with_grams = (train.select(F.col(id_col), toks.alias("__tk"))
                  .select(F.col(id_col), grams_expr.alias("__grams")))
    base = with_grams.select(
        F.col(id_col), F.size("__grams").cast("bigint").alias("n_grams"))
    eval_grams = (word_shingles(eval_docs, id_col, text_col, n=n)
                  .select("shingle").distinct())
    nib = bloom_build(eval_grams, "shingle", m_bits=m_bits)
    exploded = with_grams.select(F.col(id_col),
                                 F.explode("__grams").alias("shingle"))
    survivors = bloom_prune(exploded, "shingle", nib, m_bits=m_bits)
    hits = (survivors
            .join(F.broadcast(eval_grams), "shingle", "left_semi")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint")
                 .alias("n_contaminated")))
    out = (base.join(hits, id_col, "left")
           .withColumn("n_contaminated",
                       F.coalesce("n_contaminated", F.lit(0))))
    ratio = F.when(
        F.col("n_grams") > 0,
        F.round(F.col("n_contaminated").cast("double")
                / F.col("n_grams"), 6)
    ).otherwise(F.lit(0.0))
    return (out.withColumn("contamination_ratio", ratio)
            .withColumn("contaminated",
                        F.col("contamination_ratio") >= flag_threshold))


def remove_boilerplate_lines(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             min_docs: int = 10, min_chars: int = 4,
                             delim: str = "\n") -> DataFrame:
    """LINE-level boilerplate removal — the CCNet/C4 cleanup step that
    document-level dedup cannot express: a nav header, cookie banner,
    or copyright footer repeats across thousands of otherwise-distinct
    pages, so the LINE is the duplication unit.  A line is boilerplate
    when its normalized form (lower + trim) appears in at least
    ``min_docs`` DISTINCT documents and carries at least ``min_chars``
    characters (very short lines — bullets, blanks — are structure,
    not boilerplate; counting them would shred every list).  Returns
    one row per input document: the text with boilerplate lines
    removed (original order and delimiter preserved) plus kept/dropped
    line counts.

    Scale shape: lines explode narrowly from the doc scan; the
    boilerplate census groups 8-byte ``xxhash64`` fingerprints, never
    line bodies (map-side combinable; a fingerprint collision could
    only merge two unrelated lines' counts — at 2^-64 per pair it is
    the standard trade the big pipelines make); the census output is
    only the above-threshold fingerprints — the heavy tail, small by
    construction — so the line-level anti-join broadcasts.  One
    census shuffle + one reassembly groupBy per corpus pass, both
    O(lines), nothing O(corpus^2)."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim, -1))
         .alias("__i", "__ln"))
    fp = F.xxhash64(F.lower(F.trim(F.col("__ln"))))
    lines = lines.withColumn("__fp", fp)
    boiler = (lines
              .filter(F.length(F.trim(F.col("__ln"))) >= min_chars)
              .groupBy("__fp")
              .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
              .filter(F.col("__nd") >= min_docs)
              .select("__fp"))
    kept = lines.join(boiler, "__fp", "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("__i", "__ln"))),
                            lambda s: s["__ln"]),
                        delim).alias("text_clean"),
                    F.count(F.lit(1)).cast("bigint").alias("n_kept")))
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_total"))
    return (totals.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    F.coalesce("n_kept", F.lit(0)).cast("bigint")
                     .alias("n_kept"),
                    (F.col("__n_total")
                     - F.coalesce("n_kept", F.lit(0))).cast("bigint")
                    .alias("n_dropped")))
