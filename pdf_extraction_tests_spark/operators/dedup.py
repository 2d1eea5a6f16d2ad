"""Deduplication operators over a document corpus.

All variants are declarative DataFrame plans (JVM-side, codegen'd); no UDFs.
The 48-bit cross-engine hash ``h48(s) = int(md5(s)[:12], 16)`` keeps every
operator exactly reproducible in DuckDB for the driver's oracle check.

Scale notes (100 TB):
* exact dedup = one shuffle on the digest — the minimum possible;
* MinHash signatures are computed scan-side per row (no shuffle), the LSH
  band join shuffles only (band_key -> doc) pairs, and candidate
  verification joins only within buckets;
* stop-shingle removal (drop shingles appearing in > max_df docs) bounds the
  n-gram self-join blowup — the standard trick for web-scale near-dup;
* all self-joins are strictly upper-triangular (doc_a < doc_b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def h48(col):
    """48-bit md5-derived hash as a Spark column (bigint, non-negative).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 12))::BIGINT``.
    """
    return F.expr(f"cast(conv(substr(md5({col}), 1, 12), 16, 10) as bigint)")


def _h48(col_expr) -> str:
    return f"cast(conv(substr(md5({col_expr}), 1, 12), 16, 10) as bigint)"


def _h48_duck(col_expr) -> str:
    """Same 48-bit hash in DuckDB dialect (no conv(); hex-literal cast)."""
    return f"('0x' || substr(md5({col_expr}), 1, 12))::BIGINT"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content digest: keep the min id, count dups.

    One hash-shuffle on the digest; at scale add
    ``.hint("rebalance")`` upstream if the corpus has giant identical docs.
    """
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# word-shingle helpers
# ---------------------------------------------------------------------------


def with_shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) pairs: distinct word n-grams per document.

    Built scan-side with split + transform + filter — no explode until the
    (smaller) distinct shingle set is formed per row.

    Round-7 measurement note: a ``concat_ws(element_at...)`` per-position
    form (no sub-array allocation) was tried and measured 2.1x SLOWER than
    this slice+array_join form in a same-session interleaved A/B at sf0.1
    (1.26 s vs 2.61 s on the q42 shape) — keep this one.
    """
    words = F.split(F.col(text_col), " ")
    k = F.size(words) - F.lit(n - 1)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
    )
    return (
        docs.filter(F.size(words) >= n)
        .select(F.col(id_col).alias("doc_id"), F.explode(shingles).alias("shingle"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# affine MinHash family over one base hash: h_i(x) = (a_i*h48(x) + b_i) mod M
# — one md5 per shingle instead of k (the standard universal-hash family).
# a_i < 2^14 and h48 < 2^48 keep a_i*h48 + b_i < 2^63 (no int64 overflow);
# M = 2^61-1 (Mersenne prime).  Same arithmetic is exact in DuckDB.
_MINHASH_M = (1 << 61) - 1
_MINHASH_A = [9973, 12007, 14009, 15013, 15607, 16001, 16183, 16369]
_MINHASH_B = [12345, 54321, 77777, 13579, 24680, 98765, 11111, 22222]


def minhash_signatures(docs: DataFrame, num_hashes: int = 8, shingle_n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature columns h0..h{k-1}.

    One 48-bit base hash per shingle; family members derived affinely
    (a_i*h + b_i mod M) — k-1 md5 computations saved per shingle row.
    Mins are plain groupBy aggregates; signatures never shuffle raw text
    (the exchange carries (doc_id, 6 partial mins) after map-side combine).

    Round-7 measurement note: a zero-exchange scan-side form
    (``array_min(transform(hash_array, ...))``) was tried and measured
    2.1x SLOWER same-session (2.69 s vs 1.28 s at sf0.1) — higher-order-
    function evaluation loses to the codegen'd explode + vectorized hash
    aggregate, and the exchange it saves is tiny.  Keep this shape.
    """
    pairs = with_shingles(docs, shingle_n, text_col, id_col).withColumn(
        "_h", h48("shingle")
    )
    aggs = [
        F.min(
            F.pmod(
                F.col("_h") * F.lit(_MINHASH_A[i]) + F.lit(_MINHASH_B[i]),
                F.lit(_MINHASH_M),
            )
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return pairs.groupBy("doc_id").agg(*aggs)


def shingles_sql(shingle_n: int = 3, table: str = "documents") -> str:
    """The DuckDB twin of :func:`with_shingles` — ONE definition shared by
    every oracle that shingles (minhash, q42/q43, the count-min sketch), so
    a semantics change cannot desynchronize them."""
    return (
        f"SELECT DISTINCT doc_id, array_to_string(arr[i:i+{shingle_n - 1}], ' ') AS shingle\n"
        f"      FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {table}\n"
        f"            WHERE len(string_split(text, ' ')) >= {shingle_n}) t,\n"
        f"           LATERAL (SELECT unnest(generate_series(1, len(arr) - {shingle_n - 1})) AS i) u"
    )


def minhash_sql(num_hashes: int = 8, shingle_n: int = 3,
                table: str = "documents") -> str:
    """DuckDB oracle for :func:`minhash_signatures`."""
    base = _h48_duck("shingle")
    parts = []
    for i in range(num_hashes):
        parts.append(
            f"min((({base}) * {_MINHASH_A[i]} + {_MINHASH_B[i]}) % {_MINHASH_M}) AS h{i}"
        )
    mins = ",\n           ".join(parts)
    return f"""
    SELECT doc_id,
           {mins}
    FROM (
      {shingles_sql(shingle_n, table)}
    ) s
    GROUP BY doc_id
    """


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4,
                        rows_per_band: int = 2) -> DataFrame:
    """LSH banding: docs agreeing on all hashes of any band become a
    candidate pair.  Shuffle is on (band, band_key) — tiny rows.  The band
    key is the band's hash values concatenated (cross-engine deterministic;
    on a pure-Spark deployment swap in xxhash64(*cols) to shrink the key).

    Pairs are generated per BUCKET (groupBy (band, bh) -> sorted id list ->
    upper-triangular explode), not by self-joining the banded frame: the
    self-join planned the entire signature pipeline TWICE (both join inputs
    re-scanned the corpus and recomputed every shingle md5 — visible as two
    identical subtrees in the round-7 before-plan), while this shape
    computes signatures once and shuffles only (band, bh, doc_id) rows.
    Output is identical: ids within a bucket are unique (one row per
    (doc, band)), so the sorted list's strict upper triangle is exactly
    the ``a.doc_id < b.doc_id`` join result, distinct across bands.
    Per-bucket state is the bucket's id list — bounded by bucket size, the
    same concentration the join shape put in one partition's hash table.

    Round-7 same-session A/B at sf0.1: 1.477 s (this shape) vs 1.504 s
    (self-join) wall — parity locally because the join's two duplicate
    subtrees ran on otherwise-idle cores; on a busy cluster the halved
    signature CPU is the win, and the plan provably scans the corpus once.
    """
    bk = banded_keys(signatures, bands, rows_per_band)
    buckets = (
        bk.groupBy("band", "bh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    lefts = buckets.select("ids", F.posexplode("ids").alias("i", "doc_a"))
    return (
        lefts.select(
            "doc_a",
            F.explode(
                F.slice(F.col("ids"), F.col("i") + F.lit(2), F.size("ids"))
            ).alias("doc_b"),
        )
        # a duplicated input id would make the sorted list emit (x, x),
        # which the old strict `a.doc_id < b.doc_id` join could never
        # produce — the filter restores exact parity for ANY input
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                        max_df: int = 50, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard over word n-gram sets for near-duplicate pairs.

    ``max_df`` drops stop-shingles (appearing in > max_df docs) before the
    self-join — bounding the quadratic blowup; at web scale this filter is
    what keeps the shuffle linear-ish in corpus size.
    """
    # NO cache: this function returns a lazy frame, so a cache here could
    # only be released by the caller (round-2 leak: one pinned shingle frame
    # per call, session lifetime).
    #
    # Round-7 shape (guide §2.4/§8): the old plan referenced the shingle
    # stream FOUR times (sizes, the df count, and both sides of a
    # rare-self-join), so the scan-side shingle expansion ran 4x and the
    # self-join shuffled the (doc, shingle) stream twice.  Now: per-doc
    # sizes come scan-side from size(shingle_array) (no explode at all),
    # and common counts come from per-shingle sorted id lists
    # (groupBy(shingle) -> upper-triangular pair explode, df <= max_df
    # bounding each list) — the shingle pipeline runs ONCE, one exchange
    # on shingle instead of a self-join.  Same-session A/B at sf0.1:
    # 4.22 s -> 2.60 s, result rows exactly equal.
    words = F.split(F.col(text_col), " ")
    k = F.size(words) - F.lit(n - 1)
    sh_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
    )
    base = docs.filter(F.size(words) >= n)
    sizes = base.select(F.col(id_col).alias("doc_id"), F.size(sh_arr).alias("sz"))
    sh = with_shingles(docs, n, text_col, id_col)
    grams = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_df))
    )
    lefts = grams.select("ids", F.posexplode("ids").alias("i", "doc_a"))
    pairs = lefts.select(
        "doc_a",
        F.explode(
            F.slice(F.col("ids"), F.col("i") + F.lit(2), F.size("ids"))
        ).alias("doc_b"),
    # duplicate-id guard: a repeated doc_id row would emit (x, x) pairs the
    # old strict-< self-join never produced; cross pairs keep the same
    # per-row multiplicity either way
    ).filter(F.col("doc_a") != F.col("doc_b"))
    common = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_common"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    # filter on the RAW similarity, round only for output — matching the
    # oracle SQL's WHERE-on-raw / SELECT-rounded shape (a value in
    # [threshold-5e-7, threshold) must fail on both engines)
    raw = F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(raw >= threshold)
        .withColumn("jaccard", F.round(raw, 6))
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Per-doc SimHash over word tokens (bit-majority of token hashes).

    The whole computation is one scan-side expression chain: token array ->
    per-bit +/-1 votes via aggregate -> sign -> packed integer.  No shuffle.
    """
    token_hash = _h48("concat('t:', w)")
    # hash each distinct token ONCE (md5 is the expensive part), then take
    # the per-bit +/-1 majorities over the integer array — 16x fewer md5s
    # than folding the raw tokens per bit
    hashes = F.expr(
        f"transform(array_distinct(split({text_col}, ' ')), w -> {token_hash})"
    )
    withh = docs.withColumn("_th", hashes)
    votes = [
        F.expr(
            f"aggregate(_th, 0, (acc, h) -> acc + "
            f"CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        )
        for b in range(bits)
    ]
    sig = None
    for b, v in enumerate(votes):
        term = F.when(v > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return withh.select(F.col(id_col).alias("doc_id"), sig.cast("bigint").alias("simhash"))


def simhash_sql(bits: int = 16, table: str = "documents") -> str:
    """DuckDB oracle for :func:`simhash`."""
    token_hash = _h48_duck("concat('t:', w)")
    terms = []
    for b in range(bits):
        terms.append(
            f"(CASE WHEN sum(CASE WHEN (({token_hash} >> {b}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) > 0 THEN {1 << b} ELSE 0 END)"
        )
    return f"""
    SELECT doc_id, CAST({' + '.join(terms)} AS BIGINT) AS simhash
    FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM {table}) t
    GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# duplicate clusters: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def _persistent_rdd_ids(sc) -> set:
    """Driver-side snapshot of the session's persistent RDD ids."""
    it = sc._jsc.getPersistentRDDs().keySet().iterator()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return out


def _unpersist_rdd_ids(sc, ids) -> None:
    """Release persistent RDDs by id (non-blocking); ids already reclaimed
    by the context cleaner are skipped."""
    jmap = sc._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


def release(df: DataFrame) -> None:
    """Explicitly release the checkpoint blocks backing a
    connected-components result.

    Needed because GC cannot do it: a ``localCheckpoint`` over a
    shuffle-bearing plan is never reclaimed by the context cleaner in this
    Spark build (measured — a shuffle-free checkpoint reclaims in seconds,
    a post-shuffle one survives 30+ GC cycles), so every CC result would
    otherwise pin its label-map blocks for the session lifetime.  The frame
    must not be used after release (its lineage was truncated by the
    checkpoint).  No-op for frames that pin nothing."""
    ids = getattr(df, "_pinned_rdd_ids", None)
    if ids:
        _unpersist_rdd_ids(df.sparkSession.sparkContext, ids)
        df._pinned_rdd_ids = ()


def connected_components(pairs: DataFrame, max_iter: int = 20,
                         checkpoint_every: int = 3) -> DataFrame:
    """(doc_a, doc_b) near-dup pairs -> (doc_id, cluster_id) with
    cluster_id = min doc id in the component (the canonical keeper).

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converges in at most
    the component diameter (dup clusters are shallow).  Per round: one
    join + one aggregate — all shuffles keyed on doc ids.  Early-exits
    when a round changes nothing; **raises** if ``max_iter`` rounds pass
    with labels still moving (max_iter is a safety valve, not a silent
    truncation — a wrong cluster_id would diverge from the exact oracle).
    Lineage is bounded: each round unpersists the superseded label frame
    and ``localCheckpoint``s every ``checkpoint_every`` rounds so the plan
    never grows 20 joins deep.  For web-scale graphs swap in the
    large-star/small-star algorithm; min-label is optimal for the tiny,
    dense components dedup produces.

    Block hygiene: the only persistent RDD alive after this returns is the
    final eager localCheckpoint backing the result — small (one row per
    clustered doc) but pinned until the caller passes the frame to
    :func:`release` (GC can NOT reclaim it; see release()).  Intermediate
    checkpoint blocks are released synchronously via a driver-side id
    diff — which assumes no CONCURRENT persist activity in the session
    while a call is in flight (true for this engine's batch entry points).
    """
    sc = pairs.sparkSession.sparkContext
    before_ids = _persistent_rdd_ids(sc)
    edges = (
        pairs.selectExpr("doc_a AS src", "doc_b AS dst")
        .unionByName(pairs.selectExpr("doc_b AS src", "doc_a AS dst"))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    prev = None
    prev_is_ckpt = False  # a localCheckpoint's blocks ARE its lineage — never unpersist
    changed = 0
    for it in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.col("nmin") < F.col("cluster_id")).alias("_changed"),
            )
        )
        is_ckpt = (it + 1) % checkpoint_every == 0
        if is_ckpt:
            # truncate lineage: without this the plan is `it` joins deep and
            # re-evaluation (or executor loss) replays the whole chain
            updated = updated.localCheckpoint(eager=False)
        else:
            updated = updated.cache()
        # one aggregation action per round (drives the cache/checkpoint fill)
        changed = updated.agg(
            F.sum(F.col("_changed").cast("int")).alias("n")
        ).collect()[0]["n"] or 0  # bounded-sample ok: single-row scalar aggregate
        if prev is not None and not prev_is_ckpt:
            prev.unpersist()
        prev, prev_is_ckpt = updated, is_ckpt
        labels = updated.drop("_changed")
        if changed == 0:
            break
    edges.unpersist()
    if changed:
        _unpersist_rdd_ids(sc, _persistent_rdd_ids(sc) - before_ids)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — component diameter exceeds "
            "max_iter; raise max_iter or use a large-star/small-star pass"
        )
    # hand the caller an eagerly-materialized copy, then release EVERY
    # persistent RDD this call created except the final checkpoint: the
    # cached frames via unpersist() (also clears their CacheManager
    # entries) and the intermediate localCheckpoint blocks by id
    pre_final = _persistent_rdd_ids(sc)
    labels = labels.localCheckpoint(eager=True)
    final_ids = _persistent_rdd_ids(sc) - pre_final
    if prev is not None and not prev_is_ckpt:
        prev.unpersist()
    _unpersist_rdd_ids(
        sc, (_persistent_rdd_ids(sc) - before_ids) - final_ids)
    labels._pinned_rdd_ids = tuple(sorted(final_ids))
    return labels


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node u connects its LARGER neighbors to
    min(neighborhood ∪ {u})."""
    mins = (
        edges.groupBy("src").agg(F.min("dst").alias("_mn"))
        .select("src", F.least("_mn", "src").alias("m"))
    )
    return (
        edges.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges large->small, then every node u
    connects its smaller neighbors (and itself) to the minimum."""
    e = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    mins = e.groupBy("src").agg(F.min("dst").alias("m"))
    rewired = (
        e.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select("src", F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return rewired


def connected_components_star(pairs: DataFrame, max_iter: int = 25,
                              checkpoint_every: int = 2) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    — the WEB-SCALE path (O(log^2 n) rounds independent of component
    diameter, vs min-label propagation's diameter-bound rounds).

    Same contract as :func:`connected_components`: (doc_a, doc_b) pairs ->
    (doc_id, cluster_id=min id of the component); raises if the edge set is
    still changing after ``max_iter`` rounds.  Equivalence against the
    min-label implementation is pinned in tests/test_operators.py.
    Block hygiene matches connected_components: only the final label-map
    checkpoint survives the call.
    """
    sc = pairs.sparkSession.sparkContext
    before_ids = _persistent_rdd_ids(sc)
    # nodes is consumed exactly once (the final left join) — no cache
    nodes = (
        pairs.selectExpr("doc_a AS doc_id")
        .unionByName(pairs.selectExpr("doc_b AS doc_id"))
        .distinct()
    )
    edges = (
        pairs.selectExpr("doc_a AS src", "doc_b AS dst")
        .unionByName(pairs.selectExpr("doc_b AS src", "doc_a AS dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    prev, prev_is_ckpt = None, False
    converged = False
    for it in range(max_iter):
        # one round = large-star (both orientations in) then small-star
        both = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        new_edges = _small_star(_large_star(both).unionByName(both))
        if (it + 1) % checkpoint_every == 0:
            new_edges = new_edges.localCheckpoint(eager=False)
        else:
            new_edges = new_edges.cache()
        # converged when the (canonically oriented) edge set is unchanged
        old_canon = edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).distinct()
        delta = (
            new_edges.exceptAll(old_canon)
            .unionByName(old_canon.exceptAll(new_edges))
            .limit(1)
            .count()
        )
        if prev is not None and not prev_is_ckpt:
            prev.unpersist()
        prev, prev_is_ckpt = new_edges, (it + 1) % checkpoint_every == 0
        edges = new_edges
        if delta == 0:
            converged = True
            break
    if not converged:
        _unpersist_rdd_ids(sc, _persistent_rdd_ids(sc) - before_ids)
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # materialize the (small) label map eagerly, then release every
    # persistent RDD this call created except that final checkpoint —
    # otherwise each call leaks its cached/checkpointed edge rounds until
    # GC + context-cleaner get around to them
    pre_final = _persistent_rdd_ids(sc)
    labels = (
        edges.groupBy("src").agg(F.min("dst").alias("cluster_id"))
        .localCheckpoint()  # eager
    )
    final_ids = _persistent_rdd_ids(sc) - pre_final
    edges.unpersist()
    _unpersist_rdd_ids(
        sc, (_persistent_rdd_ids(sc) - before_ids) - final_ids)
    # out is lazy over the labels checkpoint — the pin travels with it
    # (see release())
    out = (
        nodes.join(labels, nodes.doc_id == labels.src, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    out._pinned_rdd_ids = tuple(sorted(final_ids))
    return out


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Cosine near-duplicate pairs among embeddings (upper-triangular).

    Brute-force O(n^2) — correct baseline; the LSH-bucketed variant in
    :mod:`.similarity` is the scale path.  Cosine is computed in double
    precision via zip_with + aggregate (JVM-side, no UDF).

    Round-7: each vector's norm is computed ONCE in the a/b projections
    (per input row) instead of per output pair — the norm is a
    deterministic sequential fold over one vector, so its double value is
    bit-identical wherever it is evaluated, and the per-pair work drops
    from three 64-element folds to one (guide §1.2 step 2).
    """
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
                   ).withColumn("_na", norm("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
                   ).withColumn("_nb", norm("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    raw = dot / (F.col("_na") * F.col("_nb"))  # filter raw, round for output
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(raw >= threshold)
        .withColumn("cosine", F.round(raw, 6))
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dups_bucketed(emb: DataFrame, threshold: float = 0.95,
                                 bits: int = 3, bands: int = 2, seed: int = 42,
                                 dim: int = 64, id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """Cosine near-duplicate pairs via sign-LSH bucketing — the 100 TB path.

    Candidate generation is the same banded shape as MinHash-LSH: per band
    an independent hyperplane set buckets every vector scan-side (pure
    column expressions, :func:`..similarity.lsh_bucket_expr`), the self-join
    shuffles only (band, bucket, id) rows and touches same-bucket pairs
    only (~n^2 / 2^bits per band instead of n^2), then candidates are
    verified with the exact cosine (filter on RAW, round for output).
    Recall rises with ``bands`` and falls with ``bits``; at the real-dedup
    operating point (cosine >= 0.95, i.e. angle <= 18deg) a bit agrees with
    probability ~0.9, so 2 bands x 3 bits give ~86% recall and each extra
    band multiplies the miss rate by ~0.27.  Fully SQL-expressible —
    :func:`embedding_near_dups_bucketed_sql` is the exact DuckDB oracle.
    """
    from .similarity import hyperplanes, lsh_bucket_expr

    band_cols = [
        lsh_bucket_expr(hyperplanes(dim, bits, seed + 1000 * i), vec_col)
        .alias(f"band{i}")
        for i in range(bands)
    ]
    sig = emb.select(F.col(id_col).alias("doc"), *band_cols)
    bands_arr = F.array(*[
        F.struct(F.lit(i).alias("band"), F.col(f"band{i}").alias("bucket"))
        for i in range(bands)
    ])
    exploded = sig.select("doc", F.explode(bands_arr).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
    )
    # bucket-pair generation (round-7, same rewrite as lsh_candidate_pairs):
    # the aliased self-join planned the hyperplane bucketing twice; this
    # computes it once and emits the identical strict-upper-triangle pairs
    buckets = (
        exploded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    lefts = buckets.select("ids", F.posexplode("ids").alias("i", "id_a"))
    cand = (
        lefts.select(
            "id_a",
            F.explode(
                F.slice(F.col("ids"), F.col("i") + F.lit(2), F.size("ids"))
            ).alias("id_b"),
        )
        # duplicate-id guard: parity with the old strict-< join (see
        # lsh_candidate_pairs)
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    # per-vector norms computed once (value-identical deterministic fold),
    # so candidate verification pays one 64-element fold per pair, not three
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
                    ).withColumn("_na", norm("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
                    ).withColumn("_nb", norm("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    raw = dot / (F.col("_na") * F.col("_nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(raw >= threshold)
        .withColumn("cosine", F.round(raw, 6))
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dups_bucketed_sql(threshold: float = 0.95, bits: int = 3,
                                     bands: int = 2, seed: int = 42,
                                     dim: int = 64,
                                     table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`embedding_near_dups_bucketed` (identical
    literal hyperplanes, identical banded candidate join, WHERE on the raw
    cosine / rounded in the SELECT)."""
    from .similarity import hyperplanes, lsh_bucket_sql

    band_exprs = ",\n           ".join(
        f"{lsh_bucket_sql(hyperplanes(dim, bits, seed + 1000 * i), 'e')} AS band{i}"
        for i in range(bands)
    )
    band_rows = "\n      UNION ALL ".join(
        f"SELECT vec_id, {i} AS band, band{i} AS bucket FROM sig"
        for i in range(bands)
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM {table}),
    sig AS (SELECT vec_id,
           {band_exprs}
            FROM v),
    bk AS (
      {band_rows}),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bk a JOIN bk b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, round(cos, 6) AS cosine FROM (
      SELECT id_a, id_b,
             list_dot_product(va.e, vb.e)
               / (sqrt(list_dot_product(va.e, va.e))
                  * sqrt(list_dot_product(vb.e, vb.e))) AS cos
      FROM cand
      JOIN v va ON va.vec_id = cand.id_a
      JOIN v vb ON vb.vec_id = cand.id_b) t
    WHERE cos >= {threshold}
    """


def minhash_jaccard_estimate(signatures: DataFrame, pairs: DataFrame,
                             num_hashes: int = 8) -> DataFrame:
    """Estimate Jaccard similarity for candidate pairs FROM SIGNATURES ONLY
    (est = fraction of agreeing MinHash components — the unbiased MinHash
    estimator).  At scale this replaces the exact shingle re-join
    (:func:`ngram_jaccard_pairs`) for triage: the join touches k integers
    per doc instead of its shingle set, so verification cost is independent
    of document length.  Bias/variance: Var = J(1-J)/k.
    """
    a = signatures.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    b = signatures.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_hashes)],
    )
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(num_hashes)
    )
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(matches / F.lit(num_hashes), 6).alias("jaccard_est"),
        )
    )
# ---------------------------------------------------------------------------
# incremental LSH: near-dup dedup of a GROWING corpus against a persisted
# signature index (round-4 verdict item 5).  The index is a snapshot table
# (snapshots.py) of banded signature keys, so reads pin the PRE-append data
# dirs via the manifest — the delta never pairs against its own append.
# ---------------------------------------------------------------------------


def banded_keys(signatures: DataFrame, bands: int = 4,
                rows_per_band: int = 2) -> DataFrame:
    """Signature frame -> exploded (doc_id, band, bh) band keys — the unit
    the LSH join and the persisted index share."""
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}")
                for r in range(rows_per_band)]
        band_cols.append(F.struct(
            F.lit(b).alias("band"), F.concat_ws("_", *cols).alias("bh")))
    return signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.bh").alias("bh"))


def lsh_index_append(spark, index_dir: str, new_docs: DataFrame,
                     num_hashes: int = 8, shingle_n: int = 3,
                     bands: int = 4, rows_per_band: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     tag: str | None = None) -> DataFrame:
    """Incrementally dedup ``new_docs`` against a persisted LSH index and
    append the delta's signatures: returns candidate pairs WITHIN the
    delta plus delta-vs-index, then commits the delta's band keys as a new
    snapshot of ``index_dir``.

    Contract (pinned in tests/test_lsh_incremental.py): feeding a corpus
    in any batch split and unioning each call's pairs equals
    ``lsh_candidate_pairs`` over the whole corpus in one batch.

    Scale: signatures are scan-side; the index join touches only matching
    (band, bh) buckets; the index grows by exactly the delta's band keys
    (bands x delta rows) per call — never recomputed.  The returned frame
    must be consumed (or checkpointed) by the caller before the NEXT
    append if lazy evaluation would otherwise outlive the manifest read:
    read_snapshot pins data dirs, so even that is safe until an
    ``expire_snapshots`` reclaims the old version.

    Concurrency: when another ingest wins the snapshot version, the
    WHOLE read-join-commit cycle retries against the fresh manifest —
    retrying only the commit would silently miss cross pairs against the
    winner's delta (the Iceberg optimistic-commit contract, applied to
    the semantic unit rather than the write alone).

    ``tag`` makes the call REPLAY-IDEMPOTENT (streaming foreachBatch
    epochs): a replayed tag finds its snapshot already committed, skips
    the append, and computes pairs against that snapshot's PARENT — the
    exact result of the original call, not a duplicate ingest.
    """
    from ..snapshots import (ConcurrentCommitError, commit_snapshot,
                             list_snapshots, read_snapshot)

    sigs = minhash_signatures(new_docs, num_hashes, shingle_n,
                              text_col, id_col)
    delta = banded_keys(sigs, bands, rows_per_band)
    for attempt in range(5):
        replayed = None
        if tag is not None:
            replayed = next((m for m in list_snapshots(index_dir)
                             if m.get("tag") == tag), None)
        old = (read_snapshot(spark, index_dir, version=replayed["parent"])
               if replayed is not None and replayed["parent"]
               else None if replayed is not None
               else read_snapshot(spark, index_dir))

        a, b = delta.alias("a"), delta.alias("b")
        within = (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
        )
        pairs = within
        if old is not None:
            n, o = delta.alias("n"), old.alias("o")
            cross = (
                n.join(o, (F.col("n.band") == F.col("o.band"))
                       & (F.col("n.bh") == F.col("o.bh"))
                       & (F.col("n.doc_id") != F.col("o.doc_id")))
                .select(
                    F.least(F.col("n.doc_id"),
                            F.col("o.doc_id")).alias("doc_a"),
                    F.greatest(F.col("n.doc_id"),
                               F.col("o.doc_id")).alias("doc_b"))
            )
            pairs = pairs.unionByName(cross)
        if replayed is not None:
            return pairs.distinct()  # already durable: recompute only
        # append AFTER building the plans: read_snapshot above already
        # pinned the pre-append data dirs through its manifest, so the
        # commit cannot leak the delta into its own candidate join
        try:
            commit_snapshot(delta, index_dir, mode="append",
                            partition_by=["band"], tag=tag)
            return pairs.distinct()
        except ConcurrentCommitError:
            continue  # re-read: the winner's delta must join as `old`
    raise ConcurrentCommitError(
        f"lsh_index_append lost the commit race 5 times on {index_dir}")
