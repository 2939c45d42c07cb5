"""Deduplication operators for training-data pipelines, Spark-first.

Five tiers, each a DataFrame -> DataFrame transform (no collects, no
row-at-a-time Python). Oracled variants over the driver testdata live in
queries.py; these are the reusable library forms over any (id, text) or
(id, vector/phash) input.

1. exact            — hash groupBy on normalized content
2. minhash_lsh      — shingle -> minhash -> band -> bucket self-join
3. simhash          — bit-majority hash + hamming-ball candidate pairs
4. ngram_jaccard    — exact Jaccard verify over shingle sets
5. embedding_cosine — cosine near-dup pairs over vectors (see
                      similarity.py for the top-k search variants)

Plus the RESOLUTION step every near-dup tier feeds: candidate PAIRS are
not a deduped corpus — ``connected_components`` reduces the pair graph
to clusters (alternating large-star/small-star min-id propagation,
O(log n) keyed self-join rounds, no driver state beyond a convergence
scalar), ``dedup_resolve`` maps every node to its cluster's canonical
(min) id, and ``dedup_keep`` drops the non-canonical rows — the actual
"remove the duplicates" step of a training-data pipeline.

Scale notes: every self-join here is bucketed by a band/bucket key so
the shuffle is keyed and skew-bounded; pair explosion is controlled by
band width (minhash), hamming radius (simhash), or a candidate prefilter
(jaccard uses rare-shingle blocking at scale — the `max_df` knob drops
shingles present in more than a fraction of docs, the standard trick to
keep candidate generation near-linear).

Bucket-size cap: a banded self-join emits O(|bucket|^2) pairs per
(band, bkey) bucket, and on a boilerplate-heavy web corpus (templated
pages, near-identical signatures) a single band key can hold 1e5-1e7
docs — AQE skew-join splits the *input* partition but cannot shrink a
quadratic *output*. Every banded operator here therefore takes
``max_bucket`` (default 500): buckets larger than that are DROPPED
deterministically before the join. This is safe by design — an
over-cap bucket means (nearly) identical signatures, which is
exact-dup-shaped content that ``dedup_exact`` is the intended
pre-collapse companion for; run it first so near-identical mass never
reaches the LSH stage. Use ``overcap_buckets`` to observe what a cap
would drop (count + coverage) — bench's dedup_scale leg logs bucket
p100 and the dropped-bucket count per run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint_col, ngrams_col, tokens_col


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per normalized content; first (min id) wins."""
    fp = fingerprint_col(F.col(text_col))
    w = df.withColumn("_fp", fp)
    keep = w.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return w.join(keep, [id_col, "_fp"], "left_semi").drop("_fp")


def _cap_buckets(buckets: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop (band, bkey) buckets with more than ``max_bucket`` members.

    Deterministic whole-bucket drop (never a sample): the pair output
    stays reproducible and the semantics are crisp — "signatures this
    common carry no near-dup evidence beyond exact-dup, which
    ``dedup_exact`` already handles". r7 plan shape: the OVER-cap key
    set is computed with one keyed count (map-side partial agg — the
    exchange carries (band, bkey, partial count) triples, not rows)
    and anti-joined back as a BROADCAST — over-cap buckets are rare by
    construction (at most n/max_bucket keys exist, and only
    boilerplate-shaped ones are over the cap), so the big bucket
    relation is filtered map-side without the extra keyed semi-join
    exchange the previous shape paid (guide §3.1)."""
    if max_bucket is None:
        return buckets
    over = overcap_buckets(buckets, max_bucket).select("band", "bkey")
    return buckets.join(F.broadcast(over), ["band", "bkey"], "left_anti")


def _bucket_pairs(
    buckets: DataFrame, id_col: str, extra_cols: list[str]
) -> DataFrame:
    """Grouped in-place pair generation for banded LSH (r7 shape shared
    by minhash/simhash/phash): ONE groupBy(band, bkey) collects each
    bucket's members as a sorted list (callers cap bucket size FIRST
    via ``_cap_buckets``, so the list is bounded by ``max_bucket``; an
    uncapped caller accepts the quadratic pair output, which dominates
    the list itself), and a bucket of n members emits exactly its
    n(n-1)/2 ordered pairs via posexplode + suffix slice — the same
    {(a, b) : a.id < b.id} set the old bucket self-join produced, with
    one keyed exchange instead of the self-join's two shuffle legs
    (guide §2.4/§3). Output: ``a``/``b`` struct columns (fields ``_id``
    + ``extra_cols``) for the caller to verify/project."""
    mem = F.struct(F.col(id_col).alias("_id"), *[F.col(c) for c in extra_cols])
    grouped = (
        buckets.groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_list(mem)).alias("mem"))
        .where(F.size("mem") >= 2)
    )
    return grouped.select(F.posexplode("mem").alias("_i", "a"), "mem").select(
        "a",
        F.explode(F.slice("mem", F.col("_i") + 2, F.size("mem"))).alias("b"),
    )


def overcap_buckets(buckets: DataFrame, max_bucket: int) -> DataFrame:
    """Diagnostic: (band, bkey, bucket_size) for every bucket a
    ``max_bucket`` cap would drop. Callers log ``.count()`` (dropped
    buckets) and ``agg(max(bucket_size))`` (p100) next to the capped
    run; bench_dedup_scale does exactly that."""
    return (
        buckets.groupBy("band", "bkey")
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket)
    )


def _minhash_sigs(
    df: DataFrame, id_col: str, text_col: str, k: int, shingle_n: int
) -> DataFrame:
    """k minhash values per doc over word-shingle sets via xxhash64 with
    k seeds (JVM-side, no UDF).

    r7 note (measured, kept as-is): a zero-shuffle rewrite
    (array_min over transform(xxhash64) per row) was tried and REVERTED
    — at 101k docs the interpreted higher-order lambdas measured ~2x
    slower (sigs noop 1.6-2.1 s here vs 2.8-5.1 s map-side; full LSH
    3.8-4.1 s vs 6.6-6.9 s) than this explode shape, whose xxhash64 and
    16 min aggregates all run in whole-stage codegen over fixed-width
    longs. (The REGISTRY's md5-string variant went the other way — its
    old shape sort-aggregated strings; see queries.minhash_signatures.)
    Guide §1.1: empirical loop beats the "ideal" shuffle-free plan."""
    sh = df.select(
        F.col(id_col), F.explode(ngrams_col(F.col(text_col), shingle_n)).alias("sh")
    ).distinct()
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(1000003 * i))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def dedup_minhash_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Candidate near-dup pairs: docs colliding in >=1 LSH band.

    bands * rows_per_band == num_hashes; with 16 hashes in 4 bands the
    collision threshold is ~ (1/bands)^(1/rows) ~ 0.7 Jaccard.
    ``max_bucket`` drops over-cap band buckets (see module docstring);
    run ``dedup_exact`` first so identical content never lands here."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = _minhash_sigs(df, id_col, text_col, num_hashes, shingle_n)
    # band key = hash of the band's signature slice -> explode to
    # (band_id, band_key, id) then self-join per band bucket
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bkey"),
        )
        for b in range(bands)
    ]
    buckets = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    buckets = _cap_buckets(buckets, max_bucket)
    return (
        _bucket_pairs(buckets, id_col, [])
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def dedup_simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    max_bucket: int | None = 500,
) -> tuple[DataFrame, DataFrame]:
    """(signatures, candidate_pairs): SimHash + banded hamming blocking.

    Signature: per-bit majority over token hashes. Candidates: split the
    signature into (max_hamming+1) bands — any pair within the hamming
    radius must agree exactly on >=1 band (pigeonhole), so a per-band
    equality self-join finds all of them; verify with bit_count.
    ``max_bucket`` drops over-cap band buckets (module docstring)."""
    # signature stage deliberately stays explode + groupBy: a zero-
    # shuffle per-row rewrite (array bit counts) was measured SLOWER
    # (interpreted higher-order lambdas vs codegen'd hash + sum aggs
    # here — see queries.simhash16 r7 note); the r7 win in this
    # operator is the banded pair stage below (_bucket_pairs).
    tok = df.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("t"))
    h = tok.withColumn("h", F.xxhash64("t"))
    bit_sums = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    per_doc = h.groupBy(id_col).agg(*bit_sums)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    sigs = per_doc.select(F.col(id_col), sig.alias("simhash"))

    n_bands = max_hamming + 1
    band_width = bits // n_bands
    mask = (1 << band_width) - 1
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * band_width)
            .bitwiseAND(F.lit(mask))
            .alias("bkey"),
        )
        for b in range(n_bands)
    ]
    buckets = sigs.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    buckets = _cap_buckets(buckets, max_bucket)
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    pairs = (
        _bucket_pairs(buckets, id_col, ["simhash"])
        .where(ham <= max_hamming)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
    return sigs, pairs


def dedup_ngram_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: float | None = 0.5,
) -> DataFrame:
    """Exact Jaccard near-dup pairs over shingle sets.

    Candidate generation blocks on shared shingles; `max_df` drops
    shingles occurring in more than that fraction of docs (stopword
    shingles generate quadratic candidates without adding evidence —
    a dropped shingle only lowers measured Jaccard for pairs that were
    below threshold anyway at web scale)."""
    # r7 plan (the registry ngram_jaccard_pairs shape): per-doc distinct
    # shingles via array_distinct in the map pass (no .distinct()
    # exchange), then ONE groupBy(sh) collects each shingle's sorted
    # posting list, from which df-filtering (size(ids) <= max_df*n),
    # per-doc sizes (re-explode) and intersection counts (suffix pair
    # generation) all derive — the dfreq aggregate + broadcast semi-join
    # + two-legged self-join collapse into one keyed exchange whose
    # shuffle files both consumers reuse (ReusedExchange, guide §2.4).
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_col(F.col(text_col), shingle_n))).alias(
            "sh"
        ),
    )
    grouped = sh.groupBy("sh").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    if max_df is not None:
        n_docs = df.count()
        grouped = grouped.where(F.size("ids") <= int(max_df * n_docs))
    sizes = (
        grouped.select(F.explode("ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("sz"))
    )
    inter = (
        grouped.where(F.size("ids") >= 2)
        .select(F.posexplode("ids").alias("_i", "id_a"), "ids")
        .select(
            "id_a",
            F.explode(
                F.slice("ids", F.col("_i") + 2, F.size("ids"))
            ).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair graph -> one row per
    node: (node, component) where component = the MIN node id in its
    component.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — each
    round is two keyed groupBy+join passes over the edge set, and the
    edge set converges to stars rooted at each component's minimum in
    O(log n) rounds. Scale shape: no driver-side state beyond one
    convergence checksum per round; every pass shuffles on a node key
    (skew-bounded — a large-star pass splits high-degree stars instead
    of growing them); lineage is truncated per round with
    ``localCheckpoint`` so the iterative plan never compounds. This is
    the standard formulation for web-scale graphs (trillions of edges);
    a 100 TB corpus's near-dup pair graph is far below that.
    """
    # Constraint propagation is a pure optimizer inference (never changes
    # results) and is OFF for the duration of the star iterations: the
    # alternating passes union/join plans that SHARE attribute ids (self-
    # unions over the checkpointed edge set), and Spark 4.1's
    # UnionBase.rewriteConstraints can crash on such plans with
    # "NoSuchElementException: key not found: <attr>" depending on which
    # expression ids upstream plans happened to mint. The final result is
    # localCheckpoint-ed before the previous setting is restored so no
    # constraint-fragile union escapes this function; inputs here are
    # checkpointed RDDs, so nothing useful is inferable anyway.
    spark = pairs.sparkSession
    _CP_KEY = "spark.sql.constraintPropagation.enabled"
    try:
        prev_cp = spark.conf.get(_CP_KEY)
    except Exception:
        prev_cp = None
    spark.conf.set(_CP_KEY, "false")
    try:
        return _connected_components_inner(pairs, src, dst, max_iters)
    finally:
        if prev_cp is None:
            spark.conf.unset(_CP_KEY)
        else:
            spark.conf.set(_CP_KEY, prev_cp)


def _connected_components_inner(
    pairs: DataFrame, src: str, dst: str, max_iters: int
) -> DataFrame:
    e = (
        pairs.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def _checksum(edges: DataFrame):
        # bit_xor: order-insensitive and overflow-free under ANSI mode
        row = edges.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def _large_star(edges: DataFrame) -> DataFrame:
        # symmetric view; for each node u, every strictly-larger
        # neighbor repoints at min(N(u) ∪ {u})
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.withColumn("m", F.least(F.col("mn"), F.col("u"))).select("u", "m")
        return (
            sym.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(edges: DataFrame) -> DataFrame:
        # orient edges toward the larger endpoint; each node's smaller
        # neighbors (and itself) repoint at the minimum neighbor
        ori = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = ori.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = (
            ori.join(mins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        selfs = mins.select(F.col("u"), F.col("m").alias("v"))
        return nbrs.union(selfs).where(F.col("u") != F.col("v")).distinct()

    prev = _checksum(e)
    for _ in range(max_iters):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        cur = _checksum(e2)
        e = e2
        if cur == prev:  # fixpoint: pure stars rooted at component minima
            break
        prev = cur
    # converged edges are (node -> component min); the roots map to
    # themselves so every node present in `pairs` gets exactly one row
    roots = e.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    # materialized while constraint propagation is off (see wrapper): the
    # caller receives a plain LogicalRDD, never a shared-id self-union
    return members.union(roots).distinct().localCheckpoint()


def dedup_resolve(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Candidate near-dup PAIRS -> (doc_id, canonical_id): every doc in
    any pair maps to its cluster's min id (the canonical survivor —
    min-id-wins, matching ``dedup_exact``). Docs not in any pair are
    their own canonical and simply don't appear (callers left-join)."""
    return connected_components(pairs, src, dst).select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
    )


def dedup_keep(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """The 'drop the duplicates' step: keep only canonical docs — rows
    whose id never appears as a non-canonical member of a near-dup
    cluster. The resolved loser set is O(duplicates) and anti-joined
    against the corpus with left_anti and NO broadcast hint — web-crawl
    dup rates of 30-50% are routine, so the loser side is often NOT
    broadcast-sized; AQE picks SMJ vs broadcast from the measured size."""
    losers = (
        dedup_resolve(pairs)
        .where(F.col("doc_id") != F.col("canonical_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def dedup_phash_hamming(
    df: DataFrame,
    id_col: str,
    phash_col: str = "phash",
    max_hamming: int = 6,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance —
    the multimodal dedup the crawl engine's images table feeds. Same
    pigeonhole banding as dedup_simhash over the 64-bit phash;
    ``max_bucket`` drops over-cap band buckets (module docstring) —
    flat-color/logo images collapse to a handful of phash values at
    web scale and would otherwise emit quadratic pairs."""
    bits, n_bands = 64, max_hamming + 1
    band_width = bits // n_bands
    mask = (1 << band_width) - 1
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col(phash_col), b * band_width)
            .bitwiseAND(F.lit(mask))
            .alias("bkey"),
        )
        for b in range(n_bands)
    ]
    buckets = df.select(
        F.col(id_col), F.col(phash_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, phash_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    buckets = _cap_buckets(buckets, max_bucket)
    ham = F.bit_count(F.col(f"a.{phash_col}").bitwiseXOR(F.col(f"b.{phash_col}")))
    return (
        _bucket_pairs(buckets, id_col, [phash_col])
        .where(ham <= max_hamming)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )
