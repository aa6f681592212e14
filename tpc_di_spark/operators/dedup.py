"""Document deduplication operators for training-data pipelines.

Four tiers, all DataFrame-native and shuffle-conscious:

- exact:      hash-groupBy on a normalized fingerprint (one shuffle).
- n-gram Jaccard: exact set similarity via shingle explode + pair count —
  quadratic only within shingle buckets, used at small/medium scale or as
  the verifier behind MinHash candidates.
- MinHash+LSH: signature -> band -> bucket-join; candidate generation is
  linear in corpus size, the classic 100TB-dedup shape.
- SimHash:    64-bit near-dup signature; Hamming-ball lookup via band
  equality on bit slices.

All hashing is xxhash64 with integer seeds — deterministic across runs
and cluster sizes; no Python in the hot path (everything is Column
expressions over exploded token arrays).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def normalize_text(c) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.coalesce(c, F.lit("")))), r"\s+", " ")


def invocation_scoped(df: DataFrame) -> DataFrame:
    """Make a to-be-persisted plan unique per operator invocation.

    Spark's CacheManager substitutes cached data by CANONICALIZED
    analyzed-plan equality — across DataFrames and across queries in the
    same session. Two invocations of an operator over the same source
    therefore share one cache entry, which would let a later benchmark
    query silently reuse an earlier query's cached intermediate (its
    timed region then skips the computation it claims to measure). A
    per-invocation literal embedded in the plan (projected away
    immediately — the optimizer prunes it, so there is no runtime cost)
    breaks that equality: caching still serves every consumer INSIDE one
    invocation, and never anyone outside it."""
    import uuid

    c = f"_inv_{uuid.uuid4().hex[:8]}"
    return df.withColumn(c, F.lit(uuid.uuid4().hex)).drop(c)


def spread_small_input(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition a NARROW input up to the session's parallelism before
    heavy per-row compute (tokenization, shingling, hyperplane dots).

    A small corpus arrives as one parquet file -> ONE scan partition, and
    every downstream expression then runs single-threaded (measured: q23's
    5000-doc shingle pass was a 5.5s single-task stage on a 32-core
    session). Scale-adaptive: inputs already at/above the session's
    parallelism pass through untouched — at 100TB the scan is thousands of
    partitions and this is a no-op. Hash-partitioned on the id (not
    round-robin) so the shuffle is deterministic under task retries and a
    downstream groupBy(id) can reuse the exchange."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in key_cols])


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the smallest id per identical normalized text. One shuffle."""
    fp = F.xxhash64(normalize_text(F.col(text_col))).alias("fp")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs: n-word shingles of the normalized text.
    Documents shorter than n words contribute their full token string."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    ngrams = F.when(
        F.size(toks) < n, F.array(F.array_join(toks, " "))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )
    return spread_small_input(df, id_col).select(
        F.col(id_col).alias("doc"), F.explode(F.array_distinct(ngrams)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (doc_a < doc_b, sim >=
    threshold). Pair generation joins on shared shingles, so cost is
    bounded by shingle-bucket co-occurrence, not |corpus|^2; at web scale
    run it behind MinHash-LSH candidates instead.
    """
    # Persist the shingle set: it feeds FOUR otherwise-independent
    # subtrees (both self-join sides + both size lookups), and Catalyst
    # does not reuse exchanges across broadcast builds — without the
    # cache the regex tokenization + shingling (the dominant per-row
    # compute) runs four times per invocation (plan-verified:
    # plans/r07/q23_before.txt has four Generate+Scan subtrees).
    # MEMORY_AND_DISK, sized O(corpus shingles) — fine at the small/
    # medium scale this exact verifier is documented for; the 100TB path
    # is MinHash-LSH.
    sh = invocation_scoped(word_shingles(df, id_col, text_col, n)).persist()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc": "doc_a", "sz": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "sz": "sz_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def md5_hash64(c, seed) -> F.Column:
    """Portable 60-bit hash: int of the first 15 hex chars of
    md5('<seed>|' || value). Bit-identical in Spark and DuckDB (oracle-
    checkable); slower than xxhash64, so the xxhash64 family remains the
    default at scale."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), c)), 1, 15), 16, 10
    ).cast("long")


def _seeded_hash(c, seed, hash_fn: str) -> F.Column:
    if hash_fn == "md5":
        return md5_hash64(c, seed)
    return F.xxhash64(c, F.lit(seed))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: for hash seed k, min over shingles
    of hash(shingle, k). One explode + one groupBy; signature is an
    array<long> column."""
    sh = word_shingles(df, id_col, text_col, n)
    mins = [
        F.min(_seeded_hash(F.col("shingle"), k, hash_fn)).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    sig = sh.groupBy("doc").agg(*mins)
    # Persist the signatures: one row per doc (num_hashes longs — tiny
    # relative to the corpus), but the DAG above them (shingle explode +
    # 64 min-aggregations) is the pipeline's dominant compute, and every
    # downstream composition reads them several times (the LSH self-join
    # builds its broadcast side separately, and the Jaccard estimate
    # joins them twice more) — without the cache each read re-runs the
    # whole signature computation.
    return invocation_scoped(
        sig.select(
            "doc", F.array(*[F.col(f"h{k}") for k in range(num_hashes)]).alias("signature")
        )
    ).persist()


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.
    Explode to (band, bucket) keys, self-join per bucket — candidate
    generation is linear + per-bucket quadratic, the scalable path."""
    band_cols = [
        _seeded_hash(
            F.concat_ws(",", *[F.col("signature")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)]),
            f"band{b}",
            hash_fn,
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = signatures.select("doc", *band_cols)
    stacked = banded.select(
        "doc",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bucket")) for b in range(bands)])
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    stacked = invocation_scoped(stacked).persist()
    # Persisted: the self-join's probe and (broadcast) build sides are
    # independent subtrees to Catalyst, so without the cache the banding
    # — and the signature DAG underneath when the caller's signatures
    # aren't cached — computes twice.
    a, b = stacked.alias("a"), stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_jaccard_estimate(signatures: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of equal signature
    positions."""
    sa = signatures.withColumnsRenamed({"doc": "doc_a", "signature": "sig_a"})
    sb = signatures.withColumnsRenamed({"doc": "doc_b", "signature": "sig_b"})
    j = pairs.join(sa, "doc_a").join(sb, "doc_b")
    eq = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return j.select(
        "doc_a", "doc_b", (eq / F.size(F.col("sig_a"))).alias("jaccard_est")
    )


def simhash64(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hash_fn: str = "xxhash64",
    bits: int = 64,
) -> DataFrame:
    """SimHash over word tokens: per bit, sign of the sum of (+1/-1)
    token-hash bits. Pure column expressions: explode tokens, aggregate
    ``bits`` signed sums, reassemble the bits.

    ``hash_fn='md5'`` with ``bits=60`` is the portable family (the token
    hash is 60 bits wide, see ``md5_hash64``) — bit-identical in DuckDB,
    so the full signature is oracle-checkable; xxhash64 remains the
    64-bit default at scale."""
    toks = spread_small_input(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    )
    h = _seeded_hash(F.col("tok"), 0, hash_fn)
    sums = [
        F.sum(F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy("doc").agg(*sums)
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select("doc", sig.alias("simhash"))


def simhash_near_dup_pairs(
    signatures: DataFrame,
    id_col: str = "doc",
    sig_col: str = "simhash",
    bits: int = 64,
    slices: int = 8,
    max_hamming: int | None = None,
) -> DataFrame:
    """Hamming-ball retrieval over SimHash signatures — the pair-emitting
    tier the signatures exist for. Bit-slice banding: split the signature
    into ``slices`` contiguous slices; by pigeonhole, any pair within
    Hamming distance d <= slices-1 differs in at most d slices, so at
    least one slice matches exactly. A self-join on (slice_idx,
    slice_value) generates candidates linearly in corpus size (quadratic
    only within a slice bucket); exact popcount(xor) then verifies, so
    with ``max_hamming <= slices - 1`` the output is EXACTLY the set of
    pairs within the ball — no false negatives.
    """
    if max_hamming is None:
        max_hamming = slices - 1
    if max_hamming > slices - 1:
        raise ValueError(
            f"max_hamming={max_hamming} > slices-1={slices - 1}: pigeonhole "
            "completeness needs at least one guaranteed-identical slice"
        )
    # Spread any remainder bits over the leading slices.
    widths = [bits // slices + (1 if i < bits % slices else 0) for i in range(slices)]
    offsets = [sum(widths[:i]) for i in range(slices)]
    sig = F.col(sig_col)
    slice_structs = [
        F.struct(
            F.lit(i).alias("slice"),
            F.shiftright(sig, offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1)).alias("val"),
        )
        for i in range(slices)
    ]
    stacked = signatures.select(
        F.col(id_col).alias("doc"), sig.alias("_sig"), F.explode(F.array(*slice_structs)).alias("sl")
    ).select("doc", "_sig", "sl.slice", "sl.val")
    stacked = invocation_scoped(stacked).persist()
    # Persisted for the same reason as lsh_candidate_pairs: the self-
    # join's two sides would otherwise re-run the SimHash aggregation
    # (64 signed sums over exploded tokens) once each.
    a, b = stacked.alias("a"), stacked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).cast("int").alias("hamming"),
        )
        .distinct()
    )
    return cands.filter(F.col("hamming") <= max_hamming)


def dedup_clusters(
    ids: DataFrame,
    id_col: str,
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iters: int = 4,
    checkpoint_every: int = 4,
    on_unconverged: str = "warn",
) -> DataFrame:
    """Connected components over near-dup candidate pairs → cluster
    assignment + keeper selection (the step that actually DROPS
    duplicates once MinHash/SimHash/embedding candidates are verified).

    Iterative min-label propagation: every id starts as its own label;
    each round takes the min of its label and its neighbors' labels.
    After ``iters`` rounds every component with graph diameter <= iters
    carries its minimum id as the cluster label — near-dup clusters are
    tiny (pairs/triples), so a small fixed iteration count converges and
    keeps the computation DETERMINISTIC and SQL-oracle-expressible (the
    oracle unrolls the same rounds). Each round is one shuffle join of
    labels against the symmetrized edge list — the standard scalable CC
    shape (GraphFrames' algorithm is this plus star-contraction
    optimizations); at 10^10 docs, raise ``iters`` logarithmically or
    chain with alternating-star contraction, never collect.

    Returns (id, cluster, is_keeper): ``cluster`` = min id reachable
    within ``iters`` hops, ``is_keeper`` marks the representative each
    cluster retains.

    CONVERGENCE GUARD (``on_unconverged``): a component with graph
    diameter > ``iters`` would silently split into multiple plausible
    clusters, each electing its own keeper. Unless ``"ignore"``, one
    extra (unreturned) propagation round runs after the ``iters``
    returned rounds and counts labels that would still change; a nonzero
    count warns (``"warn"``, default) or raises (``"raise"``) with the
    unconverged label count, so under-iterated output is visible instead
    of wrong-but-plausible. The check costs one join+agg over the
    already-materialized labels; the RETURNED labels are always exactly
    the ``iters``-round result (oracle parity is unchanged).
    """
    import warnings

    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
    )
    if on_unconverged not in ("ignore", "warn", "raise"):
        raise ValueError(f"on_unconverged must be ignore|warn|raise, got {on_unconverged!r}")
    if on_unconverged != "ignore":
        # The check re-reads edges after the rounds; materialize once so
        # the candidate-pair pipeline behind `pairs` doesn't recompute.
        edges = edges.localCheckpoint(eager=False)
    labels = ids.select(F.col(id_col).alias("u"), F.col(id_col).alias("label"))
    for i in range(iters):
        neighbor_min = (
            edges.join(labels.withColumnsRenamed({"u": "v", "label": "_nl"}), "v")
            .groupBy("u")
            .agg(F.min("_nl").alias("_nmin"))
        )
        labels = (
            labels.join(neighbor_min, "u", "left")
            .select("u", F.least(F.col("label"), F.col("_nmin")).alias("label"))
        )
        # Iterative lineage MUST be truncated: each round nests the prior
        # plan twice (labels appears in both join inputs), so the logical
        # plan grows exponentially — by ~12 unchecked rounds, Catalyst
        # OOMs just stringifying it. localCheckpoint materializes the
        # frame and cuts the lineage (on a cluster with executor-loss
        # concerns, swap for a reliable checkpoint dir).
        if checkpoint_every > 0 and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            labels = labels.localCheckpoint(eager=True)
    if on_unconverged != "ignore":
        labels = labels.localCheckpoint(eager=True)
        unconverged = (
            edges.join(labels.withColumnsRenamed({"u": "v", "label": "_nl"}), "v")
            .groupBy("u")
            .agg(F.min("_nl").alias("_nmin"))
            .join(labels, "u")
            .filter(F.col("_nmin") < F.col("label"))
            .count()
        )
        if unconverged:
            msg = (
                f"dedup_clusters: {unconverged} labels would still change after "
                f"{iters} rounds — a component has diameter > iters and is "
                f"SPLIT in this output; raise iters (log2(diameter) rounds "
                f"suffice with doubling, linear here)"
            )
            if on_unconverged == "raise":
                raise RuntimeError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    w_keep = F.col("u") == F.col("label")
    return labels.select(
        F.col("u").alias(id_col),
        F.col("label").alias("cluster"),
        w_keep.alias("is_keeper"),
    )
