import datetime as dt

import pyspark.sql.functions as F
import pytest

from tpc_di_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_jaccard_estimate,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from tpc_di_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
)
from tpc_di_spark.operators.temporal_join import asof_join_by_id, band_join
from tpc_di_spark.operators.windows import running_balance, top1_per_key

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "completely different content about spark engines and merges"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (5, "spark engines merge data with completely different content"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    out = {r.fp: (r.keeper, r.n_copies) for r in exact_dedup(docs_df(spark), "doc_id", "text").collect()}
    assert len(out) == 4  # 1 and 4 collapse
    assert (1, 2) in out.values()


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = ngram_jaccard_pairs(docs_df(spark), "doc_id", "text", n=3, threshold=0.5).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert got[(1, 4)] == 1.0
    assert (1, 2) in got and 0.5 <= got[(1, 2)] < 1.0
    assert (1, 3) not in got


def test_minhash_lsh_candidates_contain_true_dups(spark):
    sigs = minhash_signatures(docs_df(spark), "doc_id", "text", n=3, num_hashes=32)
    cands = lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
    got = {(r.doc_a, r.doc_b) for r in cands.collect()}
    assert (1, 4) in got  # exact dup always collides in every band
    est = minhash_jaccard_estimate(sigs, cands).collect()
    est_map = {(r.doc_a, r.doc_b): r.jaccard_est for r in est}
    assert est_map[(1, 4)] == 1.0


def test_simhash_near_dup_distance(spark):
    out = {r.doc: r.simhash for r in simhash64(docs_df(spark), "doc_id", "text").collect()}
    assert out[1] == out[4]
    ham12 = bin((out[1] ^ out[2]) & ((1 << 64) - 1)).count("1")
    ham13 = bin((out[1] ^ out[3]) & ((1 << 64) - 1)).count("1")
    assert ham12 < ham13, "near-dup must be closer in Hamming space than unrelated"


def emb_df(spark):
    import math

    rows = []
    for i in range(30):
        base = [math.sin(0.1 * (i + 1) * (d + 1)) + 0.01 for d in range(8)]
        rows.append((i, [float(x) for x in base]))
    # 100 is an exact copy of 0 (cosine 1.0)
    rows.append((100, rows[0][1]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_bruteforce(spark):
    out = cosine_topk_bruteforce(
        emb_df(spark), "vec_id", "embedding", k=3, query_filter=F.col("vec_id") == 0
    ).collect()
    assert len(out) == 3
    assert out[0].neighbor_id == 100 and abs(out[0].cosine - 1.0) < 1e-9
    assert [r.rank for r in out] == [1, 2, 3]


def test_dedup_clusters_components_and_keepers(spark):
    from tpc_di_spark.operators.dedup import dedup_clusters

    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # components: {0,1,2} (chain), {4,7}, singletons 3,5,6,8,9
    pairs = spark.createDataFrame(
        [(1, 2), (0, 1), (4, 7)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: (r.cluster, r.is_keeper) for r in
           dedup_clusters(ids, "doc_id", pairs, iters=3).collect()}
    assert out[0] == (0, True) and out[1] == (0, False) and out[2] == (0, False)
    assert out[4] == (4, True) and out[7] == (4, False)
    for s in (3, 5, 6, 8, 9):
        assert out[s] == (s, True)
    # keeper count == number of components
    assert sum(1 for c, k in out.values() if k) == 7


def test_dedup_clusters_matches_union_find_on_random_graphs(spark):
    """Cross-check min-label propagation against a driver-side union-find
    on seeded random graphs (iters >= node count guarantees convergence
    for any diameter)."""
    import random

    from tpc_di_spark.operators.dedup import dedup_clusters

    for seed in (7, 19, 42):
        rng = random.Random(seed)
        n = 14
        edges = sorted(
            {tuple(sorted(rng.sample(range(n), 2))) for _ in range(rng.randint(3, 10))}
        )
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in range(n)}

        ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.doc_id: r.cluster
            for r in dedup_clusters(ids, "doc_id", pairs, iters=n).collect()
        }
        assert got == expected, f"seed={seed} edges={edges}"


def test_dedup_clusters_convergence_guard_detects_split_chain(spark):
    """A diameter-6 chain under-iterated at iters=2 silently splits the
    component; the guard's extra round must surface it (VERDICT r03 #4)."""
    import warnings as w

    import pytest

    from tpc_di_spark.operators.dedup import dedup_clusters

    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "doc_a long, doc_b long"
    )
    with pytest.warns(RuntimeWarning, match="diameter > iters"):
        split = dedup_clusters(ids, "doc_id", chain, iters=2).collect()
    # the under-iterated output really is split (several cluster labels
    # for what is one true component)
    assert len({r.cluster for r in split}) > 1
    with pytest.raises(RuntimeError, match="would still change"):
        dedup_clusters(ids, "doc_id", chain, iters=2, on_unconverged="raise").collect()
    # converged runs stay silent and fully merge the chain
    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)
        ok = dedup_clusters(ids, "doc_id", chain, iters=6).collect()
    assert {r.cluster for r in ok} == {1}
    assert sum(1 for r in ok if r.is_keeper) == 1


def test_check_embedding_domain_fails_loudly(spark):
    """Out-of-range embedding elements (|x| >= 100, outside the exact-
    DECIMAL(8,6) quantization domain) must raise, not silently NULL the
    cosine (ADVICE r02)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from tpc_di_spark.operators.similarity import check_embedding_domain

    ok = spark.createDataFrame([(1, [0.5, -99.9])], "id int, embedding array<double>")
    assert check_embedding_domain(ok, "embedding").count() == 1
    bad = spark.createDataFrame([(1, [0.5, 150.0])], "id int, embedding array<double>")
    with pytest.raises(SparkRuntimeException):
        check_embedding_domain(bad, "embedding").collect()


def test_lsh_topk_finds_exact_copy(spark):
    out = lsh_bucketed_topk(emb_df(spark), "vec_id", "embedding", k=3, bits=4, tables=2, dim=8)
    rows = {r.query_id: r for r in out.filter("rank = 1").collect()}
    assert rows[0].neighbor_id == 100  # identical vector shares every bucket


def test_asof_join_left(spark):
    probe = spark.createDataFrame(
        [(1, "k1", dt.datetime(2024, 1, 10)), (2, "k2", dt.datetime(2024, 1, 10))],
        "pid long, k string, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            ("k1", dt.datetime(2024, 1, 1), "old"),
            ("k1", dt.datetime(2024, 1, 9), "new"),
            ("k1", dt.datetime(2024, 2, 1), "future"),
        ],
        "bk string, bts timestamp, v string",
    )
    out = asof_join_by_id(
        probe, build, "pid", ["k"], ["bk"], "ts", "bts", how="left"
    ).collect()
    got = {r.pid: r.v for r in out}
    assert got[1] == "new"
    assert got[2] is None


def test_asof_join_grouped_matches_ranked(spark):
    """The pandas merge_asof variant must agree with the join+rank form."""
    import datetime as dt

    from tpc_di_spark.operators.temporal_join import asof_join_grouped

    probe = spark.createDataFrame(
        [(i, f"k{i % 3}", dt.datetime(2024, 1, 1 + i % 20)) for i in range(60)],
        "pid long, k string, ts timestamp",
    )
    build = spark.createDataFrame(
        [(f"k{j % 3}", dt.datetime(2024, 1, 1 + (j * 3) % 20), j) for j in range(15)],
        "k string, bts timestamp, sk long",
    )
    # asof_join_by_id requires disjoint column names (documented); rename.
    ranked = asof_join_by_id(
        probe, build.withColumnRenamed("k", "bk"), "pid", ["k"], ["bk"],
        "ts", "bts", tiebreak=["sk"], how="left",
    ).select("pid", "sk")
    grouped = asof_join_grouped(probe, build, ["k"], "ts", "bts").select("pid", "sk")
    r = {x.pid: x.sk for x in ranked.collect()}
    g = {x.pid: x.sk for x in grouped.collect()}
    # Build timestamps are unique per key in this fixture, so the two
    # formulations must agree exactly (ties would be implementation-
    # defined: merge_asof takes the last row, the ranked form the max sk).
    assert r == g


def test_band_join(spark):
    fact = spark.createDataFrame(
        [("s1", dt.datetime(2024, 6, 1))], "sym string, ts timestamp"
    )
    dim = spark.createDataFrame(
        [
            ("s1", dt.datetime(2024, 1, 1), dt.datetime(2024, 5, 31), 10),
            ("s1", dt.datetime(2024, 6, 1), dt.datetime(9999, 12, 31), 20),
        ],
        "dsym string, eff timestamp, end timestamp, sk int",
    )
    out = band_join(fact, dim, [("sym", "dsym")], "ts", "eff", "end").collect()
    assert len(out) == 1 and out[0].sk == 20


def test_sessionize(spark):
    import datetime as dt

    from tpc_di_spark.operators.windows import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 10, t0),
        (2, 10, t0 + dt.timedelta(minutes=10)),  # same session
        (3, 10, t0 + dt.timedelta(minutes=50)),  # 40min gap -> new session
        (4, 20, t0),  # other key -> own session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r.event_id: r.session_idx for r in sessionize(df, ["user_id"], "ts", "event_id").collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_running_balance_and_top1(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 5.0), (2, 1, 7.0)], "k long, seq long, amt double"
    )
    rb = running_balance(df, ["k"], ["seq"], "amt").collect()
    got = {(r.k, r.seq): r.balance for r in rb}
    assert got[(1, 2)] == 15.0
    t1 = top1_per_key(df, ["k"], [F.col("seq").desc()]).collect()
    assert {(r.k, r.seq) for r in t1} == {(1, 2), (2, 1)}


def test_trailing_extreme_with_argdate_ties_and_min(spark):
    import datetime as dt

    from tpc_di_spark.operators.windows import trailing_extreme_with_argdate

    rows = [
        # key A: value 9.0 appears twice in the window -> earliest date wins
        ("A", dt.datetime(2024, 1, 1), 9.0),
        ("A", dt.datetime(2024, 3, 1), 9.0),
        ("A", dt.datetime(2024, 4, 1), 5.0),
        # key A: a row >365d before 2025-06-01 must NOT count for it
        ("A", dt.datetime(2025, 6, 1), 1.0),
        # key B: single row
        ("B", dt.datetime(2024, 1, 1), 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, d timestamp, v double")
    hi = {
        (r.k, str(r.d.date())): (r.ext_value, str(r.ext_date.date()))
        for r in trailing_extreme_with_argdate(df, "k", "d", "v").collect()
    }
    assert hi[("A", "2024-04-01")] == (9.0, "2024-01-01"), "tie -> earliest arg-date"
    assert hi[("A", "2025-06-01")] == (1.0, "2025-06-01"), "window excludes >365d history"
    assert hi[("B", "2024-01-01")] == (2.0, "2024-01-01")
    lo = {
        (r.k, str(r.d.date())): (r.ext_value, str(r.ext_date.date()))
        for r in trailing_extreme_with_argdate(df, "k", "d", "v", extreme="min").collect()
    }
    assert lo[("A", "2024-04-01")] == (5.0, "2024-04-01")

    # NULL values must be SKIPPED by both extremes (SQL MIN/MAX semantics;
    # the reference's MIN(DAYLOW) ignores NULLs) — an unguarded
    # min-over-struct would pick the NULL-v struct because struct
    # comparison sorts NULL fields first.
    rows_null = [
        ("A", dt.datetime(2024, 1, 1), 5.0),
        ("A", dt.datetime(2024, 2, 1), None),
        ("A", dt.datetime(2024, 3, 1), 7.0),
    ]
    dfn = spark.createDataFrame(rows_null, "k string, d timestamp, v double")
    lo_n = {
        (r.k, str(r.d.date())): (r.ext_value, r.ext_date)
        for r in trailing_extreme_with_argdate(dfn, "k", "d", "v", extreme="min").collect()
    }
    assert lo_n[("A", "2024-03-01")][0] == 5.0, "NULL in window must not poison the min"
    assert str(lo_n[("A", "2024-03-01")][1].date()) == "2024-01-01"
    # a frame of only-NULL values yields NULL (matches SQL MIN of all-NULL)
    assert lo_n[("A", "2024-02-01")][0] == 5.0  # frame includes the 5.0 row
    hi_n = {
        (r.k, str(r.d.date())): r.ext_value
        for r in trailing_extreme_with_argdate(dfn, "k", "d", "v").collect()
    }
    assert hi_n[("A", "2024-03-01")] == 7.0


def test_trailing_sum_ratio_strictly_prior(spark):
    import datetime as dt

    from tpc_di_spark.operators.windows import trailing_sum_ratio

    rows = [
        ("A", dt.datetime(2024, 1, 1), 10.0),
        ("A", dt.datetime(2024, 6, 1), 20.0),
        # same-date peer must not contribute to the other's denominator
        ("A", dt.datetime(2024, 6, 1), 30.0),
        ("A", dt.datetime(2025, 7, 1), 40.0),  # >365d after 2024-06-01
    ]
    df = spark.createDataFrame(rows, "k string, d timestamp, v double")
    out = {(r.k, str(r.d.date()), r.v): r for r in trailing_sum_ratio(df, "k", "d", "v").collect()}
    first = out[("A", "2024-01-01", 10.0)]
    assert first.trailing_sum is None and first.alert_no_history is True
    assert out[("A", "2024-06-01", 20.0)].trailing_sum == 10.0, "strictly prior; same-date peer excluded"
    assert out[("A", "2024-06-01", 30.0)].trailing_sum == 10.0
    assert out[("A", "2025-07-01", 40.0)].trailing_sum is None, "window closed after 365d"


def test_lsh_topk_recall_vs_exact(spark):
    """Recall@5 of the LSH path against the exact baseline on the driver's
    own embeddings (sf0.001, 500 near-random 64-dim vectors). On data with
    no cluster structure recall tracks the candidate fraction
    ~ tables * 2^-bits; bits=3/tables=4 measures 0.63 here (floor 0.55
    with noise margin). Multi-probe (flip each bit on the query side) must
    strictly improve recall at identical bits/tables."""
    from tpc_di_spark.operators.similarity import cosine_topk_bruteforce, lsh_bucketed_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ex: dict[int, set] = {}
    for r in cosine_topk_bruteforce(e, "vec_id", "embedding", k=5).collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    total = sum(len(v) for v in ex.values())

    def recall(**kw) -> float:
        ap: dict[int, set] = {}
        for r in lsh_bucketed_topk(e, "vec_id", "embedding", k=5, dim=64, **kw).collect():
            ap.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(ex[q] & ap.get(q, set())) for q in ex) / total

    assert recall(bits=3, tables=4) >= 0.55
    base = recall(bits=4, tables=2)
    probed = recall(bits=4, tables=2, probe_bits=1)
    assert probed > base, "multi-probe must raise recall at the same bits/tables"


def test_simhash_near_dup_pairs_pigeonhole_complete(spark):
    """With max_hamming <= slices-1 the bit-slice banding must return
    EXACTLY the set of pairs within the Hamming ball (no false negatives:
    any pair differing in <= slices-1 bits shares at least one slice)."""
    from tpc_di_spark.operators.dedup import simhash64, simhash_near_dup_pairs

    docs = [(i, f"token{i} shared common words appear here plus tail{i % 3}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = simhash64(df, "doc_id", "text", hash_fn="md5", bits=60)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup_pairs(sigs, bits=60, slices=6, max_hamming=5).collect()
    }
    sig_map = {r.doc: r.simhash for r in sigs.collect()}
    ids = sorted(sig_map)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin((sig_map[a] ^ sig_map[b]) & ((1 << 60) - 1)).count("1")
            if ham <= 5:
                expected[(a, b)] = ham
    assert got == expected


def test_ivf_topk_and_kmeans(spark):
    """kmeans_fit is invariant to input partitioning (DECIMAL sums +
    driver division); trained cells genuinely PRUNE (no cell holds most
    of the corpus — data-independent centroids degenerate to one giant
    cell on this corpus, candidate set ~ N, which is recall without
    pruning) while keeping recall@5 vs the exact baseline. Measured here:
    trained nlist=8, nprobe=4 -> recall 0.76 at ~50% candidate
    fraction."""
    import pyspark.sql.functions as F

    from tpc_di_spark.operators.ivf import ivf_assign, ivf_topk, kmeans_fit
    from tpc_di_spark.operators.similarity import cosine_topk_bruteforce

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_fit(e, "vec_id", "embedding", nlist=8, iters=2, dim=64)
    cents_repart = kmeans_fit(
        e.repartition(13), "vec_id", "embedding", nlist=8, iters=2, dim=64
    )
    assert cents == cents_repart, "k-means must not depend on partitioning"

    n = e.count()
    sizes = {
        r.centroid_id: r.n
        for r in ivf_assign(e, "vec_id", "embedding", cents)
        .groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    assert len(sizes) == 8 and max(sizes.values()) < 0.5 * n, (
        f"trained cells must balance (pruning is real): {sizes}"
    )

    ex: dict[int, set] = {}
    for r in cosine_topk_bruteforce(e, "vec_id", "embedding", k=5).collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    total = sum(len(v) for v in ex.values())

    # Recall/cost curve (VERDICT r02 #8): recall@5 must rise monotonically
    # with nprobe and reach >=0.9 when probing all nlist cells (nprobe=8 =
    # exhaustive search through the inverted lists).
    curve = {}
    for nprobe in (1, 2, 4, 8):
        ap: dict[int, set] = {}
        for r in ivf_topk(e, "vec_id", "embedding", cents, k=5, nprobe=nprobe).collect():
            ap.setdefault(r.query_id, set()).add(r.neighbor_id)
        curve[nprobe] = sum(len(ex[q] & ap.get(q, set())) for q in ex) / total
    assert curve[4] >= 0.65, f"trained IVF recall@5 too low at nprobe=4: {curve}"
    assert curve[1] <= curve[2] <= curve[4] <= curve[8], f"recall not monotone: {curve}"
    assert curve[8] >= 0.9, f"full-probe recall must approach exact: {curve}"


def test_state_diff_classification(spark):
    """insert/delete/update/unchanged under null-safe keys and values
    (operators/diff.py)."""
    from tpc_di_spark.operators.diff import diff_summary, state_diff

    left = spark.createDataFrame(
        [
            ("a", 1, "x"),
            ("b", 2, None),   # value diff vs right
            ("c", 3, "z"),    # unchanged
            ("d", 4, "w"),    # delete (absent right)
            (None, 9, "n"),   # NULL key present both sides, unchanged
        ],
        "k string, v int, s string",
    )
    right = spark.createDataFrame(
        [
            ("a", 1, "x"),    # wait — make 'a' an update on v
            ("b", 2, "y"),
            ("c", 3, "z"),
            ("e", 5, "q"),    # insert (absent left)
            (None, 9, "n"),
        ],
        "k string, v int, s string",
    )
    right = right.replace(1, 10, subset=["v"])  # 'a' becomes an update
    d = state_diff(left, right, key_cols=["k"]).collect()
    by_key = {r.k: r for r in d}
    assert by_key["a"].change_type == "update" and by_key["a"].right_v == 10
    assert by_key["b"].change_type == "update"
    assert by_key["b"].left_s is None and by_key["b"].right_s == "y"
    assert by_key["d"].change_type == "delete" and by_key["d"].right_v is None
    assert by_key["e"].change_type == "insert" and by_key["e"].left_v is None
    # unchanged rows (c and the NULL key) are excluded by default
    assert "c" not in by_key and None not in by_key

    full = state_diff(left, right, key_cols=["k"], include_unchanged=True)
    counts = {r.change_type: r["count"] for r in diff_summary(full).collect()}
    assert counts == {"insert": 1, "delete": 1, "update": 2, "unchanged": 2}


def test_reconcile_current_state_matches_oracle(spark, tmp_path):
    """Pipeline drift audit: the ingested table reconciles cleanly
    against the single-threaded oracle replay; a poisoned expectation
    surfaces as exactly the classified rows."""
    import pyspark.sql.functions as F

    from tpc_di_spark.cdc import CdcOrchestrator
    from tpc_di_spark.cdc.generator import historical_batch, incremental_batch
    from tpc_di_spark.cdc.orchestrator import bootstrap_table
    from tpc_di_spark.cdc.oracle import OracleState
    from tpc_di_spark.operators.diff import reconcile_current_state
    from tpc_di_spark.schemas import TRANSCRIPT_SCHEMA

    table = bootstrap_table(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=8)
    orch = CdcOrchestrator(table)
    batches = [
        historical_batch(spark, 30, 4),
        incremental_batch(spark, 2, n_events=40, n_convs=30, turns_per_conv=4),
    ]
    oracle = OracleState(payload_cols=["role", "text", "ts"])
    for i, b in enumerate(batches, start=1):
        orch.apply_batch(b, i)
        oracle.apply_batch(b.toPandas(), i)
    expected = spark.createDataFrame(
        oracle.current_df()[["conv_id", "turn_idx", "role", "text", "ts"]]
    )

    assert reconcile_current_state(table, expected).count() == 0

    poisoned = expected.withColumn(
        "text",
        F.when(F.col("conv_id") == "conv-000005", F.lit("tampered")).otherwise(
            F.col("text")
        ),
    )
    drift = reconcile_current_state(table, poisoned).collect()
    assert len(drift) > 0
    assert all(r.change_type == "update" for r in drift)
    assert all(r.conv_id == "conv-000005" for r in drift)


def test_assemble_conversations_orders_turns(spark):
    """Turn order is stable regardless of input row order; NULL text
    keeps its slot as the empty string."""
    import datetime as dt

    from tpc_di_spark.functions.transcripts import assemble_conversations

    rows = [
        ("c1", 2, "assistant", "world", dt.datetime(2024, 1, 1)),
        ("c1", 0, "user", "hello", dt.datetime(2024, 1, 1)),
        ("c1", 1, "tool", None, dt.datetime(2024, 1, 1)),
        ("c2", 0, "user", "solo", dt.datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    ).repartition(4)
    out = {r.conv_id: r for r in assemble_conversations(df).collect()}
    assert out["c1"].document == "<user> hello\n<tool> \n<assistant> world"
    assert out["c1"].n_turns == 3
    assert out["c2"].document == "<user> solo" and out["c2"].n_chars == len("<user> solo")
