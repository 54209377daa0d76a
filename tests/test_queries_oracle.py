"""Mirror of the driver's correctness gate: run every queries() entry
at sf0.001 and compare row count + schema + order-insensitive values
against oracle_sql() via DuckDB."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's compare: sort columns by name, sort rows,
    and do NOT coerce numeric dtypes — an int64 engine column vs a
    float64 oracle column (DuckDB SUM→HUGEINT) must FAIL here exactly
    as it fails the driver's value hash."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    df = res.to_pandas()  # ray Dataset
    if len(df) == 0 and not len(df.columns):
        # Ray quirk: to_pandas() drops the schema at 0 rows even though
        # Dataset.schema() carries it — reconstruct the empty frame
        df = pd.DataFrame({name: [] for name in res.schema().names})
    return df


SQL_QUERIES = sorted(
    __import__("__ray_entry__").oracle_sql().keys()
)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(ray_session, name):
    entry = __import__("__ray_entry__")
    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    got = _norm(_to_pandas(q(SF_DIR)))
    con = _duck()
    want = _norm(con.sql(sql).df())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"{name} columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} rows {len(got)} != {len(want)}"
    for c in got.columns:
        assert got[c].dtype.kind == want[c].dtype.kind, (
            f"{name}.{c} dtype kind {got[c].dtype} != {want[c].dtype} "
            "(driver value-hash would mismatch)"
        )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


ROWS_ONLY = ["simhash_docs", "minhash_dup_pairs", "er_clusters_docs", "knn_lsh"]


@pytest.mark.parametrize(
    "name",
    ["simhash_docs", "minhash_dup_pairs", "knn_lsh", "ngram_jaccard_pairs",
     "media_features", "random_sample_docs"],
)
def test_rows_only_queries_run(ray_session, name):
    entry = __import__("__ray_entry__")
    df = _to_pandas(entry.queries()[name](SF_DIR))
    assert df is not None
    if name == "simhash_docs":
        assert len(df) == 500 and df["simhash_hex"].str.len().eq(64).all()
    if name == "random_sample_docs":
        # seeded sample: plausible size and repeatable within a session
        assert 10 <= len(df) <= 150
        df2 = _to_pandas(entry.queries()[name](SF_DIR))
        assert sorted(df.doc_id) == sorted(df2.doc_id)


@pytest.mark.parametrize("fn_name,cap_name", [
    ("minhash_dup_pairs", "BROADCAST_PAIR_CAP"),
    ("ngram_jaccard_pairs", "NGRAM_BROADCAST_CAP"),
])
def test_near_dup_join_strategies_agree(ray_session, fn_name, cap_name):
    """The size-switched join strategies (broadcast lookup vs shuffle
    joins) must produce IDENTICAL pairs; defaults take the broadcast
    path at test scale, so force the shuffle path via the cap and
    diff."""
    from hexhamming_ray.pipelines import text as T

    fn = getattr(T, fn_name)

    def run():
        return (
            fn(SF_DIR).to_pandas()
            .sort_values(["id_lo", "id_hi"]).reset_index(drop=True)
        )

    broadcast = run()
    old = getattr(T, cap_name)
    try:
        setattr(T, cap_name, -1)  # force the shuffle/join path
        shuffle = run()
    finally:
        setattr(T, cap_name, old)
    pd.testing.assert_frame_equal(broadcast, shuffle)
    assert len(broadcast) > 0  # the corpus plants real near-dups


def test_pack_sequences_coalesce_paths_agree(ray_session):
    """pack_sequences pass A is cap-gated (ADVICE r03): the one-block
    coalesce (default at test scale) and the keyed-exchange fallback
    must produce IDENTICAL offsets."""
    from hexhamming_ray.pipelines import relational as R
    from hexhamming_ray.pipelines import text as T

    def run():
        return (
            T.pack_sequences(SF_DIR).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )

    coalesced = run()
    old = R.COALESCE_KEY_CAP
    try:
        R.COALESCE_KEY_CAP = -1  # force the keyed exchange
        exchanged = run()
    finally:
        R.COALESCE_KEY_CAP = old
    pd.testing.assert_frame_equal(coalesced, exchanged)
    assert len(coalesced) > 0


def test_graph_components_remap_strategies_agree(ray_session):
    """graph_components' size-switched label remap: the broadcast
    lookup (default at test scale) and the distributed sort-based
    tagged-union remap (the above-cap scale path, driver holds
    nothing) must produce IDENTICAL components."""
    from hexhamming_ray.stages import annsearch as A

    def run():
        return (
            A.graph_components(SF_DIR).to_pandas()
            .sort_values("vec_id").reset_index(drop=True)
        )

    broadcast = run()
    old = A.GRAPH_LABEL_BROADCAST_CAP
    try:
        A.GRAPH_LABEL_BROADCAST_CAP = -1  # force the distributed remap
        dist = run()
    finally:
        A.GRAPH_LABEL_BROADCAST_CAP = old
    pd.testing.assert_frame_equal(broadcast, dist)
    # real multi-hop structure: some nodes remapped off their own id
    assert (broadcast["component"] != broadcast["vec_id"]).any()


EVENT_QUERIES = [
    "event_gaps", "asof_view_clicks", "rolling_user_window",
    "user_sessions", "top_event_per_user", "event_rank_in_user",
    "events_per_hour", "events_by_type", "event_props_k",
    "top_users_heavyhitter", "user_cumulative_value",
    "events_dayofweek", "funnel_conversions", "event_value_quartiles",
    "event_lag_lead", "user_first_last_event", "events_hopping_6h",
    "user_daily_spine", "user_moving_sum", "user_retention",
    "event_percent_rank", "asof_next_purchase", "event_cume_dist",
    "event_value_mode", "user_centered_sum",
]


@pytest.fixture(scope="module")
def adversarial_events_dir(tmp_path_factory):
    """A synthetic events table built to stress the window/stream
    operators' edge cases the driver testdata can't: equal timestamps
    within a user (RANGE-frame peers, LAG/rank tie-breaks), ts
    collisions across users, single-event users, duplicate values,
    clicks with no preceding view, and a user whose events all share
    one timestamp."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n = 4000
    user = rng.integers(0, 40, n)
    user[:5] = np.arange(1000, 1005)  # single-event users
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.integers(0, 3_600_000_000 * 3, n)
    ts[user == 3] = base + 42  # one user: ALL events at one instant
    ts[100:200] = ts[100]      # a cross-user timestamp collision block
    val = np.round(rng.uniform(0, 10, n), 2)
    val[user == 5] = 7.5       # duplicate values -> rank tie-breaks
    types = np.array(["view", "click", "purchase", "error", "signup"])
    et = types[rng.integers(0, 5, n)]
    et[user == 9] = "click"    # clicks with NO preceding view
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)],
                pa.string(),
            ),
        }
    )
    d = tmp_path_factory.mktemp("adv_events")
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_queries_on_adversarial_stream(
    ray_session, adversarial_events_dir, name
):
    entry = __import__("__ray_entry__")
    got = _norm(_to_pandas(entry.queries()[name](adversarial_events_dir)))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{adversarial_events_dir}/events.parquet')"
    )
    want = _norm(con.sql(entry.oracle_sql()[name]).df())
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


DOC_QUERIES = [
    "token_counts", "quality_scores", "clean_docs", "prepare_corpus",
    "doc_stats_by_lang", "top_docs_by_len", "doc_fingerprints",
    "exact_dedup", "langid_docs", "doc_sample", "union_distinct_docs",
    "docs_intersect", "docs_except", "ngram_jaccard_exact",
    "er_exact_clusters", "ngram_jaccard_allpairs", "top_tokens_per_lang",
    "stratified_sample_docs", "er_cluster_size_hist", "docs_above_p90_len",
    "decontaminate_docs", "doc_line_stats", "docs_csv_roundtrip", "corpus_report",
    "docs_json_roundtrip", "docs_partitioned_sink",
    "weighted_sample_docs", "dedup_keep_longest", "scrub_docs",
    "line_dedup_docs", "token_doc_freq", "lang_confusion",
    "chunk_docs", "dataset_split_docs", "pack_sequences",
    "tfidf_top_terms", "inverted_index", "fuzzy_decontaminate_docs",
    "ngram_repetition_docs", "dup_span_docs", "shuffle_docs",
    "doc_rarity_scores", "bpe_pair_counts",
    "gopher_filter_docs", "docs_except_all", "docs_intersect_all",
    "docs_orc_roundtrip", "docs_feather_roundtrip", "sample_k_docs",
    "lang_balance_docs", "curriculum_order_docs",
    "sorted_neighborhood_pairs", "fuzzy_match_levenshtein",
    "fuzzy_match_jw", "fuzzy_match_multikey", "er_fuzzy_clusters",
    "fuzzy_dedup_survivors", "er_fuzzy_eval", "fuzzy_match_token_sort",
    "blocking_strategy_report", "fuzzy_decontaminate_jw",
    "fuzzy_match_damerau", "fuzzy_match_charjac",
    "qgram_blocking_pairs", "meta_blocking_wep",
    "cnp_blocking_pairs", "golden_record_docs",
    # round-4 continuation: evaluation / decision / set-similarity
    "er_bcubed_eval", "er_rand_index", "mutual_best_match",
    "fs_match_scores", "match_graph_triangles", "er_threshold_sweep",
    "dedup_rate_report", "ngram_containment_pairs",
    "match_candidates_topk", "weighted_jaccard_pairs",
    "er_confusion_report", "cross_source_links",
    "source_overlap_matrix", "ngram_jaccard_prefix",
    "stopword_ratio_docs", "er_fs_eval", "er_error_samples",
    "match_graph_modularity", "dup_rate_by_source",
    "dedup_cascade_report",
]


@pytest.fixture(scope="module")
def adversarial_docs_dir(tmp_path_factory):
    """A synthetic documents table stressing the text operators' edge
    cases: empty text, whitespace-only text, sub-3-token docs (the
    shingle fallback), exact-duplicate groups of size 2 and 5, unicode
    (accents + CJK), tab/newline runs, and punctuation floods."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "the", "and", "der", "und", "le", "la", "el", "que"]
    texts = [
        "",                       # empty
        "   \t\n  ",              # whitespace-only
        "one",                    # 1 token
        "two tokens",             # 2 tokens (shingle fallback)
        "Crème BRÛLÉE über straße",  # unicode lower/accents
        "这是一个中文文档内容测试样本",        # CJK (langid override)
        "!!! ??? ;;; ### $$$ %%%",   # punctuation flood
        "a\tb\nc\r\nd  e   f",       # mixed whitespace runs
        "mail Bob.Smith+x@sub.example.co.uk or call 555 1234",  # PII
        "v1.2.3 costs 42 dollars and 7 cents 007",  # digit runs
        "Shared Boilerplate Line\nunique alpha line\nShared Boilerplate Line",
        "Shared Boilerplate Line\nunique beta line",  # cross-doc dup lines
        "CASE and   space Variant doc",
        "case AND space    variant DOC",  # normalized-equal, diff n_chars
    ]
    for i in range(292):
        k = int(rng.integers(3, 40))
        texts.append(" ".join(rng.choice(words, k)))
    # plant exact-duplicate groups (sizes 5 and 2)
    for i in range(4):
        texts[50 + i] = texts[40]
    texts[120] = texts[110]
    n = len(texts)
    langs = np.array(["en", "de", "fr", "es", "zh"])[
        rng.integers(0, 5, n)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["synth"] * n, pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64),
                pa.int64(),
            ),
        }
    )
    d = tmp_path_factory.mktemp("adv_docs")
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_queries_on_adversarial_corpus(
    ray_session, adversarial_docs_dir, name
):
    entry = __import__("__ray_entry__")
    got = _norm(_to_pandas(entry.queries()[name](adversarial_docs_dir)))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_docs_dir}/documents.parquet')"
    )
    want = _norm(con.sql(entry.oracle_sql()[name]).df())
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hll_sketch_accuracy(ray_session):
    """approx_distinct_users (HyperLogLog, p=12) must land within 5%
    of the exact per-type distinct user count (3 sigma ~ 4.9%), and
    the sketch must be merge-order independent (same answer regardless
    of block layout)."""
    entry = __import__("__ray_entry__")
    got = _to_pandas(entry.queries()["approx_distinct_users"](SF_DIR))
    con = _duck()
    exact = con.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events "
        "GROUP BY event_type"
    ).df()
    con.close()
    merged = got.merge(exact, on="event_type")
    assert len(merged) == len(exact)
    rel = (merged.approx_users - merged.n).abs() / merged.n
    assert (rel <= 0.05).all(), merged


RELATIONAL_QUERIES = [
    "q1_pricing_summary", "orders_by_status", "top_customers",
    "customers_per_region", "high_value_lineitems",
    "distinct_order_customers", "parts_top_price", "q3_top_orders",
    "order_count_histogram", "order_price_quantiles",
    "customers_no_f_orders", "customers_with_high_orders",
    "supplier_balance_by_nation", "parts_price_bands",
    "lineitem_priority_counts", "orders_rollup",
    "part_supplier_distinct", "supplier_rank_in_nation",
    "orders_by_month", "q12_late_lines", "q13_customer_distribution",
    "parts_skyline",
]


@pytest.fixture(scope="module")
def adversarial_tpch_dir(tmp_path_factory):
    """FK-intact TPC-H-shaped tables stressing the relational
    operators: top-k ties (two customers with IDENTICAL order sums in
    the top 10), key skew (one customer with 50 orders), price-band
    boundary values (exactly 500.00 -> 50000 cents), rounding-edge
    prices (x.995), customers with no orders, a region with no
    nations, negative balances, duplicate (part, supp) lineitem pairs,
    and even/odd quantile group sizes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    d = tmp_path_factory.mktemp("adv_tpch")

    region = pa.table({
        "r_regionkey": pa.array([0, 1, 2], pa.int32()),
        "r_name": pa.array(["AMERICA", "ASIA", "VOID"], pa.string()),
    })
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(6), pa.int32()),
        "n_name": pa.array([f"NATION{i}" for i in range(6)], pa.string()),
        "n_regionkey": pa.array([0, 0, 1, 1, 1, 0], pa.int32()),
    })
    nc = 60
    cust = pa.table({
        "c_custkey": pa.array(np.arange(1, nc + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, nc + 1)],
                           pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 6, nc).astype(np.int32),
                                pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, nc), 2),
                              pa.float64()),
        "c_mktsegment": pa.array(
            np.where(rng.random(nc) < 0.5, "BUILDING", "AUTO"), pa.string()),
    })
    ns = 10
    supp = pa.table({
        "s_suppkey": pa.array(np.arange(1, ns + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{i}" for i in range(1, ns + 1)],
                           pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 6, ns).astype(np.int32),
                                pa.int32()),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-500, 5000, ns), 2), pa.float64()),
    })
    npart = 30
    prices = np.round(rng.uniform(100, 2000, npart), 2)
    prices[:6] = [500.00, 499.995, 1000.00, 1500.00, 49.5, 1999.995]
    part = pa.table({
        "p_partkey": pa.array(np.arange(1, npart + 1), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(1, npart + 1)],
                           pa.string()),
        "p_brand": pa.array([f"Brand#{i % 5}" for i in range(npart)],
                            pa.string()),
        "p_type": pa.array(["STANDARD"] * npart, pa.string()),
        "p_size": pa.array(rng.integers(1, 50, npart).astype(np.int32),
                           pa.int32()),
        "p_retailprice": pa.array(prices, pa.float64()),
    })

    no = 400
    # customers 1..37 get random orders (38..60 get none here, so the
    # engineered tie below is exact; 40..60 have NONE at all -> anti
    # join); customer 7 is the skew key with ~50 orders
    ock = rng.integers(1, 38, no)
    ock[:50] = 7
    total = np.round(rng.uniform(100, 450_000, no), 2)
    total[:30] = np.round(total[:30], 0) + 0.5  # rounding edges
    # two engineered equal-sum customers at the very top: custkeys
    # 38 and 39 each get exactly two orders summing to 6,000,000.00 —
    # far above any random customer (≤ ~12 orders × 450k), so both sit
    # in the top 10 and force the (total_cents, custkey) tie-break
    ock[390:392] = 38
    ock[392:394] = 39
    total[390:394] = [3_000_000.0, 3_000_000.0, 4_000_000.0, 2_000_000.0]
    base_day = np.datetime64("1996-01-01", "us")
    odate = base_day + rng.integers(0, 1200, no) * np.timedelta64(
        86_400_000_000, "us")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(1, no + 1), pa.int64()),
        "o_custkey": pa.array(ock, pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, no)], pa.string()),
        "o_totalprice": pa.array(total, pa.float64()),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])[rng.integers(0, 5, no)], pa.string()),
    })

    nl = 1500
    lok = rng.integers(1, no + 1, nl)
    lpk = rng.integers(1, npart + 1, nl)
    lsk = rng.integers(1, ns + 1, nl)
    lpk[:100] = 3
    lsk[:100] = np.tile([1, 2], 50)  # duplicate (part, supp) pairs
    eprice = np.round(rng.uniform(900, 95_000, nl), 2)
    eprice[200:260] = 45_000.0  # exactly AT the > 45000 boundary
    sdate = base_day + rng.integers(300, 2200, nl) * np.timedelta64(
        86_400_000_000, "us")
    lineitem = pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(lpk, pa.int64()),
        "l_suppkey": pa.array(lsk, pa.int64()),
        "l_linenumber": pa.array(
            rng.integers(1, 8, nl).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(
            rng.integers(1, 51, nl).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(eprice, pa.float64()),
        "l_discount": pa.array(
            np.round(rng.uniform(0, 0.1, nl), 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, nl), 2),
                          pa.float64()),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, nl)], pa.string()),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, nl)], pa.string()),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    })

    for name, tbl in [("region", region), ("nation", nation),
                      ("customer", cust), ("supplier", supp),
                      ("part", part), ("orders", orders),
                      ("lineitem", lineitem)]:
        pq.write_table(tbl, d / f"{name}.parquet")
    return str(d)


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_relational_queries_on_adversarial_tables(
    ray_session, adversarial_tpch_dir, name
):
    entry = __import__("__ray_entry__")
    got = _norm(_to_pandas(entry.queries()[name](adversarial_tpch_dir)))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{adversarial_tpch_dir}/{t}.parquet')"
        )
    want = _norm(con.sql(entry.oracle_sql()[name]).df())
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_embedding_quantization_accuracy(ray_session):
    """int8 quantization: reconstruction error <= scale/2 per element
    and cosine(original, dequantized) >= 0.995 for EVERY vector."""
    import numpy as np
    import pyarrow.parquet as pq

    entry = __import__("__ray_entry__")
    got = _to_pandas(entry.queries()["embeddings_quantized"](SF_DIR))
    src = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    src = src.set_index("vec_id")
    assert len(got) == len(src)
    for _, row in got.iterrows():
        orig = np.asarray(src.loc[row.vec_id, "embedding"], dtype=np.float64)
        codes = np.frombuffer(row.codes, dtype=np.int8).astype(np.float64)
        deq = codes * row.scale
        assert np.abs(deq - orig).max() <= row.scale / 2 + 1e-12
        denom = np.linalg.norm(orig) * np.linalg.norm(deq)
        if denom > 0:
            assert (orig @ deq) / denom >= 0.995


def test_er_incremental_equals_full_er(ray_session):
    """The incremental-ER query (70% checkpointed + 30% merged in)
    must equal the from-scratch ER clustering of the same corpus —
    labels are min-node-id, so exact equality holds."""
    entry = __import__("__ray_entry__")
    inc = _to_pandas(entry.queries()["er_incremental"](SF_DIR))
    full = _to_pandas(entry.queries()["er_clusters_docs"](SF_DIR))
    inc = inc.sort_values("doc_id").reset_index(drop=True)
    full = full.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(inc, full)


@pytest.fixture(scope="module")
def adversarial_emb_dir(tmp_path_factory):
    """Embeddings stressing the vector operators: exact-duplicate
    vectors and scalar multiples (cosine EXACTLY 1.0 -> top-k rank
    tie-breaks), near-dups just above threshold, negative components.
    Components are small integers so dot products are exact in both
    float32 storage and either engine's accumulation — ties are real
    ties, not float noise. (Zero vectors are excluded: cosine is
    undefined and both engines' NaN orderings are arbitrary.)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(17)
    n, dim = 200, 8
    mat = rng.integers(-8, 9, (n, dim)).astype(np.float32)
    mat[:, 0] = np.maximum(np.abs(mat[:, 0]), 1)  # no zero vectors
    mat[1] = mat[0]          # exact duplicate of vec 0
    mat[2] = 2 * mat[0]      # scalar multiple: cosine exactly 1.0
    mat[4] = mat[3]
    mat[4, -1] += 1          # near-dup just off vec 3
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row for row in mat.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, 5, n).astype(np.int32), pa.int32()
            ),
        }
    )
    d = tmp_path_factory.mktemp("adv_emb")
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


@pytest.mark.parametrize("name", [
    "knn_bruteforce", "embedding_near_dup_pairs",
    # exhaustive-parameter variants: the LSH/IVF machinery at the
    # point where approximation vanishes, under the exact oracles
    "knn_lsh_exhaustive", "knn_ivf_exhaustive",
    "embedding_near_dup_lsh_exhaustive",
    "embedding_dedup_survivors",
])
def test_vector_queries_on_adversarial_embeddings(
    ray_session, adversarial_emb_dir, name
):
    entry = __import__("__ray_entry__")
    got = _norm(_to_pandas(entry.queries()[name](adversarial_emb_dir)))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{adversarial_emb_dir}/embeddings.parquet')"
    )
    want = _norm(con.sql(entry.oracle_sql()[name]).df())
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quantile_sketch_accuracy(ray_session):
    """order_price_quantile_sketch must land within the documented rank
    error of the exact quantiles (rank tolerance = n_blocks *
    n_group/per_block; value tolerance checked as |approx - exact|
    <= 1% of the group's value range), and exactly match on a
    single-block input (sketch == exact when nothing is dropped)."""
    entry = __import__("__ray_entry__")
    got = _to_pandas(
        entry.queries()["order_price_quantile_sketch"](SF_DIR)
    ).set_index("o_orderstatus")
    con = _duck()
    exact = con.sql(
        "SELECT o_orderstatus, "
        "quantile_cont(cents, 0.5) AS m, quantile_cont(cents, 0.9) AS p, "
        "max(cents) - min(cents) AS rng FROM (SELECT o_orderstatus, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders) "
        "GROUP BY o_orderstatus"
    ).df().set_index("o_orderstatus")
    con.close()
    assert sorted(got.index) == sorted(exact.index)
    for s in exact.index:
        rng = max(exact.loc[s, "rng"], 1)
        assert abs(got.loc[s, "approx_median_cents"] - exact.loc[s, "m"]) <= 0.01 * rng, s
        assert abs(got.loc[s, "approx_p90_cents"] - exact.loc[s, "p"]) <= 0.01 * rng, s


def test_q5_plan_paths_agree(ray_session):
    """q5's three physical plans (all-broadcast, customer-join +
    order-broadcast, full shuffle with bloom prefilter) must produce
    identical revenue rows; defaults take the all-broadcast path at
    test scale, so force each fallback via the caps and diff."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return (
            R.q5_revenue_by_nation(SF_DIR).to_pandas()
            .sort_values("n_name").reset_index(drop=True)
        )

    ref = run()
    old_c, old_o = R.Q5_CUST_BROADCAST_CAP, R.Q5_BROADCAST_ORDER_CAP
    try:
        R.Q5_CUST_BROADCAST_CAP = -1   # force the customer hash join
        mid = run()
        R.Q5_BROADCAST_ORDER_CAP = -1  # force bloom + lineitem join
        full = run()
        # the fourth combination: _OPrep's broadcast j1 (which KEEPS
        # unknown custkeys as c_nationkey=-1 rows) feeding the bloom
        # build + native lineitem join
        R.Q5_CUST_BROADCAST_CAP = old_c
        bcast_bloom = run()
    finally:
        R.Q5_CUST_BROADCAST_CAP, R.Q5_BROADCAST_ORDER_CAP = old_c, old_o
    pd.testing.assert_frame_equal(ref, mid)
    pd.testing.assert_frame_equal(ref, full)
    pd.testing.assert_frame_equal(ref, bcast_bloom)
    assert len(ref) > 0


def test_top_customers_combine_paths_agree(ray_session):
    """top_customers' coalesced combine (key domain under the cap) and
    the keyed-exchange scale path must produce identical top-10 rows."""
    from hexhamming_ray.pipelines import relational as R

    ref = R.top_customers(SF_DIR).to_pandas()
    old = R.TOPK_COALESCE_CAP
    try:
        R.TOPK_COALESCE_CAP = -1  # force the keyed exchange
        alt = R.top_customers(SF_DIR).to_pandas()
    finally:
        R.TOPK_COALESCE_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) == 10


def test_semi_join_paths_agree(ray_session):
    """orders_of_building_customers: the broadcast exact-lookup plan
    (build side under the cap) and the bloom-prefiltered native
    left_semi join must produce identical key sets."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return (
            R.orders_of_building_customers(SF_DIR).to_pandas()
            .sort_values("o_orderkey").reset_index(drop=True)
        )

    ref = run()
    old = R.SEMI_BROADCAST_KEY_CAP
    try:
        R.SEMI_BROADCAST_KEY_CAP = -1  # force bloom + hash join
        alt = run()
    finally:
        R.SEMI_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_line_dedup_merge_paths_agree(ray_session):
    """line_dedup_docs: the coalesced per-doc partial merge and the
    doc_id-keyed exchange must produce identical per-doc counts."""
    from hexhamming_ray.pipelines import text as T

    def run():
        return (
            T.line_dedup_docs(SF_DIR).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )

    ref = run()
    old = T.LINE_DEDUP_COALESCE_CAP
    try:
        T.LINE_DEDUP_COALESCE_CAP = -1  # force the keyed exchange
        alt = run()
    finally:
        T.LINE_DEDUP_COALESCE_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert (ref["kept_lines"] <= ref["n_lines"]).all()


def test_q5_empty_date_window(ray_session):
    """An order-date window matching no orders must return an empty
    result, not crash the broadcast fast path (pa.concat_tables([])
    regression)."""
    from hexhamming_ray.pipelines import relational as R

    out = R.q5_revenue_by_nation(
        SF_DIR, date_lo="1970-01-01", date_hi="1970-01-02"
    ).to_pandas()
    assert len(out) == 0


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_line_dedup_random_corpora_vs_reference(
    ray_session, tmp_path, seed
):
    """line_dedup_docs vs a pure-Python first-occurrence reference on
    randomized corpora with heavy cross-doc line duplication, empty
    lines and single-line docs — boundary cases a fixed fixture can
    miss (partition-boundary firsts, duplicate lines WITHIN one doc)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hexhamming_ray.pipelines import text as T

    rng = np.random.default_rng(seed)
    pool = [f"line {i}" for i in range(12)] + ["", "shared boiler"]
    texts = []
    for _ in range(80):
        k = int(rng.integers(1, 8))
        texts.append("\n".join(rng.choice(pool, k)))
    d = tmp_path / f"rnd{seed}"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(80), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 80, pa.string()),
                "source": pa.array(["s"] * 80, pa.string()),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
        d / "documents.parquet",
    )
    got = (
        T.line_dedup_docs(str(d)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    # reference: first global occurrence by (doc_id, line_no) survives
    seen: set = set()
    ref_rows = []
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = 0
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept += 1
        ref_rows.append((i, len(lines), kept))
    ref = pd.DataFrame(
        ref_rows, columns=["doc_id", "n_lines", "kept_lines"]
    )
    pd.testing.assert_frame_equal(got, ref)


def test_outer_broadcast_paths_agree(ray_session):
    """customer_order_counts / orders_above_cust_avg: the broadcast
    sorted-lookup plan (key domain under the cap) and the native hash
    join plan must produce identical results."""
    from hexhamming_ray.pipelines import relational as R

    for fn, key in (
        (R.customer_order_counts, "c_custkey"),
        (R.orders_above_cust_avg, "o_orderkey"),
    ):
        def run():
            return (
                fn(SF_DIR).to_pandas()
                .sort_values(key).reset_index(drop=True)
            )

        ref = run()
        old = R.OUTER_BROADCAST_KEY_CAP
        try:
            R.OUTER_BROADCAST_KEY_CAP = -1  # force the join plan
            alt = run()
        finally:
            R.OUTER_BROADCAST_KEY_CAP = old
        pd.testing.assert_frame_equal(ref, alt)
        assert len(ref) > 0


def test_full_outer_plans_agree(ray_session):
    """user_activity_full_outer: the tagged-union + grouped-sum plan
    and the native full_outer join must produce identical results."""
    from hexhamming_ray.pipelines import relational as R

    def run(plan):
        return (
            R.user_activity_full_outer(SF_DIR, plan=plan).to_pandas()
            .sort_values("id").reset_index(drop=True)
        )

    ref = run("union")
    alt = run("join")
    pd.testing.assert_frame_equal(ref, alt)
    # both key domains must survive: users with no orders would only
    # drop if the union plan lost a side
    assert (ref["n_events"] == 0).any() or (ref["n_orders"] == 0).any()


def test_emb_lsh_verify_paths_agree(ray_session):
    """embedding_near_dup_lsh: the broadcast cosine verify (pairs under
    the cap) and the distinct-exchange + two-hash-join scale path must
    produce identical pair sets."""
    from hexhamming_ray.stages import annsearch as A

    def run():
        return (
            A.embedding_near_dup_lsh(SF_DIR).to_pandas()
            .sort_values(["id_lo", "id_hi"]).reset_index(drop=True)
        )

    ref = run()
    old = A.EMB_BROADCAST_PAIR_CAP
    try:
        A.EMB_BROADCAST_PAIR_CAP = -1  # force the join path
        alt = run()
    finally:
        A.EMB_BROADCAST_PAIR_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q3_plan_paths_agree(ray_session):
    """q3_top_orders: the double-broadcast fast path and the
    two-native-join scale path must produce identical top-10s."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return (
            R.q3_top_orders(SF_DIR).to_pandas()
            .sort_values(["revenue_cents", "l_orderkey"],
                         ascending=[False, True])
            .reset_index(drop=True)
        )

    ref = run()
    olds = (R.SEMI_BROADCAST_KEY_CAP, R.Q3_BROADCAST_ORDER_CAP)
    try:
        R.SEMI_BROADCAST_KEY_CAP = -1
        R.Q3_BROADCAST_ORDER_CAP = -1  # force both native joins
        alt = run()
    finally:
        R.SEMI_BROADCAST_KEY_CAP, R.Q3_BROADCAST_ORDER_CAP = olds
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_ngram_exact_finalize_paths_agree(ray_session):
    """ngram_jaccard_exact: the broadcast Jaccard finalize (candidate
    pairs under the cap) and the two-hash-join scale path must produce
    identical pair sets."""
    from hexhamming_ray.pipelines import text as T

    def run():
        return (
            T.ngram_jaccard_exact(SF_DIR).to_pandas()
            .sort_values(["id_lo", "id_hi"]).reset_index(drop=True)
        )

    ref = run()
    old = T.BROADCAST_PAIR_CAP
    try:
        T.BROADCAST_PAIR_CAP = -1  # force the join path
        alt = run()
    finally:
        T.BROADCAST_PAIR_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_priority_counts_paths_agree(ray_session):
    """lineitem_priority_counts: the broadcast is_high lookup and the
    native hash join must produce identical counts."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return (
            R.lineitem_priority_counts(SF_DIR).to_pandas()
            .sort_values("l_returnflag").reset_index(drop=True)
        )

    ref = run()
    old = R.Q3_BROADCAST_ORDER_CAP
    try:
        R.Q3_BROADCAST_ORDER_CAP = -1  # force the join
        alt = run()
    finally:
        R.Q3_BROADCAST_ORDER_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q4_semi_paths_agree(ray_session):
    """q4_order_priority: the broadcast sorted-lookup EXISTS filter and
    the native left_semi join must produce identical counts."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q4_order_priority(SF_DIR)))

    ref = run()
    old = R.SEMI_BROADCAST_KEY_CAP
    try:
        R.SEMI_BROADCAST_KEY_CAP = -1  # force the native left_semi join
        alt = run()
    finally:
        R.SEMI_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) == 5


def test_q10_join_paths_agree(ray_session):
    """q10_returned_revenue: the broadcast (orderkey -> custkey) lookup
    + coalesced combine and the native hash join + keyed exchange must
    produce the identical top-k."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q10_returned_revenue(SF_DIR)))

    ref = run()
    olds = (R.Q10_BROADCAST_ORDER_CAP, R.TOPK_COALESCE_CAP)
    try:
        R.Q10_BROADCAST_ORDER_CAP = -1  # force the native join
        R.TOPK_COALESCE_CAP = -1        # force the keyed exchange
        alt = run()
    finally:
        R.Q10_BROADCAST_ORDER_CAP, R.TOPK_COALESCE_CAP = olds
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) == 20


def test_q14_part_join_paths_agree(ray_session):
    """q14_promo_effect: the broadcast (partkey -> is_promo) lookup and
    the native inner join must produce identical sums."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q14_promo_effect(SF_DIR)))

    ref = run()
    old = R.PART_BROADCAST_KEY_CAP
    try:
        R.PART_BROADCAST_KEY_CAP = -1  # force the native join
        alt = run()
    finally:
        R.PART_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert int(ref["total_cents"][0]) > 0


def test_q16_part_join_paths_agree(ray_session):
    """q16_brand_size_suppliers: broadcast part-attrs lookup vs native
    inner join feeding the same distinct machinery."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q16_brand_size_suppliers(SF_DIR)))

    ref = run()
    old = R.PART_BROADCAST_KEY_CAP
    try:
        R.PART_BROADCAST_KEY_CAP = -1
        alt = run()
    finally:
        R.PART_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q18_exchange_paths_agree(ray_session):
    """q18_large_orders: the coalesced per-order combine and the keyed
    exchange must produce the identical top-k."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q18_large_orders(SF_DIR)))

    ref = run()
    old = R.COALESCE_KEY_CAP
    try:
        R.COALESCE_KEY_CAP = -1  # force the keyed exchange
        alt = run()
    finally:
        R.COALESCE_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q19_part_join_paths_agree(ray_session):
    """q19_disjunctive_revenue: broadcast band lookup vs native join
    evaluating the same OR-of-ANDs predicate."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q19_disjunctive_revenue(SF_DIR)))

    ref = run()
    old = R.PART_BROADCAST_KEY_CAP
    try:
        R.PART_BROADCAST_KEY_CAP = -1
        alt = run()
    finally:
        R.PART_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert int(ref["revenue_cents"][0]) > 0


def test_q15_coalesce_paths_agree(ray_session):
    """q15_top_supplier: the coalesced per-supplier combine and the
    keyed exchange must produce the identical argmax set."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q15_top_supplier(SF_DIR)))

    ref = run()
    old = R.TOPK_COALESCE_CAP
    try:
        R.TOPK_COALESCE_CAP = -1  # force the keyed exchange
        alt = run()
    finally:
        R.TOPK_COALESCE_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) >= 1


def test_q17_part_join_paths_agree(ray_session):
    """q17_small_qty_revenue: the broadcast (brand partkeys + per-part
    aggregate) lookups and the double native-join plan must produce
    identical sums."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q17_small_qty_revenue(SF_DIR)))

    ref = run()
    old = R.PART_BROADCAST_KEY_CAP
    try:
        R.PART_BROADCAST_KEY_CAP = -1  # force the join plan
        alt = run()
    finally:
        R.PART_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert int(ref["n_small"][0]) > 0


def test_q22_anti_paths_agree(ray_session):
    """q22_idle_rich_customers: the broadcast sorted anti lookup and
    the native left_anti join must keep the identical customers."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q22_idle_rich_customers(SF_DIR)))

    ref = run()
    old = R.SEMI_BROADCAST_KEY_CAP
    try:
        R.SEMI_BROADCAST_KEY_CAP = -1  # force the left_anti join
        alt = run()
    finally:
        R.SEMI_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q21_join_paths_agree(ray_session):
    """q21_lone_late_suppliers: the broadcast orderdate lookup and the
    native inner join must produce the identical top-k."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q21_lone_late_suppliers(SF_DIR)))

    ref = run()
    olds = (R.Q10_BROADCAST_ORDER_CAP, R.TOPK_COALESCE_CAP)
    try:
        R.Q10_BROADCAST_ORDER_CAP = -1  # force the native join
        R.TOPK_COALESCE_CAP = -1        # force the keyed count exchange
        alt = run()
    finally:
        R.Q10_BROADCAST_ORDER_CAP, R.TOPK_COALESCE_CAP = olds
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q2_part_semi_paths_agree(ray_session):
    """q2_min_price_suppliers: broadcast size-slice semi lookup vs
    native left_semi join feeding the same argmin machinery."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q2_min_price_suppliers(SF_DIR)))

    ref = run()
    old = R.PART_BROADCAST_KEY_CAP
    try:
        R.PART_BROADCAST_KEY_CAP = -1
        alt = run()
    finally:
        R.PART_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q20_part_semi_paths_agree(ray_session):
    """q20_dominant_suppliers: broadcast brand semi lookup vs native
    left_semi join feeding the same dominance machinery."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q20_dominant_suppliers(SF_DIR)))

    ref = run()
    old = R.PART_BROADCAST_KEY_CAP
    try:
        R.PART_BROADCAST_KEY_CAP = -1
        alt = run()
    finally:
        R.PART_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q7_star_paths_agree(ray_session):
    """q7_region_volume: the all-broadcast plan and the native
    hash-join chain must produce identical grouped sums."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q7_region_volume(SF_DIR)))

    ref = run()
    old = R.Q10_BROADCAST_ORDER_CAP
    try:
        R.Q10_BROADCAST_ORDER_CAP = -1  # force the join chain
        alt = run()
    finally:
        R.Q10_BROADCAST_ORDER_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q8_star_paths_agree(ray_session):
    """q8_market_share: the all-broadcast plan and the native hash-join
    chain must produce identical shares."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q8_market_share(SF_DIR)))

    ref = run()
    old = R.Q10_BROADCAST_ORDER_CAP
    try:
        R.Q10_BROADCAST_ORDER_CAP = -1  # force the join chain
        alt = run()
    finally:
        R.Q10_BROADCAST_ORDER_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


def test_q9_star_paths_agree(ray_session):
    """q9_product_profit: broadcast part/supplier lookups vs native
    joins with the identical integer profit expression."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q9_product_profit(SF_DIR)))

    ref = run()
    old = R.PART_BROADCAST_KEY_CAP
    try:
        R.PART_BROADCAST_KEY_CAP = -1  # force the join chain
        alt = run()
    finally:
        R.PART_BROADCAST_KEY_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) > 0


TPCH_BATCH_QUERIES = [
    "q1_pricing_summary", "orders_by_status", "top_customers",
    "customers_per_region", "high_value_lineitems",
    "distinct_order_customers", "parts_top_price", "q3_top_orders",
    "lineitem_priority_counts", "order_count_histogram",
    "part_supplier_distinct", "customers_no_f_orders",
    "customers_with_high_orders", "supplier_balance_by_nation",
    "parts_price_bands", "q5_revenue_by_nation", "orders_pivot",
    "orders_unpivot", "customer_order_counts", "orders_above_cust_avg",
    "orders_rollup", "orders_cube", "orders_by_month",
    "supplier_rank_in_nation", "orders_of_building_customers",
    "lineitem_price_qty_cov", "q6_forecast_revenue",
    "q4_order_priority", "q10_returned_revenue", "q14_promo_effect",
    "q16_brand_size_suppliers", "q18_large_orders",
    "q19_disjunctive_revenue", "q15_top_supplier",
    "q17_small_qty_revenue", "q22_idle_rich_customers",
    "q21_lone_late_suppliers", "q2_min_price_suppliers",
    "q20_dominant_suppliers", "q7_region_volume", "q8_market_share",
    "q9_product_profit", "q11_important_parts",
]

TPCH_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem"]


@pytest.fixture(scope="module")
def adversarial_tpch_batch_dir(tmp_path_factory):
    """Synthetic TPC-H tables built to stress the relational shapes'
    edge cases the driver testdata can't: customers with NO orders,
    orders with NO lineitems, a hot customer and a hot order (skew),
    quantities/discounts/sizes sitting EXACTLY on each query's band
    boundaries (inclusive vs exclusive), shipdates exactly at window
    edges and exactly at the q21 +90-day late threshold, revenue ties
    at the q15 argmax, per-pair price ties at the q2 argmin, and
    negative/zero account balances at the q22 average."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    d = tmp_path_factory.mktemp("adv_tpch")

    def w(name, cols):
        pq.write_table(pa.table(cols), d / f"{name}.parquet")

    rnames = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    w("region", {
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(rnames),
    })
    w("nation", {
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(
            (np.arange(25) % 5).astype(np.int32)),
    })

    # 12 suppliers; nations cover ASIA (2,7,...) EUROPE (3,8,...),
    # NATION_3 (q8) multiply, several nations empty; balance ties,
    # zero and negative
    s_nk = np.array([3, 3, 2, 7, 8, 3, 12, 13, 1, 9, 2, 17],
                    dtype=np.int32)
    w("supplier", {
        "s_suppkey": pa.array(np.arange(1, 13, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i}" for i in range(1, 13)]),
        "s_nationkey": pa.array(s_nk),
        "s_acctbal": pa.array(
            [100.0, 100.0, -50.25, 0.0, 9999.99, 100.0, 42.42, -0.01,
             7.5, 7.5, 1.0, 2.0]),
    })

    # 60 customers: skew into nation 2 (ASIA), odd nations for q22,
    # BUILDING segment subset, ids 55..60 have NO orders
    c_nk = np.concatenate([
        np.full(20, 2), np.array([1, 3, 5, 7, 9, 11, 13, 15] * 3),
        np.arange(16) % 25,
    ])[:60].astype(np.int32)
    seg = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY"])[
        np.arange(60) % 3]
    bal = np.round(rng.uniform(-999, 9999, 60), 2)
    bal[:4] = [0.0, -1.0, 5000.0, 5000.0]  # zero/negative/tie
    w("customer", {
        "c_custkey": pa.array(np.arange(1, 61, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, 61)]),
        "c_nationkey": pa.array(c_nk),
        "c_acctbal": pa.array(bal),
        "c_mktsegment": pa.array(seg),
    })

    # 30 parts: brand/size pairs on the q19 band EDGES, PROMO +
    # STANDARD types, 'widget' names, retail ties; 29/30 unreferenced
    brands = (["Brand#1"] * 4 + ["Brand#2"] * 4 + ["Brand#3"] * 4
              + ["Brand#5"] * 5 + ["Brand#7"] * 5 + ["Brand#4"] * 8)
    sizes = [1, 5, 6, 15,   10, 11, 2, 15,   15, 16, 9, 1,
             15, 3, 7, 15, 20,   4, 8, 15, 2, 6,   1, 2, 3, 4, 5, 6,
             7, 8]
    ptypes = (["PROMO", "STANDARD"] * 15)
    pnames = [("small widget" if i % 2 == 0 else "large bolt")
              for i in range(30)]
    retail = np.round(rng.uniform(100, 2000, 30), 2)
    retail[1] = retail[0]  # tie
    w("part", {
        "p_partkey": pa.array(np.arange(1, 31, dtype=np.int64)),
        "p_name": pa.array(pnames),
        "p_brand": pa.array(brands),
        "p_type": pa.array(ptypes),
        "p_size": pa.array(np.array(sizes, dtype=np.int32)),
        "p_retailprice": pa.array(retail),
    })

    # 80 orders: hot customer 7, boundary dates, priority cycle,
    # totalprice ties; orders 71..80 get NO lineitems
    o_ck = rng.integers(1, 55, 80)
    o_ck[:15] = 7  # hot customer
    base_dates = [
        dt.datetime(1997, 7, 1),    # q4 lo edge (inclusive)
        dt.datetime(1997, 9, 30),
        dt.datetime(1997, 10, 1),   # q4 hi edge (exclusive)
        dt.datetime(2001, 1, 1),    # q22 cutoff edge (recent)
        dt.datetime(1996, 1, 1),    # q5/q8 lo edge
        dt.datetime(1995, 12, 31),
        dt.datetime(1997, 12, 31),
        dt.datetime(1998, 1, 1),
    ]
    dates = [base_dates[i % len(base_dates)] if i < 32 else
             dt.datetime(1995 + int(rng.integers(0, 6)),
                         int(rng.integers(1, 13)), 15)
             for i in range(80)]
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                     "4-NOT SPECIFIED", "5-LOW"])[np.arange(80) % 5]
    tot = np.round(rng.uniform(1000, 400000, 80), 2)
    tot[10] = tot[11]  # tie
    w("orders", {
        "o_orderkey": pa.array(np.arange(1, 81, dtype=np.int64)),
        "o_custkey": pa.array(o_ck.astype(np.int64)),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[np.arange(80) % 3]),
        "o_totalprice": pa.array(tot),
        "o_orderdate": pa.array(
            [pa.scalar(x, pa.timestamp("us")).as_py() for x in dates],
            pa.timestamp("us")),
        "o_orderpriority": pa.array(prio),
    })

    # lineitem: referential integrity (orderkeys 1..70, partkeys
    # 1..28, suppkeys 1..12); order 10 is hot (40 lines); boundary
    # quantities/discounts; shipdates at window edges and exactly
    # o_orderdate + 90 days (q21's strict >); a supplier-11/12 exact
    # revenue tie dominating Q1-1997 (q15 argmax ties)
    rows = []
    edge_qty = [1.0, 10.0, 11.0, 20.0, 24.0, 30.0, 50.0, 23.0]
    edge_disc = [0.05, 0.07, 0.06, 0.0, 0.1]
    lineno = {}
    for ok in range(1, 71):
        n_lines = 40 if ok == 10 else int(rng.integers(1, 6))
        od = dates[ok - 1]
        for j in range(n_lines):
            pk = int(rng.integers(1, 29))
            sk = int(rng.integers(1, 13))
            qty = edge_qty[int(rng.integers(0, len(edge_qty)))]
            disc = edge_disc[int(rng.integers(0, len(edge_disc)))]
            price = round(float(rng.uniform(10, 5000)), 2)
            mode = int(rng.integers(0, 5))
            if mode == 0:
                ship = od + dt.timedelta(days=90)   # exactly on edge
            elif mode == 1:
                ship = od + dt.timedelta(days=91)   # just late
            elif mode == 2:
                ship = dt.datetime(1997, 1, 1)      # q6/q15 lo edge
            elif mode == 3:
                ship = dt.datetime(1998, 1, 1)      # q6 hi edge
            else:
                ship = od + dt.timedelta(
                    days=int(rng.integers(1, 400)))
            rf = ["R", "A", "N"][int(rng.integers(0, 3))]
            if ok % 7 == 0:
                rf = "R"   # some orders all-returned
            if ok % 11 == 0:
                rf = "N"   # some orders never-returned
            ln = lineno.get(ok, 0) + 1
            lineno[ok] = ln
            rows.append((ok, pk, sk, ln, qty, price, disc, 0.05, rf,
                         "O", ship))
    # q15 tie: suppliers 11 and 12 dominate Q1-1997 equally
    for sk in (11, 12):
        ln = lineno.get(2, 0) + 1
        lineno[2] = ln
        rows.append((2, 1, sk, ln, 5.0, 999999.99, 0.0, 0.0, "N",
                     "O", dt.datetime(1997, 2, 1)))
    cols = list(zip(*rows))
    w("lineitem", {
        "l_orderkey": pa.array(np.array(cols[0], dtype=np.int64)),
        "l_partkey": pa.array(np.array(cols[1], dtype=np.int64)),
        "l_suppkey": pa.array(np.array(cols[2], dtype=np.int64)),
        "l_linenumber": pa.array(np.array(cols[3], dtype=np.int32)),
        "l_quantity": pa.array(np.array(cols[4], dtype=np.float64)),
        "l_extendedprice": pa.array(np.array(cols[5], dtype=np.float64)),
        "l_discount": pa.array(np.array(cols[6], dtype=np.float64)),
        "l_tax": pa.array(np.array(cols[7], dtype=np.float64)),
        "l_returnflag": pa.array(list(cols[8])),
        "l_linestatus": pa.array(list(cols[9])),
        "l_shipdate": pa.array(list(cols[10]), pa.timestamp("us")),
    })
    return str(d)


@pytest.mark.parametrize("name", TPCH_BATCH_QUERIES)
def test_relational_queries_on_adversarial_tpch(
    ray_session, adversarial_tpch_batch_dir, name
):
    entry = __import__("__ray_entry__")
    got = _norm(_to_pandas(entry.queries()[name](adversarial_tpch_batch_dir)))
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{adversarial_tpch_batch_dir}/{t}.parquet')"
        )
    want = _norm(con.sql(entry.oracle_sql()[name]).df())
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q12_join_paths_agree(ray_session):
    """q12_late_lines: the broadcast (orderkey -> orderdate, is_high)
    lookup and the sentinel-seeded native inner join must produce
    identical conditional counts."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q12_late_lines(SF_DIR)))

    ref = run()
    old = R.Q10_BROADCAST_ORDER_CAP
    try:
        R.Q10_BROADCAST_ORDER_CAP = -1  # force the native join
        alt = run()
    finally:
        R.Q10_BROADCAST_ORDER_CAP = old
    pd.testing.assert_frame_equal(ref, alt)
    assert len(ref) >= 1


def test_q13_semi_paths_agree(ray_session):
    """q13_customer_distribution: the broadcast customer-key probe +
    coalesced combine and the native left_semi join + keyed exchange
    must produce the identical histogram (zero bucket included)."""
    from hexhamming_ray.pipelines import relational as R

    def run():
        return _norm(_to_pandas(R.q13_customer_distribution(SF_DIR)))

    ref = run()
    olds = (R.SEMI_BROADCAST_KEY_CAP, R.COALESCE_KEY_CAP)
    try:
        R.SEMI_BROADCAST_KEY_CAP = -1  # force the native left_semi
        R.COALESCE_KEY_CAP = -1        # force the keyed exchange
        alt = run()
    finally:
        R.SEMI_BROADCAST_KEY_CAP, R.COALESCE_KEY_CAP = olds
    pd.testing.assert_frame_equal(ref, alt)
    # pin the zero bucket against the oracle's zero-order-customer count
    con = _duck()
    want_zero = con.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) FROM customer "
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = "
        "c_custkey AND o_orderpriority <> '4-NOT SPECIFIED')"
    ).fetchone()[0]
    got_zero = int(ref.loc[ref["c_count"] == 0, "custdist"].sum())
    assert got_zero == int(want_zero)


def test_q13_empty_qualifying_set(ray_session, tmp_path):
    """q13 on a corpus where EVERY order is excluded by the priority
    filter: the result must be the single (0, n_customers) row on all
    three plans, not an empty table or a shuffle crash."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hexhamming_ray.pipelines import relational as R

    d = tmp_path / "q13edge"
    d.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, 8), pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(7)], pa.string()),
        "c_nationkey": pa.array(np.zeros(7, np.int32), pa.int32()),
        "c_acctbal": pa.array(np.zeros(7), pa.float64()),
        "c_mktsegment": pa.array(["AUTO"] * 7, pa.string()),
    }), d / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 3, pa.string()),
        "o_totalprice": pa.array([1.0] * 3, pa.float64()),
        "o_orderdate": pa.array(
            [pd.Timestamp("1997-01-01")] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["4-NOT SPECIFIED"] * 3, pa.string()),
    }), d / "orders.parquet")

    def run():
        return _norm(_to_pandas(R.q13_customer_distribution(str(d))))

    ref = run()
    assert len(ref) == 1
    assert int(ref["c_count"].iloc[0]) == 0
    assert int(ref["custdist"].iloc[0]) == 7
    olds = (R.SEMI_BROADCAST_KEY_CAP, R.COALESCE_KEY_CAP)
    try:
        R.SEMI_BROADCAST_KEY_CAP = -1
        R.COALESCE_KEY_CAP = -1
        alt = run()
    finally:
        R.SEMI_BROADCAST_KEY_CAP, R.COALESCE_KEY_CAP = olds
    pd.testing.assert_frame_equal(ref, alt)


def test_lang_balance_explicit_cap(ray_session):
    """lang_balance_docs with an explicit cap keeps exactly min(cap,
    lang_size) docs per language, matching the windowed SQL at the
    same cap."""
    from hexhamming_ray.pipelines import text as T

    got = _norm(_to_pandas(T.lang_balance_docs(SF_DIR, cap=7)))
    con = _duck()
    want = _norm(con.sql(
        "SELECT doc_id, lang FROM ("
        " SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang"
        "  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn"
        " FROM documents) WHERE rn <= 7"
    ).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    sizes = got.groupby("lang").size()
    assert (sizes <= 7).all()
