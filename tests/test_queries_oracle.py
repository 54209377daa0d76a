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
    return res.to_pandas()  # ray Dataset


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
