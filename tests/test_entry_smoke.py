"""Driver-contract smoke: entry() runs on sf0.001 and yields stable
rows; every queries() key is callable; oracle_sql keys are a subset of
queries keys."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_contract(ray_session):
    import __ray_entry__ as E

    qs = E.queries()
    sqls = E.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 20
    res = E.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) == 500  # sf0.001 documents
    assert set(df.columns) == {"doc_id", "cluster_id"}
