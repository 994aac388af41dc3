"""Fixture-schema tripwire.

Round 3 silently lost ~8 queries/tests when the driver regenerated
``events.parquet`` with a different physical timestamp layout
(TIMESTAMP(NANOS) → timestamp[us]/NTZ) and every reader assumed the old
one.  This test pins the physical parquet schema of every fixture column
so drift fails in one obvious place with a message naming the moved
column — a 30-second diagnosis instead of a round lost to archaeology.

If this test fails: the DATA changed, not the code.  Update
``session.normalize_event_ts`` (and any reader the message points at) to
accept BOTH layouts, then update EXPECTED here.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [d for d in ("sf0.001", "sf0.01", "sf0.1") if os.path.isdir(f"/root/testdata/{d}")]

# canonical physical schema per table; "ts" lists every layout a reader
# must accept (session.normalize_event_ts handles both)
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string"}},
    "nation": {"n_nationkey": {"int32"}, "n_name": {"string"}, "n_regionkey": {"int32"}},
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[us, tz=UTC]"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp[us]", "timestamp[us, tz=UTC]"},
    },
    "events": {
        "event_id": {"int64"},
        # both layouts ever shipped; normalize_event_ts accepts each
        "ts": {"timestamp[us]", "timestamp[us, tz=UTC]", "timestamp[ns]"},
        "user_id": {"int64"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("sf", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_physical_schema(sf: str, table: str) -> None:
    path = f"/root/testdata/{sf}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    want = EXPECTED[table]
    assert set(got) == set(want), (
        f"FIXTURE DRIFT: {path} columns changed: got {sorted(got)}, "
        f"expected {sorted(want)} — audit every reader of '{table}'"
    )
    for col, allowed in want.items():
        assert got[col] in allowed, (
            f"FIXTURE DRIFT: {path} column '{col}' is now physical type "
            f"{got[col]!r} (known layouts: {sorted(allowed)}).  If this is "
            f"'ts', extend session.normalize_event_ts for the new layout; "
            f"otherwise audit every reader of '{table}'."
        )
