"""Driver-contract integrity: every query runs at sf0.001, oracle coverage,
column-name discipline (the driver hash-compares by sorted column name)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from duckdb_extension_kafquack_spark.suite import REGISTRY
from tests.conftest import SF_DIR


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_callable_and_most_have_oracles():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # ≥90% of queries are strongly (hash-)checked
    assert len(oracles) / len(qs) >= 0.9


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_and_matches_oracle_rowcount(spark, name):
    """Cheap per-query gate at sf0.001: runs, yields a schema, and (when
    an oracle exists) row-counts match DuckDB.  Full value-hash parity is
    tools/oracle_check.py at sf0.01."""
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    if q.oracle is None:
        return
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    want = con.execute(f"SELECT COUNT(*) FROM ({q.oracle})").fetchone()[0]
    assert n == want, f"{name}: spark={n} duck={want}"
    spark_cols = sorted(c.lower() for c in df.columns)
    duck_cols = sorted(
        d[0].lower() for d in con.execute(f"SELECT * FROM ({q.oracle}) LIMIT 0").description
    )
    assert spark_cols == duck_cols, f"{name}: {spark_cols} != {duck_cols}"


def test_driver_order_tiers_unverified_first():
    """The driver gate caps at 50 queries/round; _driver_order must put
    never-sampled queries first, then red/stale verdicts, then current
    greens — and cover the whole registry exactly once.  Stale = the
    query's implementing module was committed or edited after the
    CORRECTNESS file recording its latest verdict, so this test can only
    pin the coarse invariants (never-sampled first, full coverage)."""
    order = entry_mod._driver_order()
    assert sorted(order) == sorted(REGISTRY)
    verdicts = entry_mod._latest_driver_verdicts()
    for v, path in verdicts.values():
        assert isinstance(v, dict) and path.endswith(".json")

    def coarse_tier(n):
        v = verdicts.get(n)
        if v is None:
            return 0
        green = v[0].get("err") is None and all(
            v[0].get(k) is not False
            for k in ("rows_match", "schema_match", "hash_match")
        )
        return 2 if green else 1

    # never-sampled queries lead; red verdicts precede any green
    first_green = min(
        (order.index(n) for n in order if coarse_tier(n) == 2), default=len(order)
    )
    for n in order:
        if coarse_tier(n) == 0:
            assert order.index(n) < first_green
        if coarse_tier(n) == 1:
            # reds are stale-or-red tier: before every CURRENT green is
            # not checkable here (staleness depends on git state), but
            # they must not trail the entire ordering
            assert order.index(n) < len(order)
    # every query new this round (no verdict yet) must sit inside the
    # 50-query cap so CORRECTNESS_r{N+1} gives it a verdict
    unverified = [n for n in order if coarse_tier(n) == 0]
    assert all(order.index(n) < 50 for n in unverified)


def test_fingerprint_closure_reaches_helpers_and_is_stable():
    """Driver staleness is decided by per-query source-closure
    fingerprints: the closure must reach through the registered wrapper
    into the operator helpers and module constants it composes (editing
    containment_pairs or PREFIX_EXTRA must change dedup_containment's
    fingerprint), and the hash must be deterministic across calls."""
    from duckdb_extension_kafquack_spark.fingerprint import (
        _closure_parts,
        registry_fingerprints,
    )

    parts = _closure_parts(REGISTRY["dedup_containment"].fn)
    assert any(k.endswith(":containment_pairs") for k in parts)
    assert any(k.endswith(":_containment_sets") for k in parts)
    assert any(k.endswith(":PREFIX_EXTRA") for k in parts)
    fp1, fp2 = registry_fingerprints(), registry_fingerprints()
    assert fp1 == fp2 and len(fp1) == len(REGISTRY)
    # runtime-import resolution: fuzzy_contamination imports its dedup
    # helpers INSIDE the function body, not at module level
    fparts = _closure_parts(REGISTRY["fuzzy_contamination"].fn)
    assert any(k.endswith(":minhash_bands") for k in fparts)


def test_stable_repr_breaks_cycles_and_names_swapped_objects():
    """r9 advice: a self-referential module constant must fingerprint
    (not RecursionError), a DAG-shared acyclic object must still repr
    FULLY at each occurrence (the cycle guard is a recursion stack, not
    a visited set), and two different address-bearing callables inside
    a container constant must produce DIFFERENT tokens (a bare type
    name made swapping one for another invisible to the staleness
    gate)."""
    from duckdb_extension_kafquack_spark.fingerprint import _closure_parts
    from duckdb_extension_kafquack_spark.operators import dedup

    cyc: dict = {}
    cyc["self"] = cyc
    shared = [1, 2]
    import re as _re_a
    import json as _js_b

    dedup._FPTEST_CYCLE = cyc
    dedup._FPTEST_DAG = [shared, shared]
    dedup._FPTEST_FNS = [_re_a.compile, _js_b.dumps]
    try:

        def probe():
            return dedup._FPTEST_CYCLE, dedup._FPTEST_DAG, dedup._FPTEST_FNS

        probe.__module__ = "duckdb_extension_kafquack_spark._fptest"
        parts = _closure_parts(probe)
        cyc_repr = next(v for k, v in parts.items() if "FPTEST_CYCLE" in k)
        dag_repr = next(v for k, v in parts.items() if "FPTEST_DAG" in k)
        assert "<cycle>" in cyc_repr
        assert dag_repr.count("list[1,2]") == 2  # shared object reprs fully

        fn_repr_a = next(v for k, v in parts.items() if "FPTEST_FNS" in k)
        dedup._FPTEST_FNS = [_js_b.dumps, _re_a.compile]  # swapped
        parts2 = _closure_parts(probe)
        fn_repr_b = next(v for k, v in parts2.items() if "FPTEST_FNS" in k)
        assert fn_repr_a != fn_repr_b  # the swap is visible to the gate
    finally:
        del dedup._FPTEST_CYCLE, dedup._FPTEST_DAG, dedup._FPTEST_FNS


def test_plans_md_covers_every_batch_llm_pipeline_query():
    """r7 verdict item 4: every registered batch query from the
    LLM-pipeline modules (operators/*, functions/udf) must appear in
    PLANS.md, so a last-minute query can't skip the plan audit (the way
    fuzzy_contamination did in round 7).  Streaming queries are exempt
    by module — their returned DataFrame is a memory-sink read, not the
    streaming plan."""
    import re

    with open("/root/repo/PLANS.md") as f:
        audited = set(re.findall(r"^## (\S+)", f.read(), re.M))
    batch_llm = tuple(
        f"duckdb_extension_kafquack_spark.{m}"
        for m in ("operators.", "functions.udf")
    )
    required = {
        n for n, q in REGISTRY.items() if q.fn.__module__.startswith(batch_llm)
    }
    missing = sorted(required - audited)
    assert not missing, f"queries missing from PLANS.md: {missing}"
