"""Source-level lint for the query registry (VERDICT r3 #3).

Python silently accepts duplicate keys in a dict literal (last one
wins) and silently shadows a re-defined module-level function — both
bit us in round 3: a second ``q_pii_scrub`` def shadowed the first,
and a duplicate ``"pii_scrub"`` registry key made the family run
twice in bench while the driver attested the wrong implementation.
These tests parse the SOURCE, not the imported module, so the
collapsed-away duplicates are visible.
"""

import ast
from pathlib import Path

import news_combinator_spark.plans.queries as q

SRC = Path(q.__file__).read_text()
TREE = ast.parse(SRC)


def _dict_literal_keys(var_name):
    for node in ast.walk(TREE):
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == var_name
                for t in node.targets
            )
            and isinstance(node.value, ast.Dict)
        ):
            return [
                k.value
                for k in node.value.keys
                if isinstance(k, ast.Constant)
            ]
    raise AssertionError(f"{var_name} dict literal not found")


def test_no_duplicate_registry_keys():
    keys = _dict_literal_keys("_QUERIES_BY_FAMILY")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert dupes == [], f"duplicate _QUERIES_BY_FAMILY keys: {dupes}"


def test_no_shadowed_module_level_defs():
    names = [
        n.name
        for n in TREE.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert dupes == [], f"shadowed module-level defs: {dupes}"


def test_rotation_window_is_exactly_50_and_loses_nothing():
    assert len(q._ALWAYS_ATTEST) + len(q._R5_ROTATION) == 50
    window = q._ALWAYS_ATTEST + q._R5_ROTATION
    assert len(set(window)) == 50, "duplicate names in the window"
    assert list(q.QUERIES)[:50] == window
    assert set(q.QUERIES) == set(q._QUERIES_BY_FAMILY)


def test_bench_families_unique_and_registered():
    import bench

    fams = bench.SQL_BENCH_QUERIES
    dupes = sorted({f for f in fams if fams.count(f) > 1})
    assert dupes == [], f"duplicate bench families: {dupes}"
    unknown = sorted(set(fams) - set(q._QUERIES_BY_FAMILY))
    assert unknown == [], f"bench families not in registry: {unknown}"


def test_every_window_query_has_an_oracle_or_is_declared_rows_only():
    rows_only = {
        name
        for name, (_fn, sql) in q.QUERIES.items()
        if sql is None
    }
    # the contract-exempt set: sequential-consume clusterings only
    assert rows_only <= {"news_clusters_lsh", "v1_cross_source_clusters"}
