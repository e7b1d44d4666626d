from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # small local runs for tests


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (r12 VERDICT task 2): the full suite outgrew the
    driver's verify budget (44 min → `tests_ok: false` on an apparent
    timeout, a standing correctness-gate risk). Depth tests carry
    @pytest.mark.slow and are SKIPPED by default — visibly, as 's'
    rows — so the default `pytest tests/` completes inside the budget
    while keeping every oracle-parity pin, the 51-row driver-hash
    replica, and the semantics tests in the default tier. The slow tier
    runs with SPARK_GRAFT_SLOW_TESTS=1 (or an explicit -m expression)."""
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS") == "1" or config.option.markexpr:
        return
    skip = pytest.mark.skip(
        reason="slow tier (SPARK_GRAFT_SLOW_TESTS=1 to run)"
    )
    for item in items:
        if item.get_closest_marker("slow"):
            item.add_marker(skip)


from hgraphstorage_spark import GraphEngine
from hgraphstorage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hgraphstorage-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(autouse=True)
def _release_pipeline_persists():
    """The test session is exactly the long-lived service
    ``pipeline.state`` documents: operators that track()-persist an
    intermediate (bm25's dl, exact-substring's gram stream, the
    semantic-dedup preps) would otherwise leave live cached frames
    behind, and Spark's cache manager substitutes a cached frame into
    ANY later structurally-equal subtree — a plan-shape test three
    files downstream then sees an InMemoryTableScan (with its cached
    child's wider ReadSchema) where it pinned a pruned file scan.
    Release after every test; unpersist is non-blocking and idempotent."""
    yield
    from hgraphstorage_spark.pipeline.state import release_all_tracked

    release_all_tracked()


@pytest.fixture()
def movie_engine(spark):
    """The HGraphStorage APITest movie/actor fixture (FIXTURES.md §2)."""
    eng = GraphEngine(spark)
    eng.add_nodes(
        [
            ("Actor", {"name": "Tom Hanks", "age": 60}),
            ("Movie", {"name": "Forrest Gump", "year": 1990}),
            ("Movie", {"name": "Sleepless in Seattle", "year": 1990}),
        ]
    )
    eng.add_edges(
        [
            (1, 2, "Played", {"role": "Forrest Gump"}),
            (1, 3, "Played", {"role": "Sam Baldwin"}),
        ]
    )
    eng.commit()
    return eng


@pytest.fixture()
def stm_engine(spark):
    """The STMGraph APISpec traversal fixture (FIXTURES.md §3): three type1
    nodes obj1/obj2/obj3; ref1/ref2 edges 1→2, 1→3, 2→1, plus 2→1 ref2."""
    eng = GraphEngine(spark)
    eng.add_nodes(
        [
            ("type1", {"nm": "obj1", "cnt": 1}),
            ("type1", {"nm": "obj2", "cnt": 2, "weight": 10}),
            ("type1", {"nm": "obj3", "cnt": 3}),
        ]
    )
    eng.add_edges(
        [
            (1, 2, "ref1", {"weight": 5}),
            (1, 3, "ref2", {"weight": 6, "since": 2016}),
            (2, 1, "ref1", {"weight": 7}),
            (2, 1, "ref2", {"weight": 8}),
        ]
    )
    eng.commit()
    return eng


def bag(df, cols=None):
    """Order-insensitive comparison helper (reference result order is
    storage order and explicitly unstable, APISpec.hs:256)."""
    rows = df.collect()
    if cols:
        return sorted(tuple(r[c] for c in cols) for r in rows)
    return sorted(tuple(r) for r in rows)
