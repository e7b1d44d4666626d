"""Mutation + snapshot-versioning tests — ports of the HGraphStorage
APITest scenarios (``test/.../APITest.hs``) and the MVCC visibility
semantics (``LowLevelDB/test/.../MVCCSpec.hs``) mapped onto snapshots."""

from __future__ import annotations

import pytest

from hgraphstorage_spark import GraphEngine, T
from hgraphstorage_spark.query_step import list_properties

from tests.conftest import bag


class TestCrud:
    def test_create_and_read_back(self, movie_engine):
        snap = movie_engine.current
        assert snap.nb_nodes() == 3
        assert snap.nb_edges() == 2
        rows = bag(snap.nodes, ["id", "label"])
        assert rows == [(1, "Actor"), (2, "Movie"), (3, "Movie")]

    def test_multi_valued_properties(self, spark):
        eng = GraphEngine(spark)
        eng.add_nodes([("Actor", {"alias": ["Tom", "Tommy", "T."]})])
        eng.commit()
        props = list_properties(eng.current, 1)
        rows = props.collect()
        assert len(rows) == 1
        assert rows[0]["values"] == ["Tom", "Tommy", "T."]  # seq order kept

    def test_cascading_delete(self, movie_engine):
        # APITest.hs:55-68 — deleting the actor cascades both Played edges
        movie_engine.delete_nodes([1])
        movie_engine.commit()
        snap = movie_engine.current
        assert snap.nb_nodes() == 2
        assert snap.nb_edges() == 0
        # node props of deleted node gone, edge props of cascaded edges gone
        assert snap.props.filter("owner_id = 1 and owner_kind = 'node'").count() == 0
        assert snap.props.filter("owner_kind = 'edge'").count() == 0

    def test_delete_edge_keeps_nodes(self, movie_engine):
        movie_engine.delete_edges([1])
        movie_engine.commit()
        snap = movie_engine.current
        assert snap.nb_nodes() == 3
        assert snap.nb_edges() == 1
        assert bag(snap.edges, ["id"]) == [(2,)]

    def test_update_node_replaces_props(self, movie_engine):
        # APITest.hs:112-127 — property update/removal
        movie_engine.update_node(1, "Actor", {"name": "Tom Hanks", "oscars": 2})
        movie_engine.commit()
        props = bag(list_properties(movie_engine.current, 1), ["name"])
        assert props == [("name",), ("oscars",)]  # age gone

    def test_ids_not_reused_after_delete(self, movie_engine):
        # documented divergence from APITest.hs:105-111 (reference recycles)
        movie_engine.delete_nodes([3])
        movie_engine.commit()
        new_id = movie_engine.add_node("Movie", {"name": "Cast Away"})
        movie_engine.commit()
        assert new_id == 4  # max+1, not recycled 3

    def test_set_properties_partial_update(self, movie_engine):
        movie_engine.set_properties(2, "node", {"year": 1994})
        movie_engine.commit()
        props = dict(
            (r["name"], r["values"]) for r in list_properties(movie_engine.current, 2).collect()
        )
        assert props["year"] == ["1994"]
        assert props["name"] == ["Forrest Gump"]  # untouched


class TestCompaction:
    def test_long_mutation_session_compacts_and_preserves_state(self, spark):
        """Row-at-a-time sessions cross the COMPACT_EVERY threshold: the
        staged plan is materialized, and every row (nodes, edges, props)
        survives compaction + commit."""
        eng = GraphEngine(spark)
        n = GraphEngine.COMPACT_EVERY + 8
        for i in range(n):
            eng.add_node("N", {"k": i})
        ids = list(range(1, n + 1))
        for a, b in zip(ids, ids[1:]):
            eng.add_edge(a, b, "next")
        eng.commit()
        snap = eng.current
        assert snap.nb_nodes() == n
        assert snap.nb_edges() == n - 1
        assert snap.props.count() == n
        res = eng.traverse(T().nid(ids[0]).out("next"))
        assert [r["id"] for r in res.df.collect()] == [ids[1]]


class TestVersioning:
    def test_commit_bumps_version(self, spark):
        eng = GraphEngine(spark)
        assert eng.current.version == 0
        eng.add_node("A", {})
        v1 = eng.commit()
        assert v1 == 1
        eng.add_node("B", {})
        v2 = eng.commit()
        assert v2 == 2
        assert eng.versions == [0, 1, 2]

    def test_rollback_discards(self, spark):
        eng = GraphEngine(spark)
        eng.add_node("A", {})
        eng.commit()
        eng.add_node("B", {})
        assert eng.current.nb_nodes() == 2  # own uncommitted writes visible
        eng.rollback()
        assert eng.current.nb_nodes() == 1

    def test_time_travel_repeatable_read(self, spark):
        # MVCCSpec.hs:120-133 — a pinned snapshot keeps seeing deleted data
        eng = GraphEngine(spark)
        eng.add_nodes([("A", {"k": "v1"})])
        v1 = eng.commit()
        eng.delete_nodes([1])
        eng.commit()
        assert eng.snapshot_at(v1).nb_nodes() == 1
        assert eng.current.nb_nodes() == 0

    def test_uncommitted_invisible_to_committed_reader(self, spark):
        # MVCCSpec.hs:102-108 — another reader pins `committed`
        eng = GraphEngine(spark)
        eng.add_node("A", {})
        assert eng.committed.nb_nodes() == 0
        eng.commit()
        assert eng.committed.nb_nodes() == 1

    def test_wikipedia_mvcc_example(self, spark):
        """MVCCSpec.hs:134-165: T2 reads {Foo=Alpha, Bar=Beta}; T3 deletes
        Bar and inserts Foo-Bar; T2's pinned snapshot is unchanged."""
        eng = GraphEngine(spark)
        eng.add_nodes([("Row", {"k": "Foo", "v": "Alpha"}), ("Row", {"k": "Bar", "v": "Beta"})])
        v_t0 = eng.commit()
        # T2 starts reading at v_t0
        t2 = eng.snapshot_at(v_t0)
        # T3: delete Bar, insert Foo-Bar
        eng.delete_nodes([2])
        eng.add_node("Row", {"k": "Foo-Bar", "v": "Gamma"})
        eng.commit()
        t2_keys = bag(
            t2.props.filter("name = 'k'").select("text_v"), ["text_v"]
        )
        assert t2_keys == [("Bar",), ("Foo",)]
        now_keys = bag(eng.current.props.filter("name = 'k'").select("text_v"), ["text_v"])
        assert now_keys == [("Foo",), ("Foo-Bar",)]


class TestTraversalOverMutations:
    def test_out_after_delete(self, movie_engine):
        movie_engine.delete_edges([2])
        movie_engine.commit()
        res = movie_engine.traverse(T().nid(1).out("Played").values("name"))
        assert bag(res.df.select("value")) == [("Forrest Gump",)]


class TestSqlSurface:
    def test_views_and_sql(self, movie_engine):
        got = {
            r["label"]: r["n"]
            for r in movie_engine.sql(
                "SELECT label, count(*) AS n FROM graph_nodes GROUP BY label"
            ).collect()
        }
        assert got == {"Actor": 1, "Movie": 2}
        joined = movie_engine.sql(
            """SELECT n2.id AS movie_id
               FROM graph_edges e
               JOIN graph_nodes n1 ON e.src = n1.id
               JOIN graph_nodes n2 ON e.dst = n2.id
               WHERE n1.label = 'Actor' AND e.label = 'Played'"""
        )
        assert {r["movie_id"] for r in joined.collect()} == {2, 3}

    def test_views_pin_a_version(self, movie_engine):
        v = movie_engine.versions[-1]
        movie_engine.delete_nodes([1])
        movie_engine.commit()
        # pinned old version still sees the actor
        n_old = movie_engine.sql(
            "SELECT count(*) AS n FROM graph_nodes WHERE label = 'Actor'", version=v
        ).collect()[0]["n"]
        n_new = movie_engine.sql(
            "SELECT count(*) AS n FROM graph_nodes WHERE label = 'Actor'"
        ).collect()[0]["n"]
        assert (n_old, n_new) == (1, 0)
