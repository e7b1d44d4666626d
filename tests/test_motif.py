"""Motif finding tests: chains, triangles, anonymous elements, cycles."""

from __future__ import annotations

import pytest

from hgraphstorage_spark import GraphEngine
from hgraphstorage_spark.motif import find_motif


@pytest.fixture(scope="module")
def motif_engine(spark):
    """1→2→3→1 triangle, 3→4 tail, 5→5 self-loop, isolated 6."""
    eng = GraphEngine(spark)
    eng.add_nodes([("N", {}) for _ in range(6)])
    eng.add_edges(
        [
            (1, 2, "e", {}),
            (2, 3, "e", {}),
            (3, 1, "e", {}),
            (3, 4, "e", {}),
            (5, 5, "loop", {}),
        ]
    )
    eng.commit()
    return eng


class TestMotif:
    def test_two_hop_chain(self, motif_engine):
        rows = find_motif(motif_engine.committed, "(a)-[e1]->(b); (b)-[e2]->(c)").collect()
        paths = sorted((r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in rows)
        assert paths == [(1, 2, 3), (2, 3, 1), (2, 3, 4), (3, 1, 2), (5, 5, 5)]

    def test_triangle(self, motif_engine):
        rows = find_motif(
            motif_engine.committed, "(a)-[e1]->(b); (b)-[e2]->(c); (c)-[e3]->(a)"
        ).collect()
        tris = sorted((r["a"]["id"], r["b"]["id"], r["c"]["id"]) for r in rows)
        # the 1→2→3→1 triangle in its 3 rotations + the self-loop cycle
        assert tris == [(1, 2, 3), (2, 3, 1), (3, 1, 2), (5, 5, 5)]

    def test_anonymous_vertex_and_edge(self, motif_engine):
        rows = find_motif(motif_engine.committed, "(a)-[]->()").collect()
        assert sorted(r["a"]["id"] for r in rows) == [1, 2, 3, 3, 5]
        assert rows[0].asDict().keys() == {"a"}  # anonymous elements not output

    def test_self_loop_pattern(self, motif_engine):
        rows = find_motif(motif_engine.committed, "(a)-[e]->(a)").collect()
        assert [(r["a"]["id"], r["e"]["label"]) for r in rows] == [(5, "loop")]

    def test_edge_label_filter_pushes_down(self, motif_engine):
        from pyspark.sql import functions as F

        df = find_motif(motif_engine.committed, "(a)-[e]->(b)").filter(
            F.col("e.label") == "loop"
        )
        assert [r["a"]["id"] for r in df.collect()] == [5]

    @pytest.mark.slow
    def test_disconnected_pattern_cartesian(self, motif_engine):
        rows = find_motif(motif_engine.committed, "(a)-[e1]->(a); (c)-[e2]->(d)").collect()
        # self-loop (1 match) × every edge (5) = 5 rows
        assert len(rows) == 5

    def test_reused_edge_name_rejected(self, motif_engine):
        with pytest.raises(ValueError, match="reused"):
            find_motif(motif_engine.committed, "(a)-[e]->(b); (b)-[e]->(c)")

    def test_bad_syntax_rejected(self, motif_engine):
        with pytest.raises(ValueError, match="bad motif"):
            find_motif(motif_engine.committed, "(a)->(b)")
