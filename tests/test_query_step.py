"""queryStep compat tests — ports of HGraphStorage QueryTest
(``test/.../QueryTest.hs:19-51``) on the movie fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from hgraphstorage_spark.query_step import (
    Direction,
    filter_objects,
    filter_relations,
    get_object,
    list_properties,
    query_step,
)

from tests.conftest import bag


class TestQueryStep:
    def test_out(self, movie_engine):
        res = query_step(movie_engine.current, 1, Direction.OUT)
        assert bag(res, ["rel_id", "target_id"]) == [(1, 2), (2, 3)]

    def test_in(self, movie_engine):
        res = query_step(movie_engine.current, 2, Direction.IN)
        assert bag(res, ["rel_id", "target_id", "dir"]) == [(1, 1, "IN")]

    def test_both(self, movie_engine):
        out_in = query_step(movie_engine.current, 1, Direction.BOTH)
        assert out_in.count() == 2  # both edges are outgoing from 1

    def test_rel_type_whitelist(self, movie_engine):
        assert query_step(movie_engine.current, 1, rel_types=["Played"]).count() == 2
        assert query_step(movie_engine.current, 1, rel_types=["Directed"]).count() == 0

    def test_tgt_type_whitelist(self, movie_engine):
        assert query_step(movie_engine.current, 1, tgt_types=["Movie"]).count() == 2
        assert query_step(movie_engine.current, 1, tgt_types=["Actor"]).count() == 0

    def test_limit_counts_accepted(self, movie_engine):
        # QueryTest: limit=1 → exactly 1 accepted result
        assert query_step(movie_engine.current, 1, limit=1).count() == 1

    def test_tgt_filter(self, movie_engine):
        res = query_step(movie_engine.current, 1, tgt_filter=F.col("target_id") == 3)
        assert bag(res, ["target_id"]) == [(3,)]


class TestScans:
    def test_filter_objects(self, movie_engine):
        res = filter_objects(movie_engine.current, F.col("label") == "Movie")
        assert bag(res, ["id"]) == [(2,), (3,)]

    def test_filter_relations_populates_endpoints(self, movie_engine):
        res = filter_relations(movie_engine.current, F.col("dst_label") == "Movie")
        assert bag(res, ["id", "src_label", "dst_label"]) == [
            (1, "Actor", "Movie"),
            (2, "Actor", "Movie"),
        ]

    def test_get_object(self, movie_engine):
        assert bag(get_object(movie_engine.current, 2), ["id", "label"]) == [(2, "Movie")]
        assert get_object(movie_engine.current, 99).count() == 0

    def test_list_properties_groups_multivalues(self, movie_engine):
        props = {r["name"]: (r["dtype"], r["values"]) for r in list_properties(movie_engine.current, 1).collect()}
        assert props == {"name": ("text", ["Tom Hanks"]), "age": ("integer", ["60"])}
