"""Traversal algebra tests — ports of the STMGraph APISpec scenarios
(``STMGraph/test/Database/Graph/STMGraph/APISpec.hs:170-389``) and the
HGraphStorage QueryTest (``test/.../QueryTest.hs:19-51``), order-insensitive."""

from __future__ import annotations

from hgraphstorage_spark import T
from hgraphstorage_spark.compiler import KIND_EMPTY, KIND_NODES

from tests.conftest import bag


def ids(res):
    return sorted(res.ids())


class TestNodeSelection:
    def test_ns_all_nodes(self, stm_engine):
        assert ids(stm_engine.traverse(T().ns())) == [1, 2, 3]

    def test_nid_restricts_and_drops_missing(self, stm_engine):
        # missing ids silently dropped (APISpec: NID with unknown id)
        assert ids(stm_engine.traverse(T().nid(1, 3, 99))) == [1, 3]

    def test_nid_empty_is_empty(self, stm_engine):
        res = stm_engine.traverse(T().nid())
        assert res.kind == KIND_EMPTY
        assert res.count() == 0

    def test_es_all_edges(self, stm_engine):
        assert ids(stm_engine.traverse(T().es())) == [1, 2, 3, 4]

    def test_eid(self, stm_engine):
        assert ids(stm_engine.traverse(T().es().eid(2, 4, 77))) == [2, 4]


class TestHas:
    def test_has_text(self, stm_engine):
        assert ids(stm_engine.traverse(T().ns().has("nm", "obj1"))) == [1]

    def test_has_integer(self, stm_engine):
        assert ids(stm_engine.traverse(T().ns().has("cnt", 2))) == [2]

    def test_has_wrong_type_no_match(self, stm_engine):
        # Has matches value AND dtype: integer 1 != text "1"
        assert ids(stm_engine.traverse(T().ns().has("cnt", "1"))) == []

    def test_has_unknown_name(self, stm_engine):
        assert ids(stm_engine.traverse(T().ns().has("nope", "x"))) == []

    def test_has_on_edges(self, stm_engine):
        assert ids(stm_engine.traverse(T().es().has("weight", 7))) == [3]


class TestHops:
    def test_out_single_type(self, stm_engine):
        assert ids(stm_engine.traverse(T().nid(1).out("ref1"))) == [2]

    def test_out_wildcard(self, stm_engine):
        assert ids(stm_engine.traverse(T().nid(1).out("*"))) == [2, 3]

    def test_out_multiple_types(self, stm_engine):
        assert ids(stm_engine.traverse(T().nid(1).out("ref1", "ref2"))) == [2, 3]

    def test_out_unknown_type(self, stm_engine):
        assert ids(stm_engine.traverse(T().nid(1).out("nope"))) == []

    def test_out_empty_whitelist_is_empty(self, stm_engine):
        from hgraphstorage_spark.traversal import Out, Traversal, NID

        res = stm_engine.traverse(Traversal((NID([1]), Out(()))))
        assert res.kind == KIND_EMPTY

    def test_in(self, stm_engine):
        assert ids(stm_engine.traverse(T().nid(1).in_("ref1"))) == [2]
        assert ids(stm_engine.traverse(T().nid(1).in_("*"))) == [2, 2]

    def test_both_preserves_duplicates(self, stm_engine):
        # node1: out ref1→2, ref2→3; in ref1←2, ref2←2  (APISpec.hs:386-389)
        assert ids(stm_engine.traverse(T().nid(1).both("*"))) == [2, 2, 2, 3]
        assert ids(stm_engine.traverse(T().nid(1).both("ref1"))) == [2, 2]

    def test_oute_ine_bothe(self, stm_engine):
        assert ids(stm_engine.traverse(T().nid(1).out_e("*"))) == [1, 2]
        assert ids(stm_engine.traverse(T().nid(1).in_e("*"))) == [3, 4]
        assert ids(stm_engine.traverse(T().nid(1).both_e("ref2"))) == [2, 4]

    def test_edges_to_nodes(self, stm_engine):
        # J4: edge set → endpoint node set
        res = stm_engine.traverse(T().nid(1).out_e("*").out())
        assert ids(res) == [2, 3]
        res = stm_engine.traverse(T().nid(1).out_e("*").in_())
        assert ids(res) == [1, 1]

    def test_multi_hop(self, stm_engine):
        # 1 -ref1-> 2 -ref1-> 1 ; 2 -ref2-> 1
        assert ids(stm_engine.traverse(T().nid(1).out("ref1").out("*"))) == [1, 1]

    def test_has_then_out(self, stm_engine):
        assert ids(stm_engine.traverse(T().ns().has("nm", "obj1").out("ref2"))) == [3]

    def test_empty_short_circuits(self, stm_engine):
        res = stm_engine.traverse(T().nid().out("ref1").all_values())
        assert res.kind == KIND_EMPTY
        assert res.count() == 0


class TestValues:
    def test_values_selected_names(self, stm_engine):
        res = stm_engine.traverse(T().nid(2).values("nm", "cnt"))
        rows = bag(res.df.select("id", "name", "value"))
        assert rows == [(2, "cnt", "2"), (2, "nm", "obj2")]

    def test_values_missing_name_gives_no_rows_for_it(self, stm_engine):
        res = stm_engine.traverse(T().nid(1).values("weight"))
        # node1 has no weight: owner still present with NULL name (echo)
        rows = bag(res.df.select("id", "name", "value"))
        assert rows == [(1, None, None)]

    def test_all_values(self, stm_engine):
        res = stm_engine.traverse(T().nid(2).all_values())
        rows = bag(res.df.select("name", "value"))
        assert rows == [("cnt", "2"), ("nm", "obj2"), ("weight", "10")]

    def test_values_on_edges(self, stm_engine):
        res = stm_engine.traverse(T().es().eid(2).values("since"))
        rows = bag(res.df.select("id", "kind", "name", "value"))
        assert rows == [(2, "edge", "since", "2016")]

    def test_values_after_hop(self, stm_engine):
        res = stm_engine.traverse(T().ns().has("nm", "obj1").out("*").values("nm"))
        rows = bag(res.df.select("name", "value"))
        assert rows == [("nm", "obj2"), ("nm", "obj3")]


class TestLimit:
    def test_limit(self, stm_engine):
        res = stm_engine.traverse(T().nid(1).both("*").limit(2))
        assert res.count() == 2
        assert res.kind == KIND_NODES

    def test_limit_larger_than_result(self, stm_engine):
        assert stm_engine.traverse(T().ns().limit(10)).count() == 3
