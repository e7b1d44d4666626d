"""Index tests — ports of HGraphStorage IndexTest/APITest index scenarios
(``test/.../APITest.hs:128-174``, ``test/.../IndexTest.hs``)."""

from __future__ import annotations

import pytest

from hgraphstorage_spark import DuplicateIndexKey, GraphEngine, T

from tests.conftest import bag


@pytest.fixture()
def actor_engine(spark):
    """APITest.hs:128-165 fixture: Actor nodes with firstName/lastName."""
    eng = GraphEngine(spark)
    eng.add_nodes(
        [
            ("Actor", {"firstName": "Tom", "lastName": "Hanks"}),
            ("Actor", {"firstName": "Meg", "lastName": "Ryan"}),
            ("Movie", {"lastName": "NotAnActor"}),  # label-scoped index must skip
        ]
    )
    eng.commit()
    return eng


class TestIndex:
    def test_retroactive_build_and_lookup(self, actor_engine):
        actor_engine.add_index("LastName", labels=["Actor"], prop_names=["lastName"])
        hits = actor_engine.index_lookup("LastName", "Hanks")
        assert bag(hits, ["owner_id"]) == [(1,)]
        # label scoping: Movie's lastName not indexed
        assert actor_engine.index_lookup("LastName", "NotAnActor").count() == 0

    def test_prefix_scan(self, actor_engine):
        actor_engine.add_index("LastName", labels=["Actor"], prop_names=["lastName"])
        assert bag(actor_engine.index_prefix("LastName", "H"), ["owner_id"]) == [(1,)]
        assert actor_engine.index_prefix("LastName", "Hx").count() == 0

    def test_prefix_scan_ordered_depth_first(self, spark):
        """TrieSpec.hs:89-95 parity: ordered=True enumerates keys in
        depth-first (lexicographic) trie order."""
        eng = GraphEngine(spark)
        eng.add_nodes(
            [("W", {"k": key}) for key in ["abd", "ab", "abc", "b", "abcd", "aa"]]
        )
        eng.commit()
        eng.add_index("K", labels=["W"], prop_names=["k"])
        keys = [r["key"] for r in eng.index_prefix("K", "a", ordered=True).collect()]
        assert keys == ["aa", "ab", "abc", "abcd", "abd"]

    def test_duplicate_key_rejected_on_commit(self, actor_engine):
        # APITest.hs duplicate-key rejection on insert
        actor_engine.add_index("LastName", labels=["Actor"], prop_names=["lastName"])
        actor_engine.add_nodes([("Actor", {"firstName": "Colin", "lastName": "Hanks"})])
        with pytest.raises(DuplicateIndexKey):
            actor_engine.commit()
        actor_engine.rollback()

    def test_retroactive_duplicate_rejected(self, spark):
        # APITest.hs:158-165 — existing duplicates fail index creation
        eng = GraphEngine(spark)
        eng.add_nodes([("Actor", {"lastName": "Hanks"}), ("Actor", {"lastName": "Hanks"})])
        eng.commit()
        with pytest.raises(DuplicateIndexKey):
            eng.add_index("LastName", labels=["Actor"], prop_names=["lastName"])

    def test_index_maintained_across_update_delete(self, actor_engine):
        # APITest.hs:128-157 — re-key on update, removal on delete
        actor_engine.add_index("LastName", labels=["Actor"], prop_names=["lastName"])
        actor_engine.update_node(1, "Actor", {"firstName": "Tom", "lastName": "Cruise"})
        actor_engine.commit()
        assert actor_engine.index_lookup("LastName", "Hanks").count() == 0
        assert bag(actor_engine.index_lookup("LastName", "Cruise"), ["owner_id"]) == [(1,)]
        actor_engine.delete_nodes([1])
        actor_engine.commit()
        assert actor_engine.index_lookup("LastName", "Cruise").count() == 0

    def test_has_uses_index_rewrite(self, actor_engine):
        # compiler rewrites Has(lastName=...) into an index probe; result
        # must be identical to the un-indexed semi-join
        before = sorted(actor_engine.traverse(T().ns().has("lastName", "Ryan")).ids())
        actor_engine.add_index("LastName", labels=["Actor"], prop_names=["lastName"])
        after = sorted(actor_engine.traverse(T().ns().has("lastName", "Ryan")).ids())
        assert before == after == [2]

    def test_registry_persists_across_commits(self, actor_engine):
        # APITest.hs:166-174 — registry survives reopen; here: survives commits
        actor_engine.add_index("LastName", labels=["Actor"], prop_names=["lastName"])
        actor_engine.add_nodes([("Actor", {"firstName": "Val", "lastName": "Kilmer"})])
        actor_engine.commit()
        assert [r[0] for r in actor_engine.current.index_registry] == ["LastName"]
        assert bag(actor_engine.index_lookup("LastName", "Kilmer"), ["owner_id"]) == [(4,)]
