"""Traversal ADT + fluent builder — the engine's query language.

Re-creates STMGraph's composable Gremlin-style Traversal monoid
(``STMGraph/src/Database/Graph/STMGraph/APITypes.hs:105-131``) as a Python
value: a traversal is a flat list of steps; composition is concatenation
(the reference's ``<>``). The compiler (compiler.py) folds the steps over a
DataFrame state exactly like the reference's ``doTraverse``
(``STMGraph/src/.../API.hs:252-346``) — except each step becomes a lazy
DataFrame transformation so Catalyst plans the whole chain at once.

Semantics pinned by the reference tests
(``STMGraph/test/.../APISpec.hs:170-389``):
- ``"*"`` in a type whitelist = all types (``API.hs:421``)
- empty whitelist = Empty result (``API.hs:299``)
- ``Both`` = ``In <> Out`` bag concatenation, duplicates preserved
  (``API.hs:308-313``, APISpec.hs:386-389)
- ``NID``/``EID`` drop missing ids silently (``API.hs:258-277``)
- result order is unspecified (storage order in the reference,
  explicitly unstable per APISpec.hs:256) — bag semantics everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

WILDCARD = "*"


@dataclass(frozen=True)
class Step:
    pass


@dataclass(frozen=True)
class Ns(Step):
    """All nodes (reference ``Ns``)."""


@dataclass(frozen=True)
class Es(Step):
    """All edges (reference ``Es``)."""


@dataclass(frozen=True)
class NID(Step):
    """Restrict to node ids; missing ids dropped (reference ``NID``)."""

    ids: tuple

    def __init__(self, ids: Sequence[int]):
        object.__setattr__(self, "ids", tuple(ids))


@dataclass(frozen=True)
class EID(Step):
    """Restrict to edge ids (reference ``EID``)."""

    ids: tuple

    def __init__(self, ids: Sequence[int]):
        object.__setattr__(self, "ids", tuple(ids))


@dataclass(frozen=True)
class Has(Step):
    """Keep nodes/edges having property name=value, equality including
    dtype (reference ``Has nv``, ``STMGraph/src/.../API.hs:278-295``)."""

    name: str
    value: object


@dataclass(frozen=True)
class HasLabel(Step):
    """Keep nodes/edges of the given type names.

    Engine extension: the reference folds type into traversal via typed-edge
    whitelists and ``rsTgtTypes`` (``HGraphStorage/src/.../Query.hs:59-60``);
    exposing it as a step lets label predicates push into the parquet scan.
    """

    labels: tuple

    def __init__(self, labels: Sequence[str] | str):
        if isinstance(labels, str):
            labels = (labels,)
        object.__setattr__(self, "labels", tuple(labels))


@dataclass(frozen=True)
class _Hop(Step):
    labels: tuple

    def __init__(self, labels: Sequence[str] | str = (WILDCARD,)):
        if isinstance(labels, str):
            labels = (labels,)
        object.__setattr__(self, "labels", tuple(labels))


class Out(_Hop):
    """Current nodes → target nodes along outgoing edges of given types."""


class In(_Hop):
    """Current nodes → source nodes along incoming edges."""


class Both(_Hop):
    """``In <> Out`` concatenation — duplicates preserved."""


class OutE(_Hop):
    """Current nodes → their outgoing edges."""


class InE(_Hop):
    """Current nodes → their incoming edges."""


class BothE(_Hop):
    """InE + OutE, duplicates preserved."""


@dataclass(frozen=True)
class Values(Step):
    """Project the given property names of the current set
    (reference ``Values [names]``, ``API.hs:296-297, 348-365``)."""

    names: tuple

    def __init__(self, names: Sequence[str]):
        object.__setattr__(self, "names", tuple(names))


@dataclass(frozen=True)
class AllValues(Step):
    """Project all property names present in the current set
    (reference ``AllValues`` + ``getPropNames``, ``API.hs:392-394``)."""


@dataclass(frozen=True)
class Limit(Step):
    """Keep at most n results (reference ``rsLimit``,
    ``HGraphStorage/src/.../Query.hs:24,63-64`` — count after all filters).
    Bag semantics: *which* n is unspecified, as in the reference."""

    n: int


@dataclass(frozen=True)
class Traversal:
    """A composed traversal (reference ``Composed [t..]`` monoid)."""

    steps: tuple = field(default_factory=tuple)

    # -- monoid composition (reference ``<>``)
    def __add__(self, other: "Traversal | Step") -> "Traversal":
        if isinstance(other, Step):
            return Traversal(self.steps + (other,))
        return Traversal(self.steps + other.steps)

    def step(self, s: Step) -> "Traversal":
        return Traversal(self.steps + (s,))

    # -- fluent builder API
    def ns(self) -> "Traversal":
        return self.step(Ns())

    def es(self) -> "Traversal":
        return self.step(Es())

    def nid(self, *ids: int) -> "Traversal":
        return self.step(NID(ids))

    def eid(self, *ids: int) -> "Traversal":
        return self.step(EID(ids))

    def has(self, name: str, value) -> "Traversal":
        return self.step(Has(name, value))

    def has_label(self, *labels: str) -> "Traversal":
        return self.step(HasLabel(labels))

    def out(self, *labels: str) -> "Traversal":
        return self.step(Out(labels or (WILDCARD,)))

    def in_(self, *labels: str) -> "Traversal":
        return self.step(In(labels or (WILDCARD,)))

    def both(self, *labels: str) -> "Traversal":
        return self.step(Both(labels or (WILDCARD,)))

    def out_e(self, *labels: str) -> "Traversal":
        return self.step(OutE(labels or (WILDCARD,)))

    def in_e(self, *labels: str) -> "Traversal":
        return self.step(InE(labels or (WILDCARD,)))

    def both_e(self, *labels: str) -> "Traversal":
        return self.step(BothE(labels or (WILDCARD,)))

    def values(self, *names: str) -> "Traversal":
        return self.step(Values(names))

    def all_values(self) -> "Traversal":
        return self.step(AllValues())

    def limit(self, n: int) -> "Traversal":
        return self.step(Limit(n))


def T() -> Traversal:
    """Start an empty traversal: ``T().ns().has("nm", "obj1").out("ref1")``."""
    return Traversal()
