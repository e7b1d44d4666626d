"""Motif (graph pattern) finding — GraphFrames-style `find()`.

The reference's traversal DSL walks a single chain from a frontier
(``STMGraph/src/Database/Graph/STMGraph/API.hs:252-346``); motif finding
generalizes it to arbitrary named patterns — `(a)-[e]->(b); (b)-[e2]->(c)`
— the analytical pattern-matching surface GraphX/GraphFrames exposes.

Spark-first: each pattern term is an equi-join of the edges table against
the bindings accumulated so far (shared vertex names become join keys);
Catalyst reorders/broadcasts as usual and a label filter on `e.label`
pushes into the (label-partitioned) edge scan. Repeated vertex names
express cycles (triangles); anonymous `()` / `[]` elements bind nothing.

Grammar (the GraphFrames positive subset):
    pattern   := term (';' term)*
    term      := '(' name? ')' '-[' name? ']->' '(' name? ')'
Output: one row per match; named vertices become struct columns
`{id, label}`, named edges `{id, src, dst, label}`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hgraphstorage_spark.snapshot import GraphSnapshot

_TERM = re.compile(r"^\((\w*)\)-\[(\w*)\]->\((\w*)\)$")


def _parse(pattern: str) -> list[tuple[str, str, str]]:
    terms = []
    anon = 0
    names_seen: set[str] = set()
    for raw in pattern.split(";"):
        m = _TERM.match(raw.strip())
        if not m:
            raise ValueError(f"bad motif term: {raw.strip()!r}")
        a, e, b = m.groups()
        if e and e in names_seen:
            raise ValueError(f"edge name reused: {e!r}")
        if e:
            names_seen.add(e)
        if not a:
            a, anon = f"__v{anon}", anon + 1
        if not b:
            b, anon = f"__v{anon}", anon + 1
        terms.append((a, e, b))
    return terms


def find_motif(snap: GraphSnapshot, pattern: str) -> DataFrame:
    """All matches of `pattern` in the snapshot.

    Named vertices with the same name unify (join); a term whose both
    endpoints are already bound adds a closing-edge constraint (cycles).
    Disconnected patterns take a cartesian product (as in GraphFrames).
    """
    terms = _parse(pattern)
    edges = snap.edges
    cur: DataFrame | None = None
    bound: set[str] = set()
    edge_names: list[str] = []

    for i, (a, e, b) in enumerate(terms):
        src_c, dst_c = f"__src_{i}", f"__dst_{i}"
        ecols = edges.select(
            F.col("src").alias(src_c),
            F.col("dst").alias(dst_c),
            F.struct("id", "src", "dst", "label").alias(e or f"__e{i}"),
        )
        if a == b:  # self-loop term
            ecols = ecols.filter(F.col(src_c) == F.col(dst_c))
        if cur is None:
            sel = [F.col(src_c).alias(f"__vid_{a}")]
            if b != a:
                sel.append(F.col(dst_c).alias(f"__vid_{b}"))
            if e:
                sel.append(F.col(e))
            cur = ecols.select(*sel)
        else:
            conds = []
            if a in bound:
                conds.append(F.col(f"__vid_{a}") == F.col(src_c))
            if b in bound:
                conds.append(F.col(f"__vid_{b}") == F.col(dst_c))
            if conds:
                cond = conds[0]
                for c in conds[1:]:
                    cond = cond & c
                joined = cur.join(ecols, cond)
            else:  # disconnected component of the pattern
                joined = cur.crossJoin(ecols)
            keep = [F.col(c) for c in cur.columns]
            if a not in bound:
                keep.append(F.col(src_c).alias(f"__vid_{a}"))
            if b not in bound and b != a:
                keep.append(F.col(dst_c).alias(f"__vid_{b}"))
            if e:
                keep.append(F.col(e))
            cur = joined.select(*keep)
        bound |= {a, b}
        if e:
            edge_names.append(e)

    assert cur is not None
    # hydrate named vertices with their labels (anonymous stay internal)
    named_vs = sorted(v for v in bound if not v.startswith("__v"))
    for v in named_vs:
        nv = snap.nodes.select(
            F.col("id").alias(f"__vid_{v}"), F.struct("id", "label").alias(v)
        )
        cur = cur.join(nv, f"__vid_{v}")
    return cur.select(*named_vs, *edge_names)
