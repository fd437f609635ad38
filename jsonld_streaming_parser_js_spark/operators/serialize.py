"""N-Quads serialization sink (W3C RDF 1.1 N-Quads).

The quad columns already hold N-Triples lexical terms (`<iri>`, `"lit"`,
`_:bnode` — parser.py emits canonical lexical forms, escapes included),
so serialization is pure JVM string concatenation: a narrow map over the
scan, no Python, no shuffle — linear at any corpus size. This is the
interchange-format twin of the parquet/Iceberg quad sinks
(plans/lineage.py): `df.write.text(...)` on the output column streams
N-Quads files directly.

Reference anchor: the reference emits RDF/JS quads whose N-Quads
rendering is exactly this concatenation (rdf-string serialization used
throughout /root/reference/test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Term-aware statement split. The object term is the only one that may
# contain spaces (inside a quoted literal), so it is non-greedy and the
# optional graph label is restricted to forms that CANNOT appear as a
# literal tail: an IRI ref (no '>' inside) or an ASCII bnode label with
# no '"' — a literal object ending in «... _:x" .» therefore cannot
# donate a fake graph (the quote is outside the label charset and the
# match backtracks to the full literal). Verified adversarially against
# DuckDB's RE2 in tests/test_spark_pipeline.py so BOTH engines parse
# identically (java.util.regex and RE2 agree on leftmost-first
# captures for this pattern).
NQUADS_STMT_RE = (
    r"^(\S+) (\S+) (.*?)"
    r"(?: (<[^>]*>|_:[A-Za-z0-9_.-]+))? \.$")


def from_nquads(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """N-Quads SOURCE: parse statements back into the lexical quad
    columns (subj, pred, obj, graph) — the inverse of :func:`to_nquads`
    and the ingestion path for existing N-Quads dumps (the interchange
    format every RDF toolchain the reference serves can emit). Terms
    stay in N-Triples lexical form — that IS this engine's internal
    quad representation, so ``from_nquads(to_nquads(q)) == q`` exactly
    (escapes untouched in both directions).

    Blank lines and ``#`` comment lines (the N-Quads grammar's only
    non-statements) are dropped; anything else that fails the grammar
    keeps its raw line with ``ok = false`` — the same lenient error
    channel shape as the JSON-LD parser's. Pure JVM regexp over a
    narrow map: no shuffle, no Python, linear at any scale.

    Reference anchor: the reference's test suite round-trips expected
    output through rdf-string N-Quads rendering (/root/reference/test);
    this operator is the matching parse direction. Bnode labels are
    restricted to the ASCII subset this engine emits (see
    NQUADS_STMT_RE comment)."""
    s = F.trim(F.col(line_col))
    kept = lines.where((s != "") & ~s.startswith("#"))
    return kept.select(
        "*",
        F.regexp_extract(s, NQUADS_STMT_RE, 1).alias("subj"),
        F.regexp_extract(s, NQUADS_STMT_RE, 2).alias("pred"),
        F.regexp_extract(s, NQUADS_STMT_RE, 3).alias("obj"),
        F.regexp_extract(s, NQUADS_STMT_RE, 4).alias("graph"),
        s.rlike(NQUADS_STMT_RE).alias("ok"))


def to_nquads(quads: DataFrame) -> DataFrame:
    """(url, blk, line): one N-Quads statement per quad. The default
    graph ('') omits the graph label, named graphs include it — the
    W3C N-Quads grammar's optional graphLabel."""
    with_graph = F.concat_ws(" ", "subj", "pred", "obj", "graph")
    without = F.concat_ws(" ", "subj", "pred", "obj")
    line = F.concat(
        F.when(F.col("graph") != "", with_graph).otherwise(without),
        F.lit(" ."))
    return quads.select("url", "blk", line.alias("line"))
