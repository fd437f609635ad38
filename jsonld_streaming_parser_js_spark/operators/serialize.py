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


# Term-validating statement split (W3C N-Quads grammar, r7 review
# hardening). Each position admits only the term kinds the grammar
# allows there — subject: IRI|bnode, predicate: IRI, object:
# IRI|bnode|literal, graph: IRI|bnode — so non-RDF garbage
# («foo bar baz .») and truncated literals («<s> <p> "x .») fail the
# match (ok=false) instead of yielding poisoned terms. The literal
# production consumes escape pairs ((?:[^"\\]|\\.)*), so a literal
# object containing spaces, '<g>'-shaped text, ' .'-shaped tails or
# bnode-like tails parses as ONE term and can never donate a fake
# graph label. Whitespace: tabs or multiple spaces between terms,
# optional leading/trailing whitespace, an optional «# comment» after
# the terminating dot, and an optional trailing \r (CRLF dumps split
# on '\n') — so dumps from other RDF toolchains ingest, not just this
# engine's canonical single-space output. Deliberate limit: SEPARATORS
# ARE REQUIRED ([ \t]+). The W3C grammar allows zero whitespace where
# tokens self-delimit («<s><p><o>.»), but optional separators next to
# a bnode label make the split ambiguous under backtracking and no
# mainstream serializer emits the zero-space form — requiring them is
# what keeps the two regex engines provably aligned; such lines land
# in the error channel. Bnode labels are the ASCII subset this engine
# emits. No backtracking ambiguity (alternatives are first-char
# disjoint), no lookarounds, and \z (not $ — java.util.regex lets $
# match BEFORE a final \r, RE2 does not) so java.util.regex and
# DuckDB's RE2 agree on every capture — verified adversarially in
# tests/test_spark_pipeline.py. No single quotes in the pattern (it
# interpolates into single-quoted DuckDB SQL verbatim).
_T_IRI = r"<[^>]*>"
_T_BNODE = r"_:[A-Za-z0-9_.-]+"
# escape pairs are \\[^\r], not \\. — java.util.regex's '.' excludes
# \r (a line terminator there) while RE2's '.' matches it, so '.'
# after a backslash would be the one spot the engines could disagree
_T_LIT = (r'"(?:[^"\\]|\\[^\r])*"'
          r"(?:\^\^<[^>]*>|@[A-Za-z]+(?:-[A-Za-z0-9]+)*)?")
NQUADS_STMT_RE = (
    r"^[ \t]*(" + _T_IRI + "|" + _T_BNODE + r")[ \t]+"
    r"(" + _T_IRI + r")[ \t]+"
    r"(" + _T_IRI + "|" + _T_BNODE + "|" + _T_LIT + r")"
    r"(?:[ \t]+(" + _T_IRI + "|" + _T_BNODE + r"))?"
    r"[ \t]*\.[ \t]*(?:#[^\r]*)?\r?\z")


def from_nquads(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """N-Quads SOURCE: parse statements back into the lexical quad
    columns (subj, pred, obj, graph) — the inverse of :func:`to_nquads`
    and the ingestion path for existing N-Quads dumps (the interchange
    format every RDF toolchain the reference serves can emit). Terms
    stay in N-Triples lexical form — that IS this engine's internal
    quad representation, so ``from_nquads(to_nquads(q)) == q`` exactly
    (escapes untouched in both directions).

    Blank lines and ``#`` comment lines (the N-Quads grammar's only
    non-statements) are dropped; anything else that fails the grammar —
    including non-RDF garbage and truncated literals, each term position
    is shape-validated — keeps its raw line with ``ok = false``, the
    same lenient error channel shape as the JSON-LD parser's. External
    dumps with spec-legal tab/multi-space separators or end-of-line
    comments parse too (see NQUADS_STMT_RE). Pure JVM regexp over a
    narrow map: no shuffle, no Python, linear at any scale.

    Reference anchor: the reference's test suite round-trips expected
    output through rdf-string N-Quads rendering (/root/reference/test);
    this operator is the matching parse direction. Bnode labels are
    restricted to the ASCII subset this engine emits (see
    NQUADS_STMT_RE comment)."""
    s = F.col(line_col)
    # blank = whitespace-only (space/tab/CR — r7 review: F.trim strips
    # only 0x20, so tab-blank and tab-indented comment lines previously
    # leaked into the error channel); comment = first non-blank is '#'
    kept = lines.where(~s.rlike(r"^[ \t\r]*\z") & ~s.rlike(r"^[ \t]*#"))
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
