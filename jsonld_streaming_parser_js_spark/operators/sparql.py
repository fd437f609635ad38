"""SPARQL text front-end: parse a SPARQL subset into the engine's
pattern operators (operators/bgp.py) and execute it on the quad frame.

This is the usability capstone over the query operators — a KG
consumer writes the query they already know instead of pattern
tuples:

    sparql_query(kg, '''
        PREFIX schema: <http://schema.org/>
        SELECT ?a ?n WHERE {
          ?a a schema:Article .
          ?a schema:author ?p .
          ?p schema:name ?n .
          OPTIONAL { ?p schema:email ?e }
          FILTER (?n != "Author 0")
        } LIMIT 10
    ''')

Supported subset (documented, validated — anything else raises with
the offending token, never silently misparses):

- ``PREFIX`` declarations; prefixed names expand in patterns and
  templates.
- ``SELECT [DISTINCT] ?v ... | *``  /  ``CONSTRUCT { template }``.
- ``WHERE { ... }`` group: triple patterns separated by ``.``, with
  ``a`` for rdf:type, ``<iri>``, prefixed names, ``?vars``,
  ``"literals"`` (with optional ``@lang`` or ``^^<dt>`` /
  ``^^prefix:name``), and one-or-more property paths (``pred+``).
- ``OPTIONAL { ... }`` blocks (well-designed restriction enforced by
  bgp_match), ``MINUS { ... }`` negation (anti-join on the shared
  required-bound variables; disjoint-domain MINUS raises instead of
  silently removing nothing), and ``FILTER (...)`` constraints.
- ``GRAPH ?g { ... }`` / ``GRAPH <iri> { ... }`` as the whole WHERE
  body: a graph variable ranges over the NAMED graphs (the default
  graph's '' label is excluded, per SPARQL) and binds on every
  pattern; an IRI selects that one named graph. Overrides the
  ``graph`` argument. Property paths inside ``GRAPH ?var`` raise
  (the closure would have to run per graph).
- top-level ``{ A } UNION { B } [UNION { C } ...]`` inside WHERE:
  each branch is a full group (triples/OPTIONAL/FILTER, at least one
  required triple — empty/FILTER-only branches raise at parse);
  solutions union with SPARQL bag semantics — the domain is the
  variable union, branch-unbound variables come back null.
- ``ORDER BY ?v [DESC(?v)] ...`` and ``LIMIT n``. CAVEAT (documented
  divergence, the one place the subset answers rather than raises
  with non-SPARQL ordering): ORDER BY sorts the N-Triples LEXICAL
  term encoding under binary collation — deterministic and identical
  across engines, but NOT SPARQL 15.1 value ordering (numeric typed
  literals sort as strings, literals sort before IRIs). Plain SELECT
  orders BEFORE projection (any bound variable is sortable); SELECT
  DISTINCT restricts ORDER BY to projected variables, mirroring the
  spec's own DISTINCT constraint.

Out of scope (raise): subqueries, aggregates, nested UNION (branches
are flat groups), GRAPH blocks mixed with default-graph triples or
inside UNION branches, ``*``/``?``/``|``/``/`` paths beyond ``+``,
blank-node syntax, and numeric-typed FILTER arithmetic. The engine's
rollup/window lanes cover aggregation through the DataFrame API
instead.

FILTER translation: SPARQL expressions become Spark SQL over the
binding columns — ``?x`` -> column ``x``, ``&&``/``||``/``!`` ->
``AND``/``OR``/``NOT``, and RDF terms become comparisons against the
engine's N-Triples lexical encoding (``"lit"`` compares the term
string '"lit"', ``<iri>`` the term string '<iri>'). Comparisons are
therefore BINARY-COLLATION string comparisons on lexical terms, the
same convention the oracle lanes rely on — numeric comparison of
typed literals is deliberately not offered (a lexical "10" < "9" trap
is worse than an error).

Terms are produced in the engine's lexical form, so parsed queries
compose with every quad-frame operator (entailment output, upserted
stores, streaming sinks).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonld_streaming_parser_js_spark.operators.bgp import (
    bgp_construct,
    bgp_match,
)

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

_TOKEN_RE = re.compile(r"""
    (?P<STRING>"(?:[^"\\]|\\.)*")
  | (?P<IRI><[^<>"{}|^`\\\s]*>)
  | (?P<VAR>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<PNAME>[A-Za-z_][A-Za-z0-9_-]*:(?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)
  | (?P<KEYWORD>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<NUMBER>[0-9]+)
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<DTYPE>\^\^)
  | (?P<OP>&&|\|\||!=|<=|>=|[=<>!])
  | (?P<PUNCT>[{}().+,;*])
""", re.VERBOSE)


class SparqlSyntaxError(ValueError):
    pass


def _sql_str(term: str) -> str:
    """Embed a term string as a Spark SQL literal. Spark's default
    parser processes backslash escapes inside quoted literals
    (escapedStringLiterals=false), and stored terms CONTAIN
    backslashes (N-Triples escaping, terms.py) — so backslashes must
    be doubled and quotes backslash-escaped or the comparison silently
    targets a different string."""
    return "'" + term.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        if text[i] == "#":  # comment to end of line
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise SparqlSyntaxError(
                f"unrecognized SPARQL at ...{text[i:i+24]!r}")
        toks.append((m.lastgroup, m.group()))
        i = m.end()
    return toks


class _Parser:
    """Recursive descent over the token list. Every unsupported
    construct raises SparqlSyntaxError naming the token — a query that
    parses is a query this engine answers with SPARQL semantics."""

    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.pos = 0
        self.prefixes: dict[str, str] = {}

    # -- token helpers ----------------------------------------------
    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise SparqlSyntaxError("unexpected end of query")
        self.pos += 1
        return t

    def expect(self, value: str):
        kind, tok = self.next()
        got = tok.upper() if kind == "KEYWORD" else tok
        want = value.upper() if kind == "KEYWORD" else value
        if got != want:
            raise SparqlSyntaxError(f"expected {value!r}, got {tok!r}")
        return tok

    def at_keyword(self, word: str) -> bool:
        t = self.peek()
        return (t is not None and t[0] == "KEYWORD"
                and t[1].upper() == word.upper())

    # -- terms -------------------------------------------------------
    def _expand_pname(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"undeclared prefix {pfx!r}:")
        return f"<{self.prefixes[pfx]}{local}>"

    def term(self, allow_path: bool = False,
             allow_a: bool = False) -> str:
        """One RDF term in the engine's N-Triples lexical form, or a
        ?var passed through; with allow_path, a trailing + marks a
        one-or-more property path. ``a`` (rdf:type) is legal only in
        the predicate position (allow_a)."""
        kind, tok = self.next()
        if kind == "VAR":
            return tok
        if kind == "IRI":
            out = tok
        elif kind == "PNAME":
            out = self._expand_pname(tok)
        elif kind == "KEYWORD" and tok == "a":
            if not allow_a:
                raise SparqlSyntaxError(
                    "'a' (rdf:type) is only legal in the predicate "
                    "position")
            return RDF_TYPE
        elif kind == "STRING":
            lit = tok
            t = self.peek()
            if t and t[0] == "LANGTAG":
                # pass the tag through AS WRITTEN: the default kernel
                # profile (normalizeLanguageTags) stores lowercase
                # tags, so write lowercase unless you disabled
                # normalization — rewriting here would silently
                # mismatch case-preserved stores
                self.next()
                return f"{lit}{t[1]}"
            if t and t[0] == "DTYPE":
                self.next()
                k2, t2 = self.next()
                if k2 == "IRI":
                    dt = t2
                elif k2 == "PNAME":
                    dt = self._expand_pname(t2)
                else:
                    raise SparqlSyntaxError(
                        f"expected datatype IRI after ^^, got {t2!r}")
                return f"{lit}^^{dt}"
            return lit
        else:
            raise SparqlSyntaxError(f"unsupported term {tok!r}")
        t = self.peek()
        if t and t[1] == "+":
            if not allow_path:
                raise SparqlSyntaxError(
                    "property path + is only supported in the "
                    "predicate position")
            self.next()
            return out + "+"
        return out

    # -- patterns ----------------------------------------------------
    def triple(self, allow_path: bool) -> tuple[str, str, str]:
        s = self.term()
        p = self.term(allow_path=allow_path, allow_a=True)
        o = self.term()
        return (s, p, o)

    def where_block(self):
        """WHERE group: one plain group, top-level ``{ A } UNION
        { B } ...``, or ``GRAPH ?g|<iri> { ... }`` as the whole body.
        Returns (branches, graph_spec) where branches is one
        (patterns, optional, filters, minus) tuple per union branch and
        graph_spec is None | ('var', name) | ('iri', term)."""
        self.expect("{")
        if self.at_keyword("GRAPH"):
            self.next()
            kind, tok = self.next()
            if kind == "VAR":
                gspec = ("var", tok[1:])
            elif kind == "IRI":
                gspec = ("iri", tok)
            elif kind == "PNAME":
                gspec = ("iri", self._expand_pname(tok))
            else:
                raise SparqlSyntaxError(
                    f"GRAPH takes ?var or an IRI, got {tok!r}")
            branches = [self.group()]
            self.expect("}")
            if gspec[0] == "var":
                # reject paths at PARSE time (bgp_match would raise a
                # plain ValueError at execution otherwise — every
                # unsupported construct fails as SparqlSyntaxError)
                for patterns, optional, _, minus in branches[0:1]:
                    trips = (list(patterns)
                             + [t3 for g in optional for t3 in g]
                             + [t3 for g in minus for t3 in g])
                    if any(p[1].endswith(">+") for p in trips):
                        raise SparqlSyntaxError(
                            "property paths inside GRAPH ?var are "
                            "outside the supported subset (the "
                            "closure would run per graph) — use "
                            "GRAPH <iri> or query one graph")
            return self._validated(branches), gspec
        t = self.peek()
        if t is not None and t[1] == "{":
            branches = [self.group()]
            while self.at_keyword("UNION"):
                self.next()
                branches.append(self.group())
            self.expect("}")
            if len(branches) == 1:
                raise SparqlSyntaxError(
                    "a lone braced subgroup inside WHERE — either "
                    "drop the inner braces or add a UNION branch")
        else:
            # plain group: re-parse from the already-consumed '{'
            self.pos -= 1
            branches = [self.group()]
        return self._validated(branches), None

    @staticmethod
    def _validated(branches):
        for patterns, *_ in branches:
            if not patterns:
                # SPARQL's empty group is the unit solution; the
                # engine has no unit-solution frame, so refuse at
                # PARSE time (the contract: parses -> answered)
                raise SparqlSyntaxError(
                    "a group with no required triple (empty, or only "
                    "FILTER/OPTIONAL/MINUS blocks) is outside the "
                    "supported subset — every group/UNION branch "
                    "needs at least one triple pattern")
        return branches

    def _braced_triples(self, what: str) -> list:
        self.expect("{")
        group: list = []
        while not (self.peek() and self.peek()[1] == "}"):
            group.append(self.triple(allow_path=True))
            if self.peek() and self.peek()[1] == ".":
                self.next()
        self.expect("}")
        if not group:
            raise SparqlSyntaxError(f"empty {what} group")
        # GroupGraphPatternSub allows an optional '.' after any
        # block — consume it (it is a separator, not a triple)
        if self.peek() and self.peek()[1] == ".":
            self.next()
        return group

    def group(self) -> tuple[list, list, list, list]:
        """{ triples / OPTIONAL { triples } / MINUS { triples } /
        FILTER (expr) }"""
        self.expect("{")
        patterns: list = []
        optional: list = []
        filters: list[str] = []
        minus: list = []
        while True:
            t = self.peek()
            if t is None:
                raise SparqlSyntaxError("unterminated group: missing }")
            if t[1] == "}":
                self.next()
                return patterns, optional, filters, minus
            if self.at_keyword("OPTIONAL"):
                self.next()
                # each OPTIONAL block is ONE left-join of the whole
                # group (SPARQL LeftJoin), which bgp_match's group
                # form implements — never triple-by-triple
                optional.append(self._braced_triples("OPTIONAL"))
                continue
            if self.at_keyword("MINUS"):
                self.next()
                # SPARQL negation: remove solutions compatible with
                # the block on the shared (required-bound) variables
                minus.append(self._braced_triples("MINUS"))
                continue
            if self.at_keyword("FILTER"):
                self.next()
                filters.append(self.filter_expr())
                if self.peek() and self.peek()[1] == ".":
                    self.next()
                continue
            if self.at_keyword("GRAPH"):
                raise SparqlSyntaxError(
                    "GRAPH is supported only as the ENTIRE WHERE body "
                    "(WHERE { GRAPH ?g|<iri> { ... } }) — it cannot "
                    "mix with default-graph triples or sit inside a "
                    "UNION branch")
            if self.at_keyword("UNION") \
                    or self.at_keyword("SELECT") or self.at_keyword("BIND") \
                    or self.at_keyword("VALUES"):
                raise SparqlSyntaxError(
                    f"{t[1]} is outside the supported SPARQL subset")
            if t[1] == "{":
                raise SparqlSyntaxError(
                    "nested group patterns (UNION branches / "
                    "subgroups) are outside the supported SPARQL "
                    "subset")
            if optional or minus:
                # SPARQL evaluates group elements IN ORDER —
                # Join(LeftJoin(P1, OPT), P2) is not LeftJoin(Join(P1,
                # P2), OPT) when P2 shares vars with OPT (same for
                # MINUS). bgp_match always applies optionals/minus
                # last, so accepting a required triple here would
                # silently hoist it; the subset refuses instead
                # (raise-don't-misparse).
                raise SparqlSyntaxError(
                    "required triple after an OPTIONAL/MINUS block is "
                    "outside the supported subset (it would be "
                    "reordered ahead of the block, changing SPARQL "
                    "semantics) — put all required triples first")
            patterns.append(self.triple(allow_path=True))
            if self.peek() and self.peek()[1] == ".":
                self.next()

    # -- FILTER translation -------------------------------------------
    _SQL_OPS = {"&&": "AND", "||": "OR", "!": "NOT", "=": "=",
                "!=": "!=", "<": "<", ">": ">", "<=": "<=", ">=": ">="}

    def filter_expr(self) -> str:
        """Translate a parenthesized SPARQL expression to Spark SQL
        over the binding columns. Terms compare by lexical form
        (module docstring)."""
        self.expect("(")
        depth, parts = 1, ["("]
        while depth:
            kind, tok = self.next()
            if tok == "(":
                depth += 1
                parts.append("(")
            elif tok == ")":
                depth -= 1
                parts.append(")")
            elif kind == "VAR":
                # backticked: a SPARQL var may collide with a SQL
                # reserved word (?from) — valid SPARQL must not fail
                parts.append(f"`{tok[1:]}`")
            elif kind == "OP":
                parts.append(self._SQL_OPS[tok])
            elif kind == "STRING":
                # compare against the TERM encoding: the stored value
                # for "lit" is the two-char-quoted string '"lit"'
                parts.append(_sql_str(tok))
            elif kind == "IRI":
                parts.append(_sql_str(tok))
            elif kind == "PNAME":
                parts.append(_sql_str(self._expand_pname(tok)))
            elif kind == "KEYWORD" and tok.upper() == "BOUND":
                self.expect("(")
                k2, v = self.next()
                if k2 != "VAR":
                    raise SparqlSyntaxError("BOUND() takes a variable")
                self.expect(")")
                parts.append(f"`{v[1:]}` IS NOT NULL")
            else:
                raise SparqlSyntaxError(
                    f"unsupported FILTER token {tok!r} (subset: vars, "
                    "RDF terms, comparison ops, &&/||/!, BOUND)")
        return " ".join(parts)

    # -- query forms ---------------------------------------------------
    def parse(self) -> dict:
        while self.at_keyword("PREFIX"):
            self.next()
            kind, pname = self.next()
            if kind != "PNAME" or not pname.endswith(":"):
                raise SparqlSyntaxError(
                    f"expected 'prefix:' after PREFIX, got {pname!r}")
            kind, iri = self.next()
            if kind != "IRI":
                raise SparqlSyntaxError(
                    f"expected <iri> in PREFIX, got {iri!r}")
            self.prefixes[pname[:-1]] = iri[1:-1]

        if self.at_keyword("SELECT"):
            self.next()
            distinct = False
            if self.at_keyword("DISTINCT"):
                self.next()
                distinct = True
            project: list[str] | None = []
            if self.peek() and self.peek()[1] == "*":
                self.next()
                project = None
            else:
                while self.peek() and self.peek()[0] == "VAR":
                    project.append(self.next()[1][1:])
                if not project:
                    raise SparqlSyntaxError(
                        "SELECT needs ?vars or * before WHERE")
            self.expect("WHERE")
            branches, gspec = self.where_block()
            q = {"form": "select", "project": project,
                 "distinct": distinct, "branches": branches,
                 "graph_spec": gspec,
                 "order_by": self._order_by(), "limit": self._limit()}
        elif self.at_keyword("CONSTRUCT"):
            self.next()
            self.expect("{")
            template: list = []
            while not (self.peek() and self.peek()[1] == "}"):
                template.append(self.triple(allow_path=False))
                if self.peek() and self.peek()[1] == ".":
                    self.next()
            self.expect("}")
            self.expect("WHERE")
            branches, gspec = self.where_block()
            if len(branches) > 1:
                raise SparqlSyntaxError(
                    "UNION under CONSTRUCT is outside the supported "
                    "subset (run the branches as separate CONSTRUCTs "
                    "and union the quad frames)")
            q = {"form": "construct", "template": template,
                 "branches": branches, "graph_spec": gspec,
                 "order_by": None, "limit": self._limit()}
        else:
            t = self.peek()
            raise SparqlSyntaxError(
                f"query must start with SELECT or CONSTRUCT (after "
                f"PREFIX decls); got {t[1] if t else 'end of input'!r}")
        t = self.peek()
        if t is not None:
            raise SparqlSyntaxError(f"trailing content {t[1]!r}")
        return q

    def _order_by(self) -> list[tuple[str, bool]] | None:
        """ORDER BY ?v [DESC(?v)] ... -> [(var, ascending), ...]."""
        if not self.at_keyword("ORDER"):
            return None
        self.next()
        self.expect("BY")
        keys: list[tuple[str, bool]] = []
        while True:
            t = self.peek()
            if t is None:
                break
            if t[0] == "VAR":
                self.next()
                keys.append((t[1][1:], True))
            elif t[0] == "KEYWORD" and t[1].upper() in ("ASC", "DESC"):
                asc = t[1].upper() == "ASC"
                self.next()
                self.expect("(")
                k2, v = self.next()
                if k2 != "VAR":
                    raise SparqlSyntaxError(
                        f"{t[1]}() takes a variable, got {v!r}")
                self.expect(")")
                keys.append((v[1:], asc))
            else:
                break
        if not keys:
            raise SparqlSyntaxError("ORDER BY needs at least one "
                                    "?var / ASC(?var) / DESC(?var)")
        return keys

    def _limit(self) -> int | None:
        if self.at_keyword("LIMIT"):
            self.next()
            kind, tok = self.next()
            if kind != "NUMBER":
                raise SparqlSyntaxError(f"LIMIT needs a number: {tok!r}")
            return int(tok)
        return None


def parse_sparql(text: str) -> dict:
    """Parse to the intermediate dict (exposed for tests/tooling)."""
    return _Parser(text).parse()


def sparql_query(quads: DataFrame, text: str,
                 graph: str | None = "",
                 path_max_rounds: int | None = None) -> DataFrame:
    """Execute a SPARQL (subset) query string against the quad frame.

    SELECT returns one column per projected variable; CONSTRUCT
    returns a distinct quad frame (subj, pred, obj, graph). ``graph``
    selects the active graph exactly like ``bgp_match`` — unless the
    query carries a ``GRAPH`` block, which OVERRIDES it;
    ``path_max_rounds`` raises the property-path convergence budget
    for genuinely deep graphs (the escape hatch the path operators'
    errors point at).
    """
    q = parse_sparql(text)

    # a GRAPH block overrides the graph argument: GRAPH <iri> selects
    # that named graph; GRAPH ?var ranges over the named graphs and
    # binds the label (bgp_match graph_var semantics)
    eff_graph, eff_graph_var = graph, None
    if q.get("graph_spec") is not None:
        kind_g, val_g = q["graph_spec"]
        if kind_g == "var":
            eff_graph, eff_graph_var = None, val_g
        else:
            eff_graph = val_g

    def run_branch(branch):
        patterns, optional, filters, minus = branch
        return bgp_match(quads, patterns, graph=eff_graph,
                         distinct=False,
                         optional=optional, filters=filters,
                         minus=minus,
                         path_max_rounds=path_max_rounds,
                         graph_var=eff_graph_var)

    if q["form"] == "select":
        legs = [run_branch(b) for b in q["branches"]]
        out = legs[0]
        for leg in legs[1:]:
            # SPARQL Union: bag union over the variable-union domain;
            # a branch that does not bind a variable yields null
            out = out.unionByName(leg, allowMissingColumns=True)
        if q["project"] is not None:
            missing = sorted(set(q["project"]) - set(out.columns))
            if missing:
                raise SparqlSyntaxError(
                    f"SELECT projects unbound variables {missing} "
                    f"(bound: {sorted(out.columns)})")

        def apply_order(df):
            missing = sorted({v for v, _ in q["order_by"]}
                             - set(df.columns))
            if missing:
                raise SparqlSyntaxError(
                    f"ORDER BY references unavailable variables "
                    f"{missing} (available: {sorted(df.columns)})")
            return df.orderBy(*[
                F.col(v).asc() if asc else F.col(v).desc()
                for v, asc in q["order_by"]])

        if q["distinct"]:
            # SPARQL constrains SELECT DISTINCT's ORDER BY to the
            # projected variables — distinct first (it is a shuffle
            # that would destroy a prior sort), then order
            if q["project"] is not None:
                out = out.select(*q["project"])
            out = out.distinct()
            if q["order_by"]:
                out = apply_order(out)
        else:
            # plain SELECT: spec order is OrderBy THEN Project, so
            # any BOUND variable is sortable, projected or not
            # (projection after sort is narrow — order survives)
            if q["order_by"]:
                out = apply_order(out)
            if q["project"] is not None:
                out = out.select(*q["project"])
    else:
        patterns, optional, filters, minus = q["branches"][0]
        out = bgp_construct(quads, patterns, q["template"],
                            graph=eff_graph, optional=optional,
                            filters=filters, minus=minus,
                            path_max_rounds=path_max_rounds,
                            graph_var=eff_graph_var)
    return out.limit(q["limit"]) if q["limit"] is not None else out
