"""RDF dataset isomorphism (blank-node bijection) for conformance tests.

The reference's oracle comparison is dataset isomorphism, not byte equality
(``jest-rdf`` ``toBeRdfIsomorphic``, ``rdf-test-suite`` — SURVEY.md section
5). Test fixtures are small, so signature refinement + bounded backtracking
is plenty.
"""

from __future__ import annotations

from itertools import permutations

Quad = tuple  # (subj, pred, obj, graph) N-Triples lexical strings


def _bnodes(quads: list[Quad]) -> set[str]:
    out = set()
    for q in quads:
        for t in q:
            if isinstance(t, str) and t.startswith("_:"):
                out.add(t)
    return out


def _substitute(quads: list[Quad], mapping: dict[str, str]) -> set[Quad]:
    return {tuple(mapping.get(t, t) for t in q) for q in quads}


def _signature(term: str, quads: list[Quad]) -> tuple:
    """Bnode signature: multiset of ground-context positions it occurs in."""
    sig = []
    for s, p, o, g in quads:
        pos = []
        for i, t in enumerate((s, p, o, g)):
            if t == term:
                pos.append(i)
        if pos:
            ground = tuple(t if not t.startswith("_:") else "_"
                           for t in (s, p, o, g))
            sig.append((tuple(pos), ground))
    return tuple(sorted(sig))


def isomorphic(a: list[Quad], b: list[Quad]) -> bool:
    a, b = list(a), list(b)
    if len(set(map(tuple, a))) != len(set(map(tuple, b))):
        return False
    bn_a, bn_b = sorted(_bnodes(a)), sorted(_bnodes(b))
    if len(bn_a) != len(bn_b):
        return False
    if not bn_a:
        return set(map(tuple, a)) == set(map(tuple, b))
    # group by signature to prune the bijection search
    sig_a: dict[tuple, list[str]] = {}
    sig_b: dict[tuple, list[str]] = {}
    for t in bn_a:
        sig_a.setdefault(_signature(t, a), []).append(t)
    for t in bn_b:
        sig_b.setdefault(_signature(t, b), []).append(t)
    if sorted((k, len(v)) for k, v in sig_a.items()) != \
            sorted((k, len(v)) for k, v in sig_b.items()):
        return False
    groups = []
    for key, nodes_a in sig_a.items():
        groups.append((nodes_a, sig_b[key]))
    target = set(map(tuple, b))

    def backtrack(gi: int, mapping: dict[str, str]) -> bool:
        if gi == len(groups):
            return _substitute(a, mapping) == target
        nodes_a, nodes_b = groups[gi]
        for perm in permutations(nodes_b):
            mapping.update(zip(nodes_a, perm))
            if backtrack(gi + 1, mapping):
                return True
        for n in nodes_a:
            mapping.pop(n, None)
        return False

    return backtrack(0, {})


def parse_nquads(text: str) -> list[Quad]:
    """Minimal N-Quads reader for fixture files (terms stay in lexical
    form — the same encoding the engine emits)."""
    quads = []
    # NOT splitlines(): that treats \f/\v INSIDE literals as line breaks
    # (raw form-feed is legal in an N-Quads STRING_LITERAL_QUOTE)
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        assert line.endswith("."), f"bad n-quads line: {line}"
        body = line[:-1].strip()
        terms = _split_terms(body)
        if len(terms) == 3:
            terms.append("")
        assert len(terms) == 4, f"bad n-quads line: {line}"
        quads.append(tuple(terms))
    return quads


def _split_terms(body: str) -> list[str]:
    terms = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c.isspace():
            i += 1
        elif c == "<" and body.startswith("<<", i):
            depth, j = 0, i
            while j < n:
                if body.startswith("<<", j):
                    depth += 1
                    j += 2
                elif body.startswith(">>", j):
                    depth -= 1
                    j += 2
                    if depth == 0:
                        break
                else:
                    j += 1
            terms.append(body[i:j])
            i = j
        elif c == "<":
            j = body.index(">", i)
            terms.append(body[i:j + 1])
            i = j + 1
        elif c == '"':
            # escape-aware scan: skip 2 chars on '\' so a literal ending in
            # an escaped backslash ("x\\") terminates correctly (a look-back
            # check would mis-read backslash-run parity)
            j = i + 1
            while j < n and body[j] != '"':
                j += 2 if body[j] == "\\" else 1
            if j >= n:
                raise ValueError("unterminated literal in quad term")
            # datatype/lang suffix
            k = j + 1
            while k < n and not body[k].isspace():
                k += 1
            terms.append(body[i:k])
            i = k
        else:  # bnode or keyword
            j = i
            while j < n and not body[j].isspace():
                j += 1
            terms.append(body[i:j])
            i = j
    return terms
