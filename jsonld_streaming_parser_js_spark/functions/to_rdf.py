"""Deserialize expanded JSON-LD to RDF quads.

Implements the W3C "Node Map Generation" (json-ld11-api section 8.1) and
"Deserialize JSON-LD to RDF" (json-ld11-api section 10.1 / json-ld11
Transform-to-RDF) algorithms over the output of :mod:`expand`.  The reference
produces the same quad set incrementally (``/root/reference/lib/Util.ts:
242-553`` valueToTerm, ``lib/entryhandler/EntryHandlerArrayValue.ts`` list
chains, ``lib/JsonLdParser.ts:340-441`` buffering); we emit from the node
map, which matches the reference's non-streaming output as a set.

Blank-node labels are issued sequentially in first-use order, which is
deterministic for a given document. :func:`skolemize_label` then rewrites
``_:bN`` to a per-(url, block) label so re-runs and partition retries emit
identical labels across the whole corpus (north-star requirement).

Pure Python; no Spark imports.
"""

from __future__ import annotations

import hashlib
from typing import Any

from . import terms as T
from .context import FLAGS, LANGUAGE_TAG_RE, JsonLdError
from .iri import is_absolute_iri


class BlankNodeIssuer:
    """Issues ``_:b0, _:b1, ...`` in first-use order (deterministic).

    Also carries the document's ``rdf_direction`` option so deeply nested
    consumers (RDF-star embedded-node serialization) honor it without
    threading a parameter through every recursion level.
    """

    def __init__(self, prefix: str = "b", rdf_direction: str | None = None,
                 rdfstar_reverse_in_embedded: bool = False):
        self.prefix = prefix
        self.rdf_direction = rdf_direction
        # reference option rdfstarReverseInEmbedded
        # (lib/JsonLdParser.ts / Util.ts): reverse properties in embedded
        # nodes are an error unless explicitly enabled
        self.rdfstar_reverse_in_embedded = rdfstar_reverse_in_embedded
        self.counter = 0
        self.issued: dict[str, str] = {}

    def issue(self, existing: str | None = None) -> str:
        if existing is not None and existing in self.issued:
            return self.issued[existing]
        label = f"_:{self.prefix}{self.counter}"
        self.counter += 1
        if existing is not None:
            self.issued[existing] = label
        return label


def _strict_eq(a: Any, b: Any) -> bool:
    """JSON-equality: Python's ``0 == False`` / ``1 == True`` must NOT
    collapse distinct JSON values (bool is an int subclass)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, dict) and isinstance(b, dict):
        return (a.keys() == b.keys()
                and all(_strict_eq(v, b[k]) for k, v in a.items()))
    if isinstance(a, list) and isinstance(b, list):
        return (len(a) == len(b)
                and all(_strict_eq(x, y) for x, y in zip(a, b)))
    return a == b


def _append_unique(values: list, item: Any) -> None:
    if type(item) is str:
        # fast path (type IRIs, graph refs): str == dict is False and the
        # bool/int trap can't involve strings, so plain `in` is exact
        if item not in values:
            values.append(item)
        return
    if not any(_strict_eq(item, v) for v in values):
        values.append(item)


def generate_node_map(element: Any, node_map: dict, issuer: BlankNodeIssuer,
                      active_graph: str = "@default",
                      active_subject: Any = None,
                      active_property: str | None = None,
                      list_ref: dict | None = None) -> None:
    """W3C Node Map Generation (mutates ``node_map``)."""
    if isinstance(element, list):
        for item in element:
            generate_node_map(item, node_map, issuer, active_graph,
                              active_subject, active_property, list_ref)
        return
    if not isinstance(element, dict):
        return

    graph = node_map.setdefault(active_graph, {})
    subject_node = (graph.get(active_subject)
                    if isinstance(active_subject, str) else None)

    if "@type" in element:
        ts = element["@type"]
        if isinstance(ts, list):
            element["@type"] = [
                issuer.issue(t) if isinstance(t, str) and t.startswith("_:")
                else t for t in ts
            ]
        elif isinstance(ts, str) and ts.startswith("_:"):
            element["@type"] = issuer.issue(ts)

    if "@value" in element:
        if list_ref is None:
            if subject_node is not None:
                _append_unique(subject_node.setdefault(active_property, []),
                               element)
        else:
            if "@annotation" in element:
                # same rule as node objects: 'illegal annotation in a list'
                raise JsonLdError("invalid annotation",
                                  "annotation inside a list")
            list_ref["@list"].append(element)
        return

    if "@list" in element:
        result = {"@list": []}
        generate_node_map(element["@list"], node_map, issuer, active_graph,
                          active_subject, active_property, result)
        if "@index" in element:
            result["@index"] = element["@index"]
        if list_ref is None:
            if subject_node is not None:
                subject_node.setdefault(active_property, []).append(result)
            elif (isinstance(active_subject, dict)
                  and FLAGS.allow_subject_list):
                # reverse subject list (reference allowSubjectList,
                # JsonLdParser-test.ts:1712): the list head becomes the
                # SUBJECT of the reversed triple — record for emit
                node_map.setdefault("@subject-lists", []).append(
                    (active_graph, result, active_property,
                     active_subject))
        else:
            list_ref["@list"].append(result)
        return

    # node object ------------------------------------------------------------
    if "@id" in element:
        id_ = element.pop("@id")
        if isinstance(id_, dict):
            # RDF-star embedded node: resolve to a quoted-triple term later.
            id_ = _embedded_node_key(id_, node_map, issuer, active_graph)
        elif id_ is None:
            id_ = issuer.issue()
        elif id_.startswith("_:"):
            id_ = issuer.issue(id_)
    else:
        id_ = issuer.issue()

    node = graph.setdefault(id_, {"@id": id_})

    if isinstance(active_subject, dict):
        # reverse property: active_subject is a node reference; an
        # @annotation here asserts on the REVERSED quad (the reference
        # buffers annotations with their reverse flag and flushes them
        # against the emitted quad, EntryHandlerPredicate.ts:96-105)
        ref = active_subject
        if "@annotation" in element:
            ref = dict(active_subject)
            ref["@annotation"] = element.pop("@annotation")
        _append_unique(node.setdefault(active_property, []), ref)
    elif active_property is not None:
        ref = {"@id": id_}
        if "@annotation" in element:
            if list_ref is not None:
                # reference: 'Found an illegal annotation inside a list'
                raise JsonLdError("invalid annotation",
                                  "annotation inside a list")
            ref["@annotation"] = element.pop("@annotation")
        if list_ref is None:
            if subject_node is not None:
                _append_unique(subject_node.setdefault(active_property, []),
                               ref)
        else:
            list_ref["@list"].append(ref)
    elif "@annotation" in element:
        raise JsonLdError("invalid annotation",
                          "top-level node cannot be annotated")

    if "@type" in element:
        existing = node.setdefault("@type", [])
        for t in element.pop("@type"):
            _append_unique(existing, t)

    if "@index" in element:
        idx = element.pop("@index")
        if "@index" in node and node["@index"] != idx:
            if FLAGS.validate_value_indexes:
                raise JsonLdError("conflicting indexes", id_)
        else:
            node["@index"] = idx

    if "@reverse" in element:
        referenced = {"@id": id_}
        for prop, values in element.pop("@reverse").items():
            for value in values:
                generate_node_map(value, node_map, issuer, active_graph,
                                  dict(referenced), prop)

    if "@graph" in element:
        generate_node_map(element.pop("@graph"), node_map, issuer,
                          active_graph=id_)

    if "@included" in element:
        generate_node_map(element.pop("@included"), node_map, issuer,
                          active_graph)

    for prop in list(element):
        if prop in ("@id", "@annotation"):
            continue
        values = element[prop]
        if prop.startswith("_:"):
            prop = issuer.issue(prop)
        plist = node.setdefault(prop, [])
        if type(values) is list:
            for item in values:
                if type(item) is dict and "@value" in item:
                    # inline of the @value branch below for the dominant
                    # literal case: expansion already validated @type (an
                    # invalid/bnode datatype raised), so no relabel check
                    _append_unique(plist, item)
                else:
                    generate_node_map(item, node_map, issuer, active_graph,
                                      id_, prop)
        else:
            generate_node_map(values, node_map, issuer, active_graph, id_,
                              prop)


_EMBEDDED_PREFIX = "\x00star\x00"


def _embedded_node_key(embedded: dict, node_map: dict,
                       issuer: BlankNodeIssuer, active_graph: str) -> str:
    """Reduce an RDF-star embedded node object to an opaque subject key that
    serializes as a quoted triple. The embedded node must express exactly one
    triple (reference: lib/Util.ts:1062-1092 single-property constraint)."""
    if "@reverse" in embedded and not issuer.rdfstar_reverse_in_embedded:
        # reference default: 'Illegal reverse property in embedded node'
        # unless rdfstarReverseInEmbedded is set
        raise JsonLdError("invalid embedded node",
                          "illegal reverse property in embedded node")
    sub_map: dict = {}
    generate_node_map(dict(embedded), sub_map, issuer, active_graph)
    quads = emit_quads(sub_map, rdf_direction=issuer.rdf_direction,
                       produce_generalized_rdf=False, doc_issuer=issuer)
    if len(quads) != 1:
        raise JsonLdError("invalid embedded node",
                          f"expected exactly 1 triple, got {len(quads)}")
    s, p, o, _ = quads[0]
    return _EMBEDDED_PREFIX + T.quoted_triple(s, p, o)


def node_to_term(node_id: str) -> str | None:
    """Node-map key -> N-Triples term (None = invalid, skip)."""
    if not node_id:
        return None
    c = node_id[0]
    if c == "_":
        # '_' alone and '_x' are (invalid) relative IRIs, not bnodes
        return node_id if node_id[1:2] == ":" else None
    if c == "\x00" and node_id.startswith(_EMBEDDED_PREFIX):
        return node_id[len(_EMBEDDED_PREFIX):]
    if is_absolute_iri(node_id):
        return T.iri(node_id)
    return None


def value_object_to_term(item: dict, rdf_direction: str | None,
                         aux_quads: list, graph_term: str,
                         issuer: BlankNodeIssuer) -> str | None:
    """Literal conversion (W3C "Object to RDF" steps for value objects;
    reference semantics: lib/Util.ts:242-553, 676-782)."""
    value = item["@value"]
    if type(value) is str:
        # fast paths: plain string literal, and valid language-tagged
        # string (the two dominant shapes in web corpora; a context
        # default language/direction was already folded into the value
        # object by expand_value). Anything else — datatypes, @direction,
        # @index, ill-formed tags — falls through to the full path.
        n = len(item)
        if n == 1:
            return T.literal(value)
        if n == 2:
            lang = item.get("@language")
            if (type(lang) is str and lang
                    and LANGUAGE_TAG_RE.match(lang)):
                return T.literal(value, language=lang)
    datatype = item.get("@type")
    language = item.get("@language")
    direction = item.get("@direction")

    if datatype == "@json":
        return T.literal(T.canonicalize_json(value), T.RDF_JSON)

    if isinstance(value, bool):
        lex = "true" if value else "false"
        return T.literal(lex, datatype or T.XSD_BOOLEAN)
    if isinstance(value, (int, float)):
        as_double = (not T.is_integral_json_number(value)
                     or datatype == T.XSD_DOUBLE)
        lex = T.number_to_string(value, as_double)
        if datatype is None:
            datatype = T.XSD_DOUBLE if as_double else T.XSD_INTEGER
        return T.literal(lex, datatype)
    if not isinstance(value, str):
        return None

    if language == "":
        # falsy empty tag = no language at all (reference Util.ts: a ''
        # valueLanguage skips every language branch -> plain literal)
        language = None
    if language is not None and not LANGUAGE_TAG_RE.match(language):
        # the reference validates language tags HERE (Util.ts:360-366):
        # strict mode errors; lenient mode warns and DROPS the value —
        # emitting '"x"@en_us' would be syntactically invalid N-Triples
        if FLAGS.strict_values:
            raise JsonLdError("invalid language-tagged string",
                              repr(language))
        return None

    if direction is not None and rdf_direction is not None:
        if rdf_direction == "i18n-datatype":
            dt = f"{T.I18N}{language or ''}_{direction}"
            return T.literal(value, dt)
        if rdf_direction == "compound-literal":
            bnode = issuer.issue()
            aux_quads.append((bnode, T.iri(T.RDF_VALUE), T.literal(value),
                              graph_term))
            if language:
                aux_quads.append((bnode, T.iri(T.RDF_LANGUAGE),
                                  T.literal(language), graph_term))
            aux_quads.append((bnode, T.iri(T.RDF_DIRECTION),
                              T.literal(direction), graph_term))
            return bnode
        # rdf_direction == "base" -> RDF 1.2 directional literal
        return T.literal(value, language=language, direction=direction)

    if language is not None:
        return T.literal(value, language=language)
    return T.literal(value, datatype)


_RDF_NIL_TERM = T.iri(T.RDF_NIL)
_RDF_FIRST_TERM = T.iri(T.RDF_FIRST)
_RDF_REST_TERM = T.iri(T.RDF_REST)


def list_to_quads(items: list, quads: list, issuer: BlankNodeIssuer,
                  graph_term: str, rdf_direction: str | None,
                  produce_generalized_rdf: bool) -> str:
    """RDF list chain (reference: lib/entryhandler/EntryHandlerArrayValue.ts
    list machinery; empty list -> rdf:nil per lib/Util.ts:456-461)."""
    if not items:
        return _RDF_NIL_TERM
    bnodes = [issuer.issue() for _ in items]
    for i, item in enumerate(items):
        obj = _object_to_term(item, quads, issuer, graph_term, rdf_direction,
                              produce_generalized_rdf)
        if obj is not None:
            quads.append((bnodes[i], _RDF_FIRST_TERM, obj, graph_term))
        rest = bnodes[i + 1] if i + 1 < len(bnodes) else _RDF_NIL_TERM
        quads.append((bnodes[i], _RDF_REST_TERM, rest, graph_term))
    return bnodes[0]


def _object_to_term(item: Any, quads: list, issuer: BlankNodeIssuer,
                    graph_term: str, rdf_direction: str | None,
                    produce_generalized_rdf: bool) -> str | None:
    if isinstance(item, dict) and "@value" in item:
        return value_object_to_term(item, rdf_direction, quads, graph_term,
                                    issuer)
    if isinstance(item, dict) and "@list" in item:
        return list_to_quads(item["@list"], quads, issuer, graph_term,
                             rdf_direction, produce_generalized_rdf)
    if isinstance(item, dict) and "@id" in item:
        return node_to_term(item["@id"])
    return None


def emit_quads(node_map: dict, rdf_direction: str | None = None,
               produce_generalized_rdf: bool = False,
               doc_issuer: BlankNodeIssuer | None = None) -> list[tuple]:
    """node map -> [(subj, pred, obj, graph)] N-Triples-lexical tuples.

    ``doc_issuer`` is the document's node-map issuer: annotation bodies are
    node-mapped with IT so blank nodes shared between the document body and
    an @annotation keep one label (coreference)."""
    quads: list[tuple] = []
    issuer = BlankNodeIssuer(prefix="l")  # list/aux nodes, disjoint from b*
    rdf_type_term = T.iri(T.RDF_TYPE)
    strict = FLAGS.strict_values

    def _invalid(kind: str, value: str) -> None:
        # reference strictValues: 'Invalid predicate/resource/term IRI'
        # (lib/Util.ts:609-613, 633-635, 656-660); lenient mode drops
        raise JsonLdError("invalid IRI mapping",
                          f"invalid {kind} IRI: {value}")

    for graph_name, graph in node_map.items():
        if graph_name == "@subject-lists":
            continue  # emitted below
        if graph_name == "@default":
            graph_term = T.DEFAULT_GRAPH
        else:
            gt = node_to_term(graph_name)
            if gt is None:
                if strict:
                    _invalid("resource", graph_name)
                continue
            graph_term = gt
        for subject_id, node in graph.items():
            subj = node_to_term(subject_id)
            if subj is None:
                if strict:
                    _invalid("resource", subject_id)
                continue
            for prop, values in node.items():
                if prop == "@id" or prop == "@index":
                    continue
                if prop == "@type":
                    for t in values:
                        obj = node_to_term(t)
                        if obj is not None:
                            quads.append((subj, rdf_type_term, obj,
                                          graph_term))
                        elif strict:
                            _invalid("term", str(t))
                    continue
                if prop.startswith("@"):
                    continue
                if prop.startswith("_:"):
                    if not produce_generalized_rdf:
                        continue
                    pred = prop
                elif is_absolute_iri(prop):
                    pred = T.iri(prop)
                else:
                    if strict:
                        _invalid("predicate", prop)
                    continue
                for item in values:
                    # inlined _object_to_term dispatch (one call + three
                    # isinstance checks per value measured on the hot path)
                    if type(item) is dict:
                        annotation = item.pop("@annotation", None)
                        if "@value" in item:
                            obj = value_object_to_term(
                                item, rdf_direction, quads, graph_term,
                                issuer)
                        elif "@list" in item:
                            obj = list_to_quads(
                                item["@list"], quads, issuer, graph_term,
                                rdf_direction, produce_generalized_rdf)
                        elif "@id" in item:
                            obj = node_to_term(item["@id"])
                        else:
                            obj = None
                    else:
                        annotation = None
                        obj = None
                    if obj is None:
                        if (strict and isinstance(item, dict)
                                and isinstance(item.get("@id"), str)):
                            _invalid("resource", item["@id"])
                        continue
                    quads.append((subj, pred, obj, graph_term))
                    if annotation:
                        _emit_annotation(T.quoted_triple(subj, pred, obj),
                                         annotation, quads, issuer,
                                         doc_issuer or issuer,
                                         graph_term, rdf_direction,
                                         produce_generalized_rdf)
    for graph_name, lst, prop, ref in node_map.get("@subject-lists", ()):
        # reverse subject lists (allowSubjectList): head -> prop -> node.
        # Same drop/error/generalized rules as the main loop above.
        graph_term = (T.DEFAULT_GRAPH if graph_name == "@default"
                      else node_to_term(graph_name))
        if graph_term is None:
            if strict:
                _invalid("resource", graph_name)
            continue
        obj = node_to_term(ref.get("@id"))
        if obj is None:
            if strict:
                _invalid("resource", str(ref.get("@id")))
            continue
        if prop.startswith("_:"):
            if not produce_generalized_rdf:
                continue
            pred = prop
        elif is_absolute_iri(prop):
            pred = T.iri(prop)
        else:
            if strict:
                _invalid("predicate", prop)
            continue
        head = list_to_quads(lst["@list"], quads, issuer, graph_term,
                             rdf_direction, produce_generalized_rdf)
        quads.append((head, pred, obj, graph_term))
    return quads


def _emit_annotation(quoted: str, annotation: list, quads: list,
                     issuer: BlankNodeIssuer, node_issuer: BlankNodeIssuer,
                     graph_term: str,
                     rdf_direction: str | None,
                     produce_generalized_rdf: bool) -> None:
    """RDF-star annotation: properties asserted on the quoted triple
    (reference: lib/Util.ts:1097-1125 emitAnnotation). ``node_issuer`` is
    the document issuer: labels like _:x used both in the body and in the
    annotation must resolve to the same relabeled bnode."""
    for ann in annotation:
        sub_map: dict = {}
        ann = dict(ann)
        if "@id" in ann:
            # the annotation's subject IS the quoted triple; a user @id is
            # invalid (reference: annotations are anonymous node objects)
            raise JsonLdError("invalid annotation",
                              "@id is not allowed in an annotation")
        # collision-proof in-band marker: a crafted nested @id equal to the
        # marker would otherwise be silently rewritten to the quoted triple
        def _contains(v, s) -> bool:
            if isinstance(v, str):
                return v == s
            if isinstance(v, list):
                return any(_contains(x, s) for x in v)
            if isinstance(v, dict):
                return any(_contains(k, s) or _contains(x, s)
                           for k, x in v.items())
            return False

        sentinel = "\x00annotated\x00"
        n = 0
        while _contains(ann, sentinel):
            n += 1
            sentinel = f"\x00annotated{n}\x00"
        ann["@id"] = sentinel
        generate_node_map(ann, sub_map, node_issuer, "@default")
        for graph in sub_map.values():
            for subject_id, node in graph.items():
                subj = (quoted if subject_id == sentinel
                        else node_to_term(subject_id))
                if subj is None:
                    continue
                for prop, values in node.items():
                    if prop in ("@id", "@index"):
                        continue
                    if prop == "@type":
                        for t in values:
                            obj = node_to_term(t)
                            if obj is not None:
                                quads.append((subj, T.iri(T.RDF_TYPE), obj,
                                              graph_term))
                        continue
                    if not is_absolute_iri(prop):
                        continue
                    pred = T.iri(prop)
                    for item in values:
                        nested_ann = (item.pop("@annotation", None)
                                      if isinstance(item, dict) else None)
                        if (isinstance(item, dict)
                                and item.get("@id") == sentinel):
                            # a reverse property inside the annotation: the
                            # quoted triple is the OBJECT of the reversed
                            # statement (reference: lib/Util.ts:1111-1113,
                            # test 'on nested node with @reverse')
                            obj = quoted
                        else:
                            obj = _object_to_term(item, quads, issuer,
                                                  graph_term, rdf_direction,
                                                  produce_generalized_rdf)
                        if obj is None:
                            continue
                        quads.append((subj, pred, obj, graph_term))
                        if nested_ann:
                            _emit_annotation(
                                T.quoted_triple(subj, pred, obj), nested_ann,
                                quads, issuer, node_issuer, graph_term,
                                rdf_direction, produce_generalized_rdf)


def skolemize_label(url: str, blk: int) -> str:
    """Deterministic per-(url, block) blank-node namespace prefix.

    Final labels are ``_:s{md5(url)[:16]}x{blk}x{local}`` — reproducible
    across re-runs and partition retries, and collision-free across the
    corpus (md5 over the unique url key). Reproducible in SQL:
    ``'_:s' || substr(md5(url),1,16) || 'x' || blk || 'x' || local``.
    """
    return f"s{hashlib.md5(url.encode('utf-8')).hexdigest()[:16]}x{blk}"


def apply_default_graph(quads: list[tuple], default_graph: str | None
                        ) -> list[tuple]:
    """Remap default-graph quads to the caller-supplied graph term (the
    reference's defaultGraph option, lib/JsonLdParser.ts:686-688).

    ORDERING CONTRACT: when the quads are also skolemized, this must run
    AFTER ``skolemize_quads`` — a blank-node graph term ('_:dg') is ONE
    shared graph for the whole corpus, and the per-(url, blk) skolemizer
    would otherwise split it per document (or, run before, conflate it
    with a document-local bnode that happens to share the label)."""
    if not default_graph:
        return quads
    return [(s, p, o, default_graph if g == "" else g)
            for s, p, o, g in quads]


def _rewrite_quoted(term: str, bnode_prefix: str) -> str:
    """Quoted-triple rewrite: term-aware (a blind string replace would
    corrupt " _:" sequences inside literal content)."""
    from .isomorphism import _split_terms
    out = []
    for t in _split_terms(term[2:-2].strip()):
        if t[0] == "_":
            t = bnode_prefix + t[2:]
        elif t[0] == "<" and t[1] == "<":
            t = _rewrite_quoted(t, bnode_prefix)
        out.append(t)
    return "<< " + " ".join(out) + " >>"


def skolemize_quads(quads: list[tuple], url: str, blk: int) -> list[tuple]:
    """Rewrite document-local ``_:bN`` / ``_:lN`` labels to globally-unique
    deterministic labels. Hot path: branch inline per term (4 calls/quad
    through a closure measured ~9% of kernel time); quoted triples take
    the slow recursive path."""
    bp = "_:" + skolemize_label(url, blk) + "x"
    out = []
    append = out.append
    for s, p, o, g in quads:
        if s[0] == "_":
            s = bp + s[2:]
        elif s[1] == "<":
            s = _rewrite_quoted(s, bp)
        if p[0] == "_":  # generalized-RDF bnode predicates only
            p = bp + p[2:]
        if o[0] == "_":
            o = bp + o[2:]
        elif o[0] == "<" and o[1] == "<":
            o = _rewrite_quoted(o, bp)
        if g and g[0] == "_":
            g = bp + g[2:]
        append((s, p, o, g))
    return out
