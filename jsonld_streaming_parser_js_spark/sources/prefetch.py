"""Driver-side remote-context prefetcher.

Analog of the reference's pluggable ``IDocumentLoader``
(``/root/reference/lib/JsonLdParser.ts:633-636`` — the ``documentLoader``
option consumed by jsonld-context-parser, surfaced through
``ParsingContext.ts:107-110``): given the set of context IRIs a corpus may
reference, BUILD the broadcast context cache once at the driver —
fetch/mirror -> parse -> discover transitively referenced contexts ->
validate — so no executor ever does per-row I/O.

The loader is pluggable. This sandbox has no network, so the shipped
loaders are offline (in-memory mapping / directory mirror); a production
``HttpLoader`` implements the same one-method protocol with requests/urllib
plus RFC 8288 Link-header handling — the cache-build logic is identical.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Protocol

from ..functions import iri as iri_mod
from ..functions.context import (
    MAX_REMOTE_CONTEXTS,
    JsonLdError,
    validate_context_cache,
)


class DocumentLoader(Protocol):
    """One method, mirroring IDocumentLoader.load(url) -> parsed JSON."""

    def load(self, url: str) -> Any:  # pragma: no cover - protocol
        ...


class MappingLoader:
    """Loader over an in-memory {iri: parsed-json-document} mapping."""

    def __init__(self, documents: dict[str, Any]):
        self._documents = documents

    def load(self, url: str) -> Any:
        if url not in self._documents:
            raise JsonLdError("loading remote context failed", url)
        return self._documents[url]


class FileMirrorLoader:
    """Loader over a directory mirror: each context IRI maps to a file via
    a caller-provided function (default: percent-free slug of the IRI with
    a .jsonld suffix), e.g. a crawl snapshot of schema.org contexts."""

    def __init__(self, root: str,
                 to_path: Callable[[str], str] | None = None):
        self._root = root
        self._to_path = to_path or self._default_path

    @staticmethod
    def _default_path(url: str) -> str:
        slug = "".join(c if c.isalnum() or c in "._-" else "_"
                       for c in url)
        return slug + ".jsonld"

    def load(self, url: str) -> Any:
        path = os.path.join(self._root, self._to_path(url))
        try:
            with open(path, encoding="utf-8") as fh:
                return json.load(fh)
        except FileNotFoundError:
            raise JsonLdError("loading remote context failed", url)
        except ValueError as exc:
            raise JsonLdError("invalid remote context",
                              f"{url}: {exc}") from exc


def _referenced_context_iris(ctx_value: Any, base: str) -> set[str]:
    """Remote-context IRIs referenced from inside a context value: string
    members of the (array-wrapped) context, ``@import`` values, and strings
    inside term-scoped ``@context`` entries — resolved against ``base``
    (the IRI of the document that contains the reference)."""
    found: set[str] = set()
    stack = [ctx_value]
    while stack:
        value = stack.pop()
        if isinstance(value, str):
            found.add(iri_mod.resolve(base, value))
        elif isinstance(value, list):
            stack.extend(value)
        elif isinstance(value, dict):
            imp = value.get("@import")
            if isinstance(imp, str):
                found.add(iri_mod.resolve(base, imp))
            for term, td in value.items():
                if term.startswith("@"):
                    continue
                if isinstance(td, dict) and "@context" in td:
                    stack.append(td["@context"])
    return found


def build_context_cache(context_iris: list[str] | set[str],
                        loader: DocumentLoader,
                        *,
                        strict: bool = True,
                        max_contexts: int = 1024) -> dict[str, dict]:
    """Fetch ``context_iris`` (and every context they transitively
    reference) through ``loader``, returning the validated broadcast cache
    ``{iri: {"@context": ...}}`` that ``operators.parse`` /
    ``parse_responses`` broadcast to executors.

    strict=True fails the build on the first unloadable/malformed context
    (fail ONCE at the driver, the distributed-job default); strict=False
    skips unloadable ones — the per-block error channel then reports
    'loading remote context failed' only for documents that actually
    reference them.
    """
    cache: dict[str, dict] = {}
    pending = {iri_mod.resolve(None, i) for i in context_iris}
    seen: set[str] = set()
    while pending:
        if len(seen) > max_contexts:
            raise JsonLdError(
                "context overflow",
                f"prefetch exceeded {max_contexts} contexts")
        url = pending.pop()
        if url in seen:
            continue
        seen.add(url)
        try:
            doc = loader.load(url)
        except JsonLdError:
            if strict:
                raise
            continue
        if not isinstance(doc, dict) or "@context" not in doc:
            # same gate the kernel applies per use (and the reference's
            # ERROR_CODES.INVALID_REMOTE_CONTEXT)
            if strict:
                raise JsonLdError("invalid remote context", url)
            continue
        cache[url] = {"@context": doc["@context"]}
        for ref in _referenced_context_iris(doc["@context"], url):
            if ref not in seen:
                pending.add(ref)
    # fail malformed contexts once at the driver, never on executors
    validate_context_cache(cache)
    return cache


__all__ = [
    "DocumentLoader",
    "FileMirrorLoader",
    "MappingLoader",
    "build_context_cache",
    "MAX_REMOTE_CONTEXTS",
]
