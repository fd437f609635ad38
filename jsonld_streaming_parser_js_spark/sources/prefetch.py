"""Driver-side remote-context prefetcher.

Analog of the reference's pluggable ``IDocumentLoader``
(``/root/reference/lib/JsonLdParser.ts:633-636`` — the ``documentLoader``
option consumed by jsonld-context-parser, surfaced through
``ParsingContext.ts:107-110``): given the set of context IRIs a corpus may
reference, BUILD the broadcast context cache once at the driver —
fetch/mirror -> parse -> discover transitively referenced contexts ->
validate — so no executor ever does per-row I/O.

The loader is pluggable: in-memory mapping, directory mirror (crawl
snapshot), or ``HttpLoader`` — urllib over http(s) with the media-type
gate, redirect following, and RFC 8288 Link-header ``rel=json-ld#context``
one-hop follow mirroring the reference's default FetchDocumentLoader
(``lib/JsonLdParser.ts:633-636``). Tests drive HttpLoader against a
loopback ``http.server`` — no external network.
"""

from __future__ import annotations

import json
import os
import re as _re
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


JSONLD_CONTEXT_REL = "http://www.w3.org/ns/json-ld#context"

# RFC 8288 Link element whose (space-separated, quoted) rel list contains
# the JSON-LD context relation. Same tokenizer as the JVM-side gate in
# operators/responses.py (_CTX_LINK_RE), in plain-Python escaping: the
# param run steps over quoted strings as whole units including
# backslash-escaped quotes, so commas inside earlier quoted params (e.g.
# title="a \"b, c\"") never end the element early.
_QUOTED_UNIT_PY = r'"(?:\\.|[^"\\])*"'
_CTX_LINK_RE_PY = _re.compile(
    r'<([^>]*)>(?:' + _QUOTED_UNIT_PY + r'|[^,"])*?rel="(?:[^"]* )?'
    + _re.escape(JSONLD_CONTEXT_REL) + r'( [^"]*)?"')


def _is_json_media_type(media_type: str) -> bool:
    return (media_type == "application/ld+json"
            or media_type == "application/json"
            or media_type.endswith("+json"))


class HttpLoader:
    """Production DocumentLoader: urllib over http(s), driver-side only.

    Mirrors the reference's default document loader semantics
    (``lib/JsonLdParser.ts:633-636``; jsonld-context-parser
    FetchDocumentLoader):

    - sends ``Accept: application/ld+json;q=1.0, application/json;q=0.7``
    - follows redirects (urllib's bounded redirect handler)
    - ``application/ld+json`` / ``application/json`` / any ``*+json``
      body parses as the document
    - any OTHER media type: if exactly one RFC 8288 ``Link`` header
      carries ``rel="http://www.w3.org/ns/json-ld#context"``, that IRI
      (resolved against the post-redirect URL) is fetched instead — one
      hop, and the target must itself be a JSON media type
    - network / HTTP / scheme / size failures ->
      ``JsonLdError('loading remote context failed')``; unparseable JSON
      -> ``JsonLdError('invalid remote context')``

    Driver-only by design: executors never load contexts — the validated
    cache is broadcast once (see build_context_cache).
    """

    ACCEPT = "application/ld+json;q=1.0, application/json;q=0.7"

    def __init__(self, timeout: float = 10.0,
                 max_bytes: int = 8 << 20,
                 user_agent: str = "jsonld-spark-prefetch/1.0"):
        import urllib.request

        self._timeout = timeout
        self._max_bytes = max_bytes
        self._user_agent = user_agent

        class _HttpOnlyRedirect(urllib.request.HTTPRedirectHandler):
            # urllib's default handler follows 3xx to ftp:// too — reject
            # non-http(s) targets BEFORE any fetch (SSRF via redirect).
            # Scheme compare is case-insensitive (RFC 3986 3.1).
            def redirect_request(self, req, fp, code, msg, hdrs, newurl):
                scheme = newurl.split(":", 1)[0].lower()
                if scheme not in ("http", "https"):
                    raise JsonLdError(
                        "loading remote context failed",
                        f"redirect to non-http url: {newurl}")
                return super().redirect_request(req, fp, code, msg, hdrs,
                                                newurl)

        # built once: build_opener instantiates ~10 handler objects
        self._opener = urllib.request.build_opener(_HttpOnlyRedirect)

    def load(self, url: str) -> Any:
        return self._load(url, allow_link_hop=True)

    def _load(self, url: str, allow_link_hop: bool) -> Any:
        import urllib.error
        import urllib.request

        if not url.startswith(("http://", "https://")):
            raise JsonLdError("loading remote context failed",
                              f"unsupported scheme: {url}")
        req = urllib.request.Request(
            url, headers={"Accept": self.ACCEPT,
                          "User-Agent": self._user_agent})
        try:
            with self._opener.open(req, timeout=self._timeout) as resp:
                body = resp.read(self._max_bytes + 1)
                media_type = (resp.headers.get_content_type() or "").lower()
                link_headers = resp.headers.get_all("Link") or []
                final_url = resp.geturl()
        except JsonLdError:
            raise  # e.g. the redirect-scheme gate: keep the coded error
        except (urllib.error.URLError, OSError, ValueError) as exc:
            raise JsonLdError("loading remote context failed",
                              f"{url}: {exc}") from exc
        if len(body) > self._max_bytes:
            raise JsonLdError("loading remote context failed",
                              f"{url}: response exceeds "
                              f"{self._max_bytes} bytes")
        if not _is_json_media_type(media_type):
            targets = [m.group(1) for h in link_headers
                       for m in _CTX_LINK_RE_PY.finditer(h)]
            if allow_link_hop and len(targets) == 1:
                return self._load(iri_mod.resolve(final_url, targets[0]),
                                  allow_link_hop=False)
            if len(targets) > 1:
                raise JsonLdError("multiple context link headers", url)
            raise JsonLdError(
                "loading remote context failed",
                f"{url}: unsupported media type {media_type!r}")
        try:
            return json.loads(body.decode("utf-8"))
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
    "HttpLoader",
    "MappingLoader",
    "build_context_cache",
    "MAX_REMOTE_CONTEXTS",
]
