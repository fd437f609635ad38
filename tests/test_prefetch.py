"""Context-prefetch tool: build the broadcast cache from a document loader
(reference analog: IDocumentLoader, lib/JsonLdParser.ts:633-636)."""

from __future__ import annotations

import json

import pytest

from jsonld_streaming_parser_js_spark.functions.context import JsonLdError
from jsonld_streaming_parser_js_spark.functions.parser import parse_block
from jsonld_streaming_parser_js_spark.sources.prefetch import (
    JSONLD_CONTEXT_REL, FileMirrorLoader, HttpLoader, MappingLoader,
    build_context_cache)

SCHEMA_STYLE = {
    "@context": {
        "@vocab": "http://schema.org/",
        "id": "@id", "type": "@type",
        "name": {"@id": "http://schema.org/name"},
        "author": {"@id": "http://schema.org/author", "@type": "@id"},
    }
}

DOCS = {
    "https://ctx.example.org/schema": SCHEMA_STYLE,
    # references another context by string inside an array
    "https://ctx.example.org/combo": {
        "@context": ["https://ctx.example.org/schema",
                     {"extra": "http://e/extra"}]},
    # references via @import
    "https://ctx.example.org/importer": {
        "@context": {"@import": "https://ctx.example.org/schema",
                     "@protected": True}},
    # relative reference inside a scoped context, resolved against the
    # defining document's IRI
    "https://ctx.example.org/scoped": {
        "@context": {"p": {"@id": "http://e/p", "@context": "schema"}}},
}


def test_prefetch_transitive_discovery():
    cache = build_context_cache(
        ["https://ctx.example.org/combo",
         "https://ctx.example.org/importer",
         "https://ctx.example.org/scoped"],
        MappingLoader(DOCS))
    assert set(cache) == set(DOCS)  # schema pulled in transitively
    assert cache["https://ctx.example.org/schema"]["@context"][
        "@vocab"] == "http://schema.org/"


def test_prefetch_strict_missing_fails():
    with pytest.raises(JsonLdError) as exc:
        build_context_cache(["https://ctx.example.org/absent"],
                            MappingLoader(DOCS))
    assert exc.value.code == "loading remote context failed"


def test_prefetch_lenient_skips_missing():
    cache = build_context_cache(
        ["https://ctx.example.org/schema", "https://ctx.example.org/absent"],
        MappingLoader(DOCS), strict=False)
    assert set(cache) == {"https://ctx.example.org/schema"}


def test_prefetch_invalid_document_fails():
    docs = {"https://c/bad": ["not", "a", "context", "document"]}
    with pytest.raises(JsonLdError) as exc:
        build_context_cache(["https://c/bad"], MappingLoader(docs))
    assert exc.value.code == "invalid remote context"


def test_prefetch_validates_cache_at_driver():
    docs = {"https://c/broken": {"@context": {"@vocab": 42}}}
    with pytest.raises(JsonLdError) as exc:
        build_context_cache(["https://c/broken"], MappingLoader(docs))
    assert exc.value.code == "invalid vocab mapping"


def test_prefetch_overflow_guard():
    docs = {f"https://c/{i}": {"@context": [f"https://c/{i + 1}"]}
            for i in range(40)}
    docs["https://c/40"] = {"@context": {"p": "http://e/p"}}
    with pytest.raises(JsonLdError) as exc:
        build_context_cache(["https://c/0"], MappingLoader(docs),
                            max_contexts=30)
    assert exc.value.code == "context overflow"


def test_file_mirror_loader_roundtrip(tmp_path):
    loader = FileMirrorLoader(str(tmp_path))
    slug = FileMirrorLoader._default_path("https://ctx.example.org/schema")
    (tmp_path / slug).write_text(json.dumps(SCHEMA_STYLE))
    cache = build_context_cache(["https://ctx.example.org/schema"], loader)
    assert set(cache) == {"https://ctx.example.org/schema"}
    with pytest.raises(JsonLdError):
        loader.load("https://ctx.example.org/other")


def test_prefetched_cache_drives_the_kernel():
    cache = build_context_cache(["https://ctx.example.org/combo"],
                                MappingLoader(DOCS))
    block = json.dumps({
        "@context": "https://ctx.example.org/combo",
        "id": "http://e/doc", "type": "Article",
        "name": "T", "extra": "x",
        "author": "http://e/alice"})
    quads, err = parse_block(block, "https://site.org/p", 0, cache)
    assert err is None
    got = {(q[1], q[2]) for q in quads}
    assert ("<http://schema.org/name>", '"T"') in got
    assert ("<http://schema.org/author>", "<http://e/alice>") in got
    assert ("<http://e/extra>", '"x"') in got


# ---------------------------------------------------------------------------
# HttpLoader over a loopback http.server (no external network)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ctx_server():
    """Loopback server exercising every HttpLoader branch: JSON-LD and
    plain-JSON media types, redirects, HTML with/without an RFC 8288
    context Link (incl. a comma-in-quoted-param trap), malformed JSON,
    oversized bodies, and a transitive context chain."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    ctx_a = {"@context": {"@vocab": "http://schema.org/",
                          "name": "http://schema.org/name"}}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _send(self, body, ctype, headers=()):
            payload = body if isinstance(body, bytes) else body.encode()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            for k, v in headers:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            rel = f'rel="{JSONLD_CONTEXT_REL}"'
            if self.path == "/ctx.jsonld":
                self._send(json.dumps(ctx_a), "application/ld+json")
            elif self.path == "/plain.json":
                self._send(json.dumps(ctx_a), "application/json")
            elif self.path == "/act.json":
                self._send(json.dumps(ctx_a), "application/activity+json")
            elif self.path == "/redirect":
                self.send_response(302)
                self.send_header("Location", "/ctx.jsonld")
                self.end_headers()
            elif self.path == "/redirect-ftp":
                self.send_response(302)
                self.send_header("Location", "ftp://127.0.0.1/ctx")
                self.end_headers()
            elif self.path == "/html-linked":
                # quoted param with an escaped quote AND a comma before
                # the context link: the RFC 8288 tokenizer must step over
                # it (relative target resolves against this URL)
                self._send("<html></html>", "text/html", [(
                    "Link",
                    '</other>; rel="alternate"; title="a \\"b, c\\", '
                    f'</ctx.jsonld>; {rel}')])
            elif self.path == "/html-two-links":
                self._send("<html></html>", "text/html", [
                    ("Link", f"</ctx.jsonld>; {rel}"),
                    ("Link", f"</plain.json>; {rel}")])
            elif self.path == "/html-bare":
                self._send("<html></html>", "text/html")
            elif self.path == "/bad.json":
                self._send("{not json", "application/ld+json")
            elif self.path == "/huge.json":
                self._send(b'{"@context": {"x": "' + b"y" * 100_000
                           + b'"}}', "application/ld+json")
            elif self.path == "/chain-root.jsonld":
                self._send(json.dumps(
                    {"@context": ["/ctx.jsonld",
                                  {"extra": "http://e/extra"}]}),
                    "application/ld+json")
            else:
                self.send_response(404)
                self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_loader_media_types(ctx_server):
    loader = HttpLoader()
    for path in ("/ctx.jsonld", "/plain.json", "/act.json"):
        doc = loader.load(ctx_server + path)
        assert doc["@context"]["name"] == "http://schema.org/name"


def test_http_loader_follows_redirects(ctx_server):
    doc = HttpLoader().load(ctx_server + "/redirect")
    assert "@context" in doc


def test_http_loader_link_header_hop(ctx_server):
    # text/html + single context Link -> fetches the linked context,
    # stepping over the quoted "a \"b, c\" param trap
    doc = HttpLoader().load(ctx_server + "/html-linked")
    assert doc["@context"]["name"] == "http://schema.org/name"


def test_http_loader_link_header_errors(ctx_server):
    with pytest.raises(JsonLdError) as exc:
        HttpLoader().load(ctx_server + "/html-two-links")
    assert exc.value.code == "multiple context link headers"
    with pytest.raises(JsonLdError) as exc:
        HttpLoader().load(ctx_server + "/html-bare")
    assert exc.value.code == "loading remote context failed"


def test_http_loader_rejects_non_http_redirect(ctx_server):
    # SSRF guard: urllib's default redirect handler would follow 3xx to
    # ftp://; the loader must reject BEFORE any fetch
    with pytest.raises(JsonLdError) as exc:
        HttpLoader().load(ctx_server + "/redirect-ftp")
    assert exc.value.code == "loading remote context failed"
    assert "redirect to non-http" in str(exc.value)


def test_http_loader_failure_modes(ctx_server):
    for path, code in [("/missing", "loading remote context failed"),
                       ("/bad.json", "invalid remote context")]:
        with pytest.raises(JsonLdError) as exc:
            HttpLoader().load(ctx_server + path)
        assert exc.value.code == code
    with pytest.raises(JsonLdError) as exc:
        HttpLoader(max_bytes=1000).load(ctx_server + "/huge.json")
    assert exc.value.code == "loading remote context failed"
    with pytest.raises(JsonLdError) as exc:
        HttpLoader().load("ftp://127.0.0.1/ctx")
    assert exc.value.code == "loading remote context failed"


def test_http_loader_transitive_cache_build(ctx_server):
    # build_context_cache discovers /ctx.jsonld from /chain-root.jsonld's
    # relative reference and the result drives the kernel end-to-end
    cache = build_context_cache([ctx_server + "/chain-root.jsonld"],
                                HttpLoader())
    assert set(cache) == {ctx_server + "/chain-root.jsonld",
                          ctx_server + "/ctx.jsonld"}
    block = json.dumps({"@context": ctx_server + "/chain-root.jsonld",
                        "@id": "http://e/doc", "name": "T", "extra": "x"})
    quads, err = parse_block(block, "https://site.org/p", 0, cache)
    assert err is None
    got = {(q[1], q[2]) for q in quads}
    assert ("<http://schema.org/name>", '"T"') in got
    assert ("<http://e/extra>", '"x"') in got
