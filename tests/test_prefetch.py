"""Context-prefetch tool: build the broadcast cache from a document loader
(reference analog: IDocumentLoader, lib/JsonLdParser.ts:633-636)."""

from __future__ import annotations

import json

import pytest

from jsonld_streaming_parser_js_spark.functions.context import JsonLdError
from jsonld_streaming_parser_js_spark.functions.parser import parse_block
from jsonld_streaming_parser_js_spark.sources.prefetch import (
    FileMirrorLoader, MappingLoader, build_context_cache)

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
