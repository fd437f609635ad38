"""fromHttpResponse analog: media-type gate + Link-header context.

Mirrors the reference's #fromHttpResponse suite
(/root/reference/test/JsonLdParser-test.ts:96-230), re-expressed over the
``responses`` table operator (operators/responses.py): instead of a thrown
ErrorCoded, a gated-out response yields an error-channel row.
"""

from __future__ import annotations

import pytest

from jsonld_streaming_parser_js_spark.operators.responses import (
    gate_responses,
    parse_responses,
)

CTX_REL = "http://www.w3.org/ns/json-ld#context"
CTX_LINK = f'<https://ctx.example.org/c1>; rel="{CTX_REL}"'
CTX_LINK2 = f'<https://ctx.example.org/c2>; rel="{CTX_REL}"'
CACHE = {
    "https://ctx.example.org/c1": {
        "@context": {"@vocab": "http://schema.org/"}},
}
BODY = '{"@id": "https://x.org/e", "name": "N"}'
BODY_INLINE = ('{"@context": {"@vocab": "http://ex.org/"},'
               ' "@id": "https://x.org/e", "name": "N"}')


def _resp(spark, media_type, links, body=BODY):
    return spark.createDataFrame(
        [("https://x.org/doc", media_type, links, body)],
        "url string, media_type string, link_headers array<string>,"
        " body string")


def _gate_row(spark, media_type, links):
    return gate_responses(_resp(spark, media_type, links)).collect()[0]


def test_jsonld_media_type_passes_without_link(spark):
    row = _gate_row(spark, "application/ld+json", [])
    assert row["error"] is None and row["ctx_iri"] is None


def test_activitystreams_handled_like_jsonld(spark):
    # JsonLdParser-test.ts:111-113 — well-known media type, no link needed
    row = _gate_row(spark, "application/activity+json", [])
    assert row["error"] is None and row["ctx_iri"] is None


def test_activity_json_needs_link_when_not_well_known(spark):
    # JsonLdParser-test.ts:127-131 — wellKnownMediaTypes: []
    rows = gate_responses(_resp(spark, "application/activity+json", []),
                          well_known_media_types=()).collect()
    assert rows[0]["error"] == "loading document failed"


def test_non_json_media_type_errors_even_with_link(spark):
    # JsonLdParser-test.ts:121-123, 160-163
    assert (_gate_row(spark, "text/turtle", [])["error"]
            == "loading document failed")
    assert (_gate_row(spark, "text/turtle", [CTX_LINK])["error"]
            == "loading document failed")


def test_plain_json_without_link_errors(spark):
    # JsonLdParser-test.ts:133-136 (and +json extension types :138-141)
    assert (_gate_row(spark, "application/json", [])["error"]
            == "loading document failed")
    assert (_gate_row(spark, "text/turtle+json", [])["error"]
            == "loading document failed")


def test_ignore_missing_context_link_header(spark):
    # JsonLdParser-test.ts:145-157
    for mt in ("application/json", "text/turtle+json"):
        rows = gate_responses(
            _resp(spark, mt, []),
            ignore_missing_context_link_header=True).collect()
        assert rows[0]["error"] is None and rows[0]["ctx_iri"] is None


def test_json_with_link_header_takes_context(spark):
    # JsonLdParser-test.ts:165-169, 186-190
    for mt in ("application/json", "text/turtle+json"):
        row = _gate_row(spark, mt, [CTX_LINK])
        assert row["error"] is None
        assert row["ctx_iri"] == "https://ctx.example.org/c1"


def test_multiple_context_links_error(spark):
    # JsonLdParser-test.ts:197-212 — repeated Link headers and a single
    # comma-joined header value are both "multiple"
    for links in ([CTX_LINK, CTX_LINK2], [f"{CTX_LINK}, {CTX_LINK2}"]):
        for mt in ("application/json", "text/turtle+json"):
            row = _gate_row(spark, mt, links)
            assert row["error"] == "multiple context link headers"


def test_other_rel_links_ignored(spark):
    # JsonLdParser-test.ts:214-221 — one context link among other links
    row = _gate_row(spark, "application/json",
                    ['<https://other.org/x>; rel="alternate"', CTX_LINK])
    assert row["error"] is None
    assert row["ctx_iri"] == "https://ctx.example.org/c1"


def test_link_header_ignored_for_jsonld_media_type(spark):
    # spec: the context link header applies only to non-JSON-LD responses
    row = _gate_row(spark, "application/ld+json", [CTX_LINK, CTX_LINK2])
    assert row["error"] is None and row["ctx_iri"] is None


def test_parse_responses_applies_linked_context(spark):
    parsed = parse_responses(_resp(spark, "application/json", [CTX_LINK]),
                             CACHE).collect()
    quads = [(r["subj"], r["pred"], r["obj"]) for r in parsed]
    assert quads == [("<https://x.org/e>", "<http://schema.org/name>",
                      '"N"')]


def test_parse_responses_error_rows_flow_to_channel(spark):
    parsed = parse_responses(_resp(spark, "text/plain", []), CACHE).collect()
    assert len(parsed) == 1
    assert parsed[0]["error"] == "loading document failed"
    assert parsed[0]["subj"] is None


def test_parse_responses_missing_cached_context_is_recoverable(spark):
    missing = f'<https://ctx.example.org/absent>; rel="{CTX_REL}"'
    parsed = parse_responses(_resp(spark, "application/json", [missing]),
                             CACHE).collect()
    assert parsed[0]["error"] is not None  # kernel remote-load failure code


def test_inline_context_used_for_jsonld_media_type(spark):
    parsed = parse_responses(
        _resp(spark, "application/ld+json", [], body=BODY_INLINE),
        CACHE).collect()
    assert [(r["pred"]) for r in parsed] == ["<http://ex.org/name>"]


def test_null_media_type_is_unsupported(spark):
    row = gate_responses(spark.createDataFrame(
        [("https://x.org/doc", None, [CTX_LINK], BODY)],
        "url string, media_type string, link_headers array<string>,"
        " body string")).collect()[0]
    assert row["error"] == "loading document failed"


def test_rel_space_separated_list_matches(spark):
    # RFC 8288: rel may be a space-separated list of relation types
    link = f'<https://ctx.example.org/c1>; rel="describedby {CTX_REL}"'
    row = _gate_row(spark, "application/json", [link])
    assert row["error"] is None
    assert row["ctx_iri"] == "https://ctx.example.org/c1"


def test_rel_with_similar_iri_not_matched(spark):
    # dots are literal: a rel of ...json-ldXcontext must NOT match
    link = '<https://c/x>; rel="http://wwwXw3Xorg/ns/json-ld#context"'
    row = _gate_row(spark, "application/json", [link])
    assert row["error"] == "loading document failed"


def test_comma_inside_quoted_param_before_rel(spark):
    # RFC 8288 quoted-string params may contain commas; the element must
    # still match (reference parseLinkHeader tokenizes quoted strings)
    link = f'<https://ctx.example.org/c1>; title="a, b"; rel="{CTX_REL}"'
    row = _gate_row(spark, "application/json", [link])
    assert row["error"] is None
    assert row["ctx_iri"] == "https://ctx.example.org/c1"


def test_comma_separated_link_elements_still_split(spark):
    # two elements in ONE header value, only the second is a context link
    link = (f'<https://o/x>; rel="describedby", '
            f'<https://ctx.example.org/c2>; rel="{CTX_REL}"')
    row = _gate_row(spark, "application/json", [link])
    assert row["error"] is None
    assert row["ctx_iri"] == "https://ctx.example.org/c2"


def test_two_context_elements_one_header_is_multiple(spark):
    link = (f'<https://c/a>; rel="{CTX_REL}", '
            f'<https://c/b>; rel="{CTX_REL}"')
    row = _gate_row(spark, "application/json", [link])
    assert row["error"] == "multiple context link headers"


def test_escaped_quote_inside_quoted_param(spark):
    # RFC 8288 quoted-pair: an escaped quote (and a comma after it) inside
    # an earlier quoted param must not end the element early
    link = (f'<https://o/x>; title="a \\"b, c\\""; rel="describedby", '
            f'<https://ctx.example.org/c3>; rel="{CTX_REL}"')
    row = _gate_row(spark, "application/json", [link])
    assert row["error"] is None
    assert row["ctx_iri"] == "https://ctx.example.org/c3"
