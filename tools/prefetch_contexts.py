"""CLI: build the broadcast remote-context cache at the driver.

    python tools/prefetch_contexts.py --http --out cache.json IRI...
    python tools/prefetch_contexts.py --mirror DIR --out cache.json IRI...

Fetches every IRI (plus transitively referenced contexts) through
HttpLoader (--http; real network), a directory mirror, or a JSON mapping
(see ``jsonld_streaming_parser_js_spark/sources/prefetch.py``), validates
the result once, and writes the JSON mapping that jobs load and
broadcast:

    cache = json.load(open("cache.json"))
    parse_pages(pages, ctx_cache=cache)
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from jsonld_streaming_parser_js_spark.sources.prefetch import (  # noqa: E402
    FileMirrorLoader,
    HttpLoader,
    MappingLoader,
    build_context_cache,
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("iris", nargs="+", help="root context IRIs to prefetch")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--mirror", help="directory of mirrored .jsonld files")
    src.add_argument("--mapping",
                     help="JSON file {iri: document} to load from")
    src.add_argument("--http", action="store_true",
                     help="fetch over http(s) with HttpLoader (media-type "
                          "gate, RFC 8288 Link hop, bounded redirects)")
    ap.add_argument("--timeout", type=float, default=10.0,
                    help="per-request timeout for --http")
    ap.add_argument("--out", required=True, help="output cache JSON path")
    ap.add_argument("--lenient", action="store_true",
                    help="skip unloadable contexts instead of failing")
    args = ap.parse_args()
    if args.mirror:
        loader = FileMirrorLoader(args.mirror)
    elif args.mapping:
        with open(args.mapping, encoding="utf-8") as fh:
            loader = MappingLoader(json.load(fh))
    else:
        loader = HttpLoader(timeout=args.timeout)
    cache = build_context_cache(args.iris, loader,
                                strict=not args.lenient)
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(cache, fh, sort_keys=True)
    print(f"{len(cache)} contexts -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
