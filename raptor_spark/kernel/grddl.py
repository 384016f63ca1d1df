"""GRDDL link-discovery parsing (reference: src/raptor_grddl.c).

Implemented surface — the XHTML alternate-form link path, which is the
exact path the reference's committed test suite exercises
(tests/grddl/test-01.html, run by tests/grddl/Makefile.am with
``rapper -f noNet -q -i grddl``):

- select ``/html:html/html:head/html:link[@type="application/rdf+xml"]
  /@href`` in document order (raptor_grddl.c:1872-1910; gated there by
  RAPTOR_OPTION_HTML_LINK, default on);
- resolve each @href against the document base URI;
- fetch and parse each linked document with the GUESS parser — the
  link's @type attribute is deliberately NOT used to pick the parser
  (raptor_grddl.c:1901 passes "guess"; the fixture's own comment calls
  this out: data-01.nt is attempted as N-Triples despite
  type="application/rdf+xml");
- ignore per-link fetch/parse failures and keep going
  (RECURSIVE_FLAGS_IGNORE_ERRORS — the harness accepts exit status 2,
  "ok with warnings");
- blank-node labels continue across the inner parses from ONE shared
  counter (raptor's bnode ids come from the world, not the parser:
  src/raptor_world.c raptor_world_generate_bnodeid), which is why
  test-01.out reads genid1 / genid2 across two linked documents.

Fetching is caller-supplied and LOCAL-ONLY by design — the strong form
of the reference's noNet option (no network code exists anywhere in
this repo). The default fetcher accepts file: URIs only; the Spark
operator passes a closure over a per-row resource map (a crawl-bundle /
WARC-shaped layout where linked resources are co-partitioned with the
page, so the operator stays map-only at any scale).

Declared out of scope (SURVEY.md §2.1 note): the XSLT transformation
paths — profile-URI transforms, dataview:transformation attributes,
namespace-document transforms and the hardcoded microformat sheets
(raptor_grddl.c:404-520, 1560-1870) — which require remote stylesheet
fetch plus libxslt. No fixture in the reference's committed test suite
reaches them (they need the network the suite's noNet flag forbids).
"""

from __future__ import annotations

import xml.parsers.expat
from typing import Callable, List, Optional, Tuple

from raptor_spark.kernel.terms import KIND_BLANK, Triple
from raptor_spark.kernel.uri import resolve_uri, uri_to_filename

XHTML_NS = "http://www.w3.org/1999/xhtml"
RDFXML_MIME = "application/rdf+xml"

# fetch: absolute URI -> document payload (bytes or str), or None when
# the resource cannot / must not be retrieved (out-of-bundle, non-file
# scheme, missing file). Never raises for ordinary misses.
Fetcher = Callable[[str], Optional[object]]


def local_file_fetch(uri: str) -> Optional[bytes]:
    """Strong-noNet default fetcher: file: URIs only, read as bytes so
    RDF/XML encoding declarations survive (expat needs raw bytes)."""
    path = uri_to_filename(uri)
    if path is None:
        return None
    try:
        with open(path, "rb") as fh:
            return fh.read()
    except OSError:
        return None


def discover_links(
    text, base_uri: Optional[str] = None
) -> Tuple[List[str], List[dict]]:
    """Find the alternate-form RDF links of an XHTML document.

    Returns (absolute URIs in document order, errors). Mirrors the
    reference's XPath ``/html:html/html:head/html:link[@type=
    "application/rdf+xml"]/@href`` (raptor_grddl.c:1880): only direct
    html > head > link children in the XHTML namespace count, the @type
    match is exact, and links without @href are skipped. A document
    that is not namespace-well-formed XML is an error (the reference
    requires an XML parse before any XPath runs); a well-formed
    document with a non-XHTML root simply yields no links.
    """
    parser = xml.parsers.expat.ParserCreate(namespace_separator=" ")
    # never load external DTDs/entities (same stance as kernel/rdfxml)
    parser.SetParamEntityParsing(xml.parsers.expat.XML_PARAM_ENTITY_PARSING_NEVER)

    stack: List[Tuple[str, str]] = []
    hrefs: List[str] = []

    def split_name(name: str) -> Tuple[str, str]:
        ns, _, local = name.rpartition(" ")
        return ns, local

    def start(name, attrs):
        ns, local = split_name(name)
        stack.append((ns, local))
        if (
            len(stack) == 3
            and stack[0] == (XHTML_NS, "html")
            and stack[1] == (XHTML_NS, "head")
            and (ns, local) == (XHTML_NS, "link")
            and attrs.get("type") == RDFXML_MIME
            and "href" in attrs
        ):
            hrefs.append(attrs["href"])

    def end(name):
        stack.pop()

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    try:
        parser.Parse(text, True)
    except (xml.parsers.expat.ExpatError, UnicodeEncodeError, ValueError) as exc:
        # UnicodeEncodeError: expat re-encodes str input to UTF-8, so a
        # lone surrogate is a parse failure, not a crash (same guard as
        # kernel/rdfxml.py)
        return [], [
            {
                "line": getattr(exc, "lineno", 0) or 0,
                "message": "GRDDL: XML parse failed: %s" % exc,
            }
        ]
    return [resolve_uri(base_uri, h) for h in hrefs], []


def _relabel(triples: List[Triple], counter: List[int]) -> List[Triple]:
    """Map one inner document's blank labels onto the shared genid
    sequence, in order of first occurrence in the emitted stream."""
    mapping: dict = {}

    def blank(term: Optional[str]) -> Optional[str]:
        if term is None or not term.startswith("_:"):
            return term
        out = mapping.get(term)
        if out is None:
            counter[0] += 1
            out = "_:genid%d" % counter[0]
            mapping[term] = out
        return out

    out = []
    for t in triples:
        # term construction order (subject, then object, then graph)
        # decides genid assignment, as in the reference's statement
        # builders
        subj = blank(t.subj)
        obj_lex = t.obj_lex
        if t.obj_kind == KIND_BLANK:
            obj_lex = blank("_:" + obj_lex)[2:]
        out.append(
            t._replace(subj=subj, obj_lex=obj_lex, graph=blank(t.graph))
        )
    return out


def parse_document(
    text,
    base_uri: Optional[str] = None,
    fetch: Optional[Fetcher] = None,
) -> Tuple[List[Triple], List[dict]]:
    """GRDDL-parse one XHTML document -> (triples, errors).

    ``fetch`` maps an absolute URI to the linked document's payload (or
    None); defaults to :func:`local_file_fetch`. Per-link failures are
    recorded and skipped, matching the reference's IGNORE_ERRORS
    recursion — the two-triple test-01.out is produced even though the
    middle link (data-01.nt, a comment-only file guessed as N-Triples)
    contributes nothing.
    """
    from raptor_spark.operators.parse import parse_one  # runtime import:
    # operators.parse dispatches fmt=='grddl' here lazily, so neither
    # module needs the other at import time

    from raptor_spark.kernel.guess import guess_parser_name

    if fetch is None:
        fetch = local_file_fetch

    links, errors = discover_links(text, base_uri=base_uri)
    triples: List[Triple] = []
    counter = [0]
    for uri in links:
        data = fetch(uri)
        if data is None:
            errors.append(
                {
                    "line": 0,
                    "message": "GRDDL: could not fetch <%s> (noNet/local-only)"
                    % uri,
                }
            )
            continue
        buf = (
            # surrogateescape, not 'replace': non-UTF-8 bytes in a
            # linked text document round-trip through kernels that
            # re-encode (rdfxml/rdfa) instead of becoming U+FFFD in
            # emitted literals
            data.decode("utf-8", "surrogateescape")
            if isinstance(data, bytes)
            else data
        )
        # the reference recurses with the "guess" parser; the linked
        # URI is the identifier (suffix scoring), there is no MIME type
        # for a local fetch. A failed guess is a recorded error, NOT a
        # forced-rdfxml retry (raptor_guess.c:136-140 raises
        # "Failed to guess parser from content type" and parses nothing)
        fmt = guess_parser_name(buf, identifier=uri)
        if fmt is None:
            errors.append(
                {
                    "line": 0,
                    "message": "GRDDL <%s>: failed to guess parser "
                    "from content type '(none)'" % uri,
                }
            )
            continue
        # rdfxml gets the raw bytes so its encoding declaration is
        # honored; the text kernels take the decoded form
        payload = data if fmt in ("rdfxml", "raptor") else buf
        inner_triples, inner_errors = parse_one(payload, fmt, base_uri=uri)
        for e in inner_errors:
            errors.append(
                {
                    "line": e.get("line", 0),
                    "message": "GRDDL <%s>: %s" % (uri, e.get("message")),
                }
            )
        triples.extend(_relabel(inner_triples, counter))
    return triples, errors
