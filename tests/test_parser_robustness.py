"""Parser robustness fuzzing (the reference ships a libFuzzer harness,
tests/fuzz/fuzz_parser.c — same contract here: arbitrary input must
produce triples and/or error records, never an uncaught exception)."""

from hypothesis import given, settings

from fuzzbudget import budget
from hypothesis import strategies as st

from raptor_spark.operators.parse import guess_format, parse_one

FORMATS = [
    "ntriples", "nquads", "turtle", "trig", "rdfxml", "json", "guess",
    "rdfa", "rss-tag-soup", "grddl",
]

_fragments = st.sampled_from(
    [
        "<http://a/> ", '"lit', "@prefix ", "_:b ", "( ", "[ ", "{ ", "} ",
        "^^", "@en", " . ", "\\u00", "\\", "<rdf:RDF", "rdf:about=", "<!--",
        '{"triples": [', '"value":', "#comment\n", "\x00", "\ud800", "é中",
        "%GG", "PREFIX x: <u>", "a ", ";\n", "1.5e3 ", "'''q''' ",
    ]
)
_soup = st.lists(_fragments, max_size=24).map("".join)


@settings(max_examples=budget(120), deadline=None)
@given(_soup, st.sampled_from(FORMATS))
def test_parse_never_raises(text, fmt):
    triples, errors = parse_one(text, fmt, "http://base/")
    assert isinstance(triples, list) and isinstance(errors, list)
    for e in errors:
        assert "message" in e


@settings(max_examples=budget(60), deadline=None)
@given(st.binary(max_size=200))
def test_parse_random_bytes_never_raises(data):
    text = data.decode("utf-8", "surrogateescape")
    fmt = guess_format(text)
    triples, errors = parse_one(text, fmt, "http://base/")
    assert isinstance(triples, list) and isinstance(errors, list)


_colon_parts = st.sampled_from(
    [
        '<doc xmlns="http://x/"', ' :p="v"', ' ns:="w"', "><ns:",
        ' rdf:=""', "/></doc>", '<!DOCTYPE d [<!ENTITY e "v">]>',
        ' xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
        ' rdf:about="x" r:about="y"',
    ]
)


@settings(max_examples=budget(120), deadline=None)
@given(st.lists(_colon_parts, max_size=8).map("".join))
def test_rdfxml_tolerant_rewrite_never_raises(text):
    """Colon-heavy near-XML exercises the namespace-ill-formedness
    rewrite pre-pass (kernel/rdfxml._tolerant_rewrite); whatever the
    outcome, the parser returns (triples, errors), never raises."""
    from raptor_spark.kernel import rdfxml as RX

    triples, errors = RX.parse_document(text, base_uri="http://base/")
    assert isinstance(triples, list) and isinstance(errors, list)


_xhtml_parts = st.sampled_from(
    [
        '<html xmlns="http://www.w3.org/1999/xhtml">', "<head>", "</head>",
        '<link type="application/rdf+xml" href="a.rdf"/>',
        '<link type="application/rdf+xml" href="%GG"/>',
        '<link type="application/rdf+xml" href=""/>',
        '<link type="text/css" href="a.rdf"/>', "<link/>", "<body>",
        "</body>", "</html>", "<p>", "text é中", "<!-- c -->", "&amp;",
        "\ud800", "\x00",
    ]
)


@settings(max_examples=budget(120), deadline=None)
@given(
    st.lists(_xhtml_parts, max_size=10).map("".join),
    st.binary(max_size=80),
)
def test_grddl_never_raises(doc, payload):
    """GRDDL composes XML link discovery, URI resolution, the guess
    scorer, an inner parse and bnode relabeling; whatever the document
    or the fetched payload, it returns (triples, errors), never raises
    (same contract as the reference's fuzz harness)."""
    from raptor_spark.kernel import grddl as GR

    triples, errors = GR.parse_document(
        doc, base_uri="http://base/dir/x.html", fetch=lambda uri: payload
    )
    assert isinstance(triples, list) and isinstance(errors, list)
