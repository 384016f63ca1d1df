"""GRDDL kernel conformance vs the reference suite (tests/grddl) plus
unit coverage of the link-selection, noNet and shared-genid rules.

The reference harness (tests/grddl/Makefile.am check-grddl) runs
``rapper -f noNet -q -i grddl -o ntriples $test`` and byte-compares the
N-Triples output against ``$name.out``; failures with warnings (exit 2)
are accepted. The kernel test reproduces exactly that: local-file
fetches only, byte-exact N-Triples comparison, per-link errors allowed.
"""

from raptor_spark.kernel import grddl as GR
from raptor_spark.kernel.serialize import to_ntriples
from raptor_spark.kernel.suites import REF_TESTS, makefile_vars
from raptor_spark.kernel.uri import filename_to_uri

SUITE = REF_TESTS / "grddl"

XHTML = '<html xmlns="http://www.w3.org/1999/xhtml">'


def test_grddl_suite_byte_exact():
    v = makefile_vars("grddl")
    assert v["TEST_FILES"], "suite vanished?"
    for f in v["TEST_FILES"]:
        path = SUITE / f
        base = filename_to_uri(str(path))
        data = path.read_bytes()
        triples, errors = GR.parse_document(data, base_uri=base)
        # the harness accepts "ok with warnings" (exit 2); data-01.nt is
        # a comment-only file so it may or may not warn, but must never
        # kill the parse
        golden = (SUITE / (f.rsplit(".", 1)[0] + ".out")).read_bytes()
        assert to_ntriples(triples).encode() == golden, (f, errors)


def _doc(head_links="", body=""):
    return (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        + XHTML
        + "<head><title>t</title>"
        + head_links
        + "</head><body>"
        + body
        + "</body></html>"
    )


def test_link_selection_rules():
    # matches: direct html>head>link with exact @type and an @href
    links, errs = GR.discover_links(
        _doc(
            '<link rel="meta" type="application/rdf+xml" href="a.rdf"/>'
            '<link type="application/rdf+xml" href="b.nt"/>'
        ),
        base_uri="http://ex.org/dir/page.html",
    )
    assert not errs
    assert links == ["http://ex.org/dir/a.rdf", "http://ex.org/dir/b.nt"]

    # non-matches: wrong @type, missing @href, link in <body>, link
    # nested deeper than a direct child of <head>
    links, errs = GR.discover_links(
        _doc(
            '<link type="text/css" href="style.css"/>'
            '<link type="application/rdf+xml"/>'
            '<object><link type="application/rdf+xml" href="x.rdf"/>'
            "</object>",
            body='<link type="application/rdf+xml" href="y.rdf"/>',
        ),
        base_uri="http://ex.org/p",
    )
    assert not errs and links == []

    # non-XHTML root: well-formed, zero links, zero errors
    links, errs = GR.discover_links("<root><link href='x'/></root>")
    assert not errs and links == []

    # ill-formed XML is an error (the reference needs an XML parse
    # before any XPath runs)
    links, errs = GR.discover_links("<html><head>")
    assert links == [] and errs


def test_nonet_blocks_and_ignores_errors():
    doc = _doc(
        '<link type="application/rdf+xml" href="http://ex.org/remote.rdf"/>'
        '<link type="application/rdf+xml" href="good.nt"/>'
    )
    bundle = {
        "http://ex.org/dir/good.nt": "<http://s> <http://p> \"o\" .\n"
    }
    triples, errors = GR.parse_document(
        doc, base_uri="http://ex.org/dir/page.html", fetch=bundle.get
    )
    # the unfetchable link is recorded and skipped; the good link parses
    assert [t.subj for t in triples] == ["http://s"]
    assert any("remote.rdf" in e["message"] for e in errors)

    # default fetcher refuses non-file schemes outright
    assert GR.local_file_fetch("http://ex.org/x.rdf") is None


def test_genid_counter_shared_across_links():
    doc = _doc(
        '<link type="application/rdf+xml" href="a.ttl"/>'
        '<link type="application/rdf+xml" href="b.ttl"/>'
    )
    bundle = {
        # two bnodes per linked document; labels restart inside each
        # inner parse but the GRDDL world counter must not
        "http://ex.org/a.ttl": "_:x <http://p> _:y .",
        "http://ex.org/b.ttl": "_:x <http://p> _:y .",
    }
    triples, errors = GR.parse_document(
        doc, base_uri="http://ex.org/page.html", fetch=bundle.get
    )
    assert not errors
    assert [(t.subj, t.obj_lex) for t in triples] == [
        ("_:genid1", "genid2"),
        ("_:genid3", "genid4"),
    ]


def test_parse_one_dispatches_grddl():
    from raptor_spark.operators.parse import parse_one

    doc = _doc('<link type="application/rdf+xml" href="d.nt"/>')
    bundle = {"http://ex.org/d.nt": "<http://s> <http://p> <http://o> .\n"}
    triples, errors = parse_one(
        doc, "grddl", base_uri="http://ex.org/page.html", fetch=bundle.get
    )
    assert not errors and len(triples) == 1


def test_unguessable_link_is_an_error_not_rdfxml():
    """A linked resource whose content/suffix clears no guess score is
    a recorded guess failure, like the reference's guess parser
    (raptor_guess.c:136-140 'Failed to guess parser...'), NOT a forced
    RDF/XML parse: an extensionless rdf:RDF fragment that the guess
    scorer rejects must contribute an error and zero triples."""
    doc = _doc('<link type="application/rdf+xml" href="mystery"/>')
    bundle = {"http://ex.org/mystery": "no rdf signals at all"}
    triples, errors = GR.parse_document(
        doc, base_uri="http://ex.org/page.html", fetch=bundle.get
    )
    assert triples == []
    assert any(
        "failed to guess parser" in e["message"] for e in errors
    ), errors
