"""Atom serializer vs the reference's committed goldens.

Mirrors tests/feeds/Makefile.am check-serialize-atom: the turtle outputs
of the feed tests (== the committed *-result.ttl) serialized to Atom
with rssTriples=atom-triples must byte-match *-result.atom — including
test01's atomEntryUri single-entry mode.
"""

from raptor_spark.kernel import rss as RSS
from raptor_spark.kernel import turtle as TTL
from raptor_spark.kernel.atom import to_atom
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.suites import REF_TESTS

FEEDS = REF_TESTS / "feeds"

# bases/options per the check-serialize-atom recipe
# (tests/feeds/Makefile.am:174-196)
CASES = [
    ("test01", "http://example.org/whatsnew",
     "http://example.org/2006/03/28/blog-item"),
    ("test02", "http://example.org/news/", None),
    ("test03", "http://example.org", None),
]


def test_serialize_atom_goldens():
    fails = []
    for name, base, entry_uri in CASES:
        parser = TTL.TurtleParser(base_uri=base)
        triples, errs = parser.parse(
            (FEEDS / (name + "-result.ttl")).read_text()
        )
        assert not errs, (name, errs)
        got = to_atom(
            triples, parser.namespaces, base_uri=base, entry_uri=entry_uri
        )
        if got != (FEEDS / (name + "-result.atom")).read_text():
            fails.append(name)
    assert not fails, fails


def test_atom_output_reparses():
    # the emitted atom is a valid feed for the rss-tag-soup kernel, and
    # carries the core model through a full write -> parse cycle
    base = "http://example.org/news/"
    parser = TTL.TurtleParser(base_uri=base)
    triples, _ = parser.parse(
        (FEEDS / "test02-result.ttl").read_text()
    )
    xml = to_atom(triples, parser.namespaces, base_uri=base)
    reparsed, errs = RSS.parse_document(xml, base_uri=base)
    assert not errs
    ix = {(t.subj, t.pred): t.obj_lex for t in reparsed}
    rss = "http://purl.org/rss/1.0/"
    assert ix[(base, rss + "title")] == "Example News"
    # both entries survive with their ids as subjects
    assert (base + "2008-03-30", rss + "title") in ix
    assert (base + "2007-10-01", rss + "title") in ix
    assert not graphs_isomorphic(reparsed, [])  # non-empty
