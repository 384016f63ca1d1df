"""Byte-exact Turtle serializer vs the reference's committed goldens.

Mirrors three reference recipes:
- tests/turtle/Makefile.am check-turtle-serialize-syntax: the five
  TEST_SERIALIZE_FILES must serialize to byte-identical *-out.ttl
  (bases per the recipe: '-' means no base for test-31/32/39);
- tests/feeds/Makefile.am check-rdfxml-to-turtle / check-atom-to-turtle:
  the feed inputs through the rdfxml / rss-tag-soup kernels must
  serialize (writeBaseURI=0) to byte-identical *-result.ttl;
- tests/turtle/Makefile.am check-turtle-serialize: every legal-suite
  file must round-trip parse -> serialize -> reparse isomorphically
  (the reference uses rdfdiff for this).
"""

import pytest

from raptor_spark.kernel import rdfxml as RX
from raptor_spark.kernel import rss as RSS
from raptor_spark.kernel import turtle as TTL
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.serialize import to_turtle_exact
from raptor_spark.kernel.suites import REF_TESTS, makefile_vars

TURTLE = REF_TESTS / "turtle"
FEEDS = REF_TESTS / "feeds"
BASE = "http://www.w3.org/2001/sw/DataAccess/df1/tests/"

# bases from check-turtle-serialize-syntax (tests/turtle/Makefile.am:216-226)
SERIALIZE_BASES = {
    "test-28": BASE + "test-28.ttl",
    "test-31": None,
    "test-32": None,
    "test-34": BASE + "test-34.ttl",
    "test-39": None,
}

FEED_RDF_BASES = {
    "test01": "http://example.org/whatsnew",
    "test02": "http://example.org/news/",
    "test03": "http://example.org",
}


def test_turtle_serialize_syntax_goldens():
    v = makefile_vars("turtle")
    files = [f.rsplit(".", 1)[0] for f in v["TEST_SERIALIZE_FILES"]]
    assert sorted(files) == sorted(SERIALIZE_BASES)
    fails = []
    for name, base in SERIALIZE_BASES.items():
        parser = TTL.TurtleParser(base_uri=base or "")
        triples, errs = parser.parse((TURTLE / (name + ".ttl")).read_text())
        assert not errs, (name, errs)
        got = to_turtle_exact(triples, parser.namespaces, base_uri=base)
        want = (TURTLE / (name + "-out.ttl")).read_text()
        if got != want:
            fails.append(name)
    assert not fails, fails


def test_feeds_rdfxml_to_turtle_goldens():
    fails = []
    for name, base in FEED_RDF_BASES.items():
        p = RX._Parser(base)
        p.run((FEEDS / (name + ".rdf")).read_bytes())
        assert not p.errors, (name, p.errors)
        got = to_turtle_exact(
            p.triples, p.namespaces, base_uri=base, write_base=False
        )
        if got != (FEEDS / (name + "-result.ttl")).read_text():
            fails.append(name)
    assert not fails, fails


def test_feeds_atom_to_turtle_goldens():
    fails = []
    base = "http://www.example.org/blog/"
    for name in ("test04", "test05"):
        p = RSS.RssParser(base)
        p.run((FEEDS / (name + ".atom")).read_bytes())
        assert not p.errors, (name, p.errors)
        got = to_turtle_exact(
            p.triples, p.namespaces(), base_uri=base, write_base=False
        )
        if got != (FEEDS / (name + "-result.ttl")).read_text():
            fails.append(name)
    assert not fails, fails


def test_turtle_serialize_roundtrip_suite():
    # check-turtle-serialize over the whole legal suite: serialize with
    # the exact writer, reparse, compare structurally (= rdfdiff)
    v = makefile_vars("turtle")
    rdf_ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns"
    special = {"rdf-schema": rdf_ns,
               "rdfs-namespace": "http://www.w3.org/2000/01/rdf-schema"}
    fails = []
    for f in v["TEST_FILES"]:
        name = f.rsplit(".", 1)[0]
        base = special.get(name, BASE + f)
        with open(TURTLE / f, encoding="utf-8", newline="") as fh:
            text = fh.read()
        parser = TTL.TurtleParser(base_uri=base)
        triples, errs = parser.parse(text)
        if errs:
            continue  # legal-suite parse is gated in test_kernel_turtle
        out = to_turtle_exact(triples, parser.namespaces, base_uri=base)
        reparsed, rerrs = TTL.parse_document(out, base_uri=base)
        if rerrs:
            fails.append((f, "reparse: %s" % rerrs[0]["message"]))
        elif not graphs_isomorphic(triples, reparsed):
            fails.append((f, "not isomorphic"))
    assert not fails, fails
