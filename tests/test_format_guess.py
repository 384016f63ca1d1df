"""Content sniffing (reference: raptor_guess.c + per-parser
recognise_syntax scorers): every fixture of each syntax family must be
routed to a kernel that parses it cleanly — the property the reference's
guess parser guarantees (it delegates to the highest-scoring parser)."""

from raptor_spark.kernel.suites import REF_TESTS, makefile_vars
from raptor_spark.operators.parse import guess_format, parse_one


def _read(path):
    with open(path, encoding="utf-8", errors="surrogateescape", newline="") as fh:
        return fh.read()


def test_guess_routes_fixtures_to_a_working_parser():
    cases = []
    v = makefile_vars("turtle-2013")
    for f in v["TEST_EVAL_FILES"][:40]:
        cases.append((REF_TESTS / "turtle-2013" / f,
                      "http://www.w3.org/2013/TurtleTests/" + f))
    v = makefile_vars("ntriples-2013")
    for f in v["TEST_GOOD_FILES"][:20]:
        cases.append((REF_TESTS / "ntriples-2013" / f, None))
    v = makefile_vars("rdfxml")
    for f in v["RDF_TEST_FILES"][:20]:
        if f.endswith(".rdf") and f not in {"ex-64.rdf", "ex-65.rdf",
                                            "bug-650.rdf"}:
            cases.append((REF_TESTS / "rdfxml" / f,
                          "http://librdf.org/raptor/tests/" + f))
    v = makefile_vars("json")
    for f in v["TEST_FILES"]:
        cases.append((REF_TESTS / "json" / f, "http://example.librdf.org/"))

    fails = []
    for path, base in cases:
        text = _read(path)
        fmt = guess_format(text)
        triples, errs = parse_one(text, fmt, base)
        if errs:
            fails.append((path.name, fmt, errs[0]["message"]))
    assert not fails, fails[:10]


def test_guess_basic_shapes():
    assert guess_format('<?xml version="1.0"?><rdf:RDF/>') == "rdfxml"
    assert guess_format('{"triples": []}') == "json"
    assert guess_format("<http://a/> <http://b/> <http://c/> .") == "ntriples"
    assert (
        guess_format("<http://a/> <http://b/> <http://c/> <http://g/> .")
        == "nquads"
    )
    assert guess_format("@prefix ex: <http://e/> .\nex:a ex:b ex:c .") == "turtle"
    assert guess_format("<http://g/> { <http://a/> <http://b/> <http://c/> . }") == "trig"
