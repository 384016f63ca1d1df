"""RDF/JSON kernel conformance vs the reference suite (tests/json):
example*.json must match their .nt goldens structurally; bad-*.json must
produce >=1 error (reference harness: tests/json/Makefile.am)."""

from raptor_spark.kernel import ntriples as NT
from raptor_spark.kernel import rdfjson as RJ
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.suites import REF_TESTS, makefile_vars

SUITE = REF_TESTS / "json"


def _read(name):
    with open(SUITE / name, encoding="utf-8", newline="") as fh:
        return fh.read()


def test_json_good():
    v = makefile_vars("json")
    fails = []
    for f in v["TEST_FILES"]:
        triples, errs = RJ.parse_document(_read(f))
        if errs:
            fails.append((f, errs[0]["message"]))
            continue
        gold, gerrs = NT.parse_document(_read(f.rsplit(".", 1)[0] + ".nt"))
        assert not gerrs
        if not graphs_isomorphic(triples, gold):
            fails.append((f, "not isomorphic (%d triples)" % len(triples)))
    assert not fails, fails


def test_json_bad():
    v = makefile_vars("json")
    passes = []
    for f in v["JSON_BAD_TEST_FILES"]:
        triples, errs = RJ.parse_document(_read(f))
        if not errs:
            passes.append(f)
    assert not passes, passes


def test_literal_with_lang_and_datatype_is_error_record():
    """A literal carrying BOTH lang and datatype is a recorded input
    error like every other malformed-term shape — make_literal's
    ValueError must not escape the kernel (GRDDL recursion and direct
    callers have no try/except)."""
    from raptor_spark.kernel.rdfjson import parse_document

    t, e = parse_document(
        '{"http://s": {"http://p": [{"value":"x","type":"literal",'
        '"lang":"en","datatype":"http://dt"}]}}'
    )
    assert t == [] and len(e) == 1
    assert "both datatype and language" in e[0]["message"]
