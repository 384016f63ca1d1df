"""Turtle/TriG kernel conformance vs the reference's committed suites.

Drives the same good/bad/eval lists the reference's automake harness uses
(tests/turtle-2013/Makefile.am:494-612 semantics: good => no errors,
bad => >=1 error, eval => structural graph equality with the golden).
"""

import pathlib

import pytest

from raptor_spark.kernel import ntriples as NT
from raptor_spark.kernel import turtle as T
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.suites import REF_TESTS, makefile_vars


def _read(p: pathlib.Path) -> str:
    # newline='' — universal-newline translation would corrupt \r fixtures
    with open(p, encoding="utf-8", errors="surrogateescape", newline="") as fh:
        return fh.read()


def _parse(suite, base_uri_prefix, f, trig):
    return T.parse_document(
        _read(REF_TESTS / suite / f), base_uri=base_uri_prefix + f, trig=trig
    )


SUITES = {
    "turtle-2013": ("http://www.w3.org/2013/TurtleTests/", False),
    "trig-2013": ("http://www.w3.org/2013/TriGTests/", True),
    "turtle": ("http://www.w3.org/2001/sw/DataAccess/df1/tests/", False),
    "trig": ("http://example.librdf.org/", True),
}


@pytest.mark.parametrize("suite", ["turtle-2013", "trig-2013"])
def test_good_files_parse_clean(suite):
    prefix, trig = SUITES[suite]
    v = makefile_vars(suite)
    fails = []
    for f in v["TEST_GOOD_FILES"]:
        triples, errs = _parse(suite, prefix, f, trig)
        if errs:
            fails.append((f, errs[0]["message"]))
    assert not fails, fails


@pytest.mark.parametrize("suite", ["turtle-2013", "trig-2013"])
def test_bad_files_error(suite):
    prefix, trig = SUITES[suite]
    v = makefile_vars(suite)
    passes = []
    for f in v["TEST_BAD_FILES"] + v.get("TEST_BAD_EVAL_FILES", []):
        triples, errs = _parse(suite, prefix, f, trig)
        if not errs:
            passes.append(f)
    assert not passes, passes


def _golden(suite_dir: pathlib.Path, name: str, is_nquads=None):
    gold_path = suite_dir / name
    if is_nquads is None:
        is_nquads = name.endswith(".nq")
    gold, gerrs = NT.parse_document(_read(gold_path), is_nquads=is_nquads)
    assert not gerrs, (name, gerrs)
    return gold


def test_turtle_2013_eval():
    prefix, trig = SUITES["turtle-2013"]
    v = makefile_vars("turtle-2013")
    fails = []
    for f in v["TEST_EVAL_FILES"]:
        triples, errs = _parse("turtle-2013", prefix, f, trig)
        if errs:
            fails.append((f, "errors"))
            continue
        gold = _golden(REF_TESTS / "turtle-2013", f[:-4] + ".nt")
        if not graphs_isomorphic(triples, gold):
            fails.append((f, "not isomorphic"))
    assert not fails, fails


def test_trig_2013_eval():
    prefix, trig = SUITES["trig-2013"]
    v = makefile_vars("trig-2013")
    fails = []
    for case in v["TEST_EVAL_CASES"]:
        f, gf = case.split(":")
        triples, errs = _parse("trig-2013", prefix, f, trig)
        if errs:
            fails.append((f, "errors"))
            continue
        gold = _golden(REF_TESTS / "trig-2013", gf)
        if not graphs_isomorphic(triples, gold):
            fails.append((f, "not isomorphic"))
    assert not fails, fails


def test_legacy_turtle_eval_vs_reference_output():
    prefix, trig = SUITES["turtle"]
    v = makefile_vars("turtle")
    fails = []
    for f in v["TEST_FILES"]:
        triples, errs = _parse("turtle", prefix, f, trig)
        if errs:
            fails.append((f, "errors"))
            continue
        gold = _golden(REF_TESTS / "turtle", f.rsplit(".", 1)[0] + ".out")
        if not graphs_isomorphic(triples, gold):
            fails.append((f, "not isomorphic"))
    assert not fails, fails
    bad_passes = []
    for f in v["TEST_BAD_FILES"]:
        triples, errs = _parse("turtle", prefix, f, trig)
        if not errs:
            bad_passes.append(f)
    assert not bad_passes, bad_passes


def test_legacy_trig_eval_vs_reference_output():
    prefix, trig = SUITES["trig"]
    v = makefile_vars("trig")
    fails = []
    for f in v["TEST_FILES"]:
        triples, errs = _parse("trig", prefix, f, trig)
        if errs:
            fails.append((f, "errors"))
            continue
        gold = _golden(
            REF_TESTS / "trig", f.rsplit(".", 1)[0] + ".out", is_nquads=True
        )
        if not graphs_isomorphic(triples, gold):
            fails.append((f, "not isomorphic"))
    assert not fails, fails


def test_whitespace_separated_langtag_and_datatype():
    """LANGTAG and '^^' are separate tokens in the reference
    (turtle_lexer.l:193,512; 'literal: STRING LANGTAG'
    turtle_parser.y:887) — whitespace between the closing quote and the
    tag/caret is accepted; '@prefix'/'@base' there is the directive
    KEYWORD (flex lists those rules first), a syntax error."""
    from raptor_spark.kernel.turtle import parse_document

    t, e = parse_document('<http://a/s> <http://a/p> "x" @en .')
    assert not e and [(x.obj_lex, x.obj_lang) for x in t] == [("x", "en")]
    t, e = parse_document('<http://a/s> <http://a/p> "x" ^^ <http://dt> .')
    assert not e and t[0].obj_datatype == "http://dt"
    # the keyword forms error in both adjacency variants
    for doc in ('<http://a/s> <http://a/p> "x"@prefix .',
                '<http://a/s> <http://a/p> "x" @base .'):
        t, e = parse_document(doc)
        assert e and not t, doc
    # ...but a tag that merely EXTENDS a keyword is a langtag
    t, e = parse_document('<http://a/s> <http://a/p> "x" @prefixx .')
    assert not e and t[0].obj_lang == "prefixx"


def test_errored_statement_emits_no_partial_triples():
    """The reference reduces a statement's triples only at
    dotTriplesList (turtle_parser.y:292-304): a statement that errors
    mid-parse contributes NOTHING, even if its first objects were
    already scanned."""
    from raptor_spark.kernel.turtle import parse_document

    t, e = parse_document('@prefix p: <http://p/> .\np:s p:q p:o1 , @@@ .')
    assert len(e) == 1 and t == []
    # statements BEFORE the bad one are kept
    t, e = parse_document(
        '@prefix p: <http://p/> .\np:a p:q p:b .\np:s p:q p:o1 , @@@ .'
    )
    assert len(e) == 1 and len(t) == 1 and t[0].subj == "http://p/a"


def test_dot_final_prefix_rejected():
    """flex PN_PREFIX cannot end in '.' (turtle_lexer.l:197), so
    'pre.:' is a syntax error in both the @prefix directive and a
    subject qname."""
    from raptor_spark.kernel.turtle import parse_document

    t, e = parse_document(
        '@prefix pre.: <http://p/> .\npre.:x <http://v> <http://o> .'
    )
    assert not t and len(e) == 2
    # interior dots remain legal
    t, e = parse_document(
        '@prefix p: <http://p/> .\np:a.b <http://v> <http://o> .'
    )
    assert not e and t[0].subj == "http://p/a.b"
