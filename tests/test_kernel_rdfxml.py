"""RDF/XML kernel conformance vs the reference's committed suite.

Drives the same automake lists the reference uses
(tests/rdfxml/Makefile.am: check-rdf / check-bad-rdf / check-bad-nfc-rdf /
check-warn-rdf / check-assume-rdf / check-scan-rdf): good files must parse
with no errors (warnings allowed, rapper exit 0/2) and structurally match
their .out N-Triples goldens; bad files must produce >=1 error.
"""

import pathlib

import pytest

from raptor_spark.kernel import ntriples as NT
from raptor_spark.kernel import rdfxml as RX
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.suites import REF_TESTS, makefile_vars

SUITE = REF_TESTS / "rdfxml"
BASE_URI = "http://librdf.org/raptor/tests/"

# Formerly expat-rejected documents (leading-colon attribute; duplicate
# attribute through two prefixes of one namespace; empty local names),
# now handled by the kernel's tolerant rewrite pre-pass
# (kernel/rdfxml.py _tolerant_rewrite) — kept listed so a regression in
# that path names the affected files.
XFAIL_EXPAT: set = set()

_SPECIAL_BASE = {
    "22-rdf-syntax-ns": "http://www.w3.org/1999/02/22-rdf-syntax-ns",
    "rdfs-namespace": "http://www.w3.org/2000/01/rdf-schema",
    "rdf-schema": "http://www.w3.org/2000/01/rdf-schema",
    "owl-schema": "http://www.w3.org/2002/07/owl",
    "daml-oil": "http://www.daml.org/2001/03/daml+oil",
    "wine": "http://www.w3.org/TR/owl-guide/wine.rdf",
}


def _base_uri(fname: str) -> str:
    name = fname.rsplit(".", 1)[0]
    # the reference's check-scan-rdf uses $name.rdf even for .svg inputs
    if not fname.endswith(".rdf"):
        fname = name + ".rdf"
    return _SPECIAL_BASE.get(name, BASE_URI + fname)


def _read_bytes(fname: str) -> bytes:
    return (SUITE / fname).read_bytes()


def _golden(fname: str):
    name = fname.rsplit(".", 1)[0]
    with open(SUITE / (name + ".out"), encoding="utf-8", newline="") as fh:
        gold, gerrs = NT.parse_document(fh.read())
    assert not gerrs, (fname, gerrs)
    return gold


def _run_good(files, scan=False):
    fails = []
    for f in files:
        if f in XFAIL_EXPAT:
            continue
        triples, errs, _warns = RX.parse_document_full(
            _read_bytes(f), base_uri=_base_uri(f), scan=scan
        )
        if errs:
            fails.append((f, errs[0]["message"]))
            continue
        if not graphs_isomorphic(triples, _golden(f)):
            fails.append((f, "not isomorphic (%d triples)" % len(triples)))
    return fails


def test_rdfxml_good():
    v = makefile_vars("rdfxml")
    assert len(v["RDF_TEST_FILES"]) >= 59
    fails = _run_good(v["RDF_TEST_FILES"])
    assert not fails, fails


def test_rdfxml_warn():
    """warn-* and bagID files: warnings expected, zero errors, golden match."""
    v = makefile_vars("rdfxml")
    files = [f for f in v["RDF_WARN_TEST_FILES"] if not f.startswith("$")]
    files += v["RDF_BAGID_TEST_FILES"]
    fails = _run_good(files)
    assert not fails, fails


def test_rdfxml_assume():
    """Document element other than rdf:RDF taken as a node element
    (reference: check-assume-rdf)."""
    v = makefile_vars("rdfxml")
    fails = _run_good(v["RDF_ASSUME_TEST_FILES"])
    assert not fails, fails


def test_rdfxml_scan():
    """rdf:RDF embedded in foreign XML, found by scanning
    (reference: check-scan-rdf with rapper -s)."""
    v = makefile_vars("rdfxml")
    fails = _run_good(v["RDF_SCAN_TEST_FILES"], scan=True)
    assert not fails, fails


def test_tolerant_rewrite_scope():
    """The rewrite pre-pass must only repair the three known constructs:
    anything else expat rejected stays rejected (accepted/rejected sets
    unchanged)."""
    from raptor_spark.kernel.rdfxml import _tolerant_rewrite

    # unbound prefix: XML-1.0-well-formed, nothing to fix -> None, and
    # the namespace reparse would still fail; error preserved
    assert _tolerant_rewrite(b'<a:doc xmlns:b="http://x/"/>') is None
    # not well-formed at the XML 1.0 level -> None
    assert _tolerant_rewrite(b"<doc><open></doc>") is None
    # DOCTYPE -> bail (pre-pass will not re-serialize entity machinery)
    assert (
        _tolerant_rewrite(
            b'<!DOCTYPE doc [<!ENTITY e "v">]><doc a=":x"/>'
        )
        is None
    )
    # nothing wrong -> None (never rewrites documents it can't improve)
    assert _tolerant_rewrite(b'<doc xmlns="http://x/" p="v">t</doc>') is None
    # the fixable constructs do rewrite
    out = _tolerant_rewrite(b'<doc xmlns="http://x/" :p="v"/>')
    assert out is not None and "rsp.emptyP.p" in out
    out = _tolerant_rewrite(b"<doc><ns: xmlns:ns='http://x/'/></doc>")
    assert out is not None and "ns:rsp.emptyL" in out

    # sentinel collision: a document that ALREADY contains the sentinel
    # strings must not be rewritten (an unrelated repair would later
    # mis-resolve the literal attribute as an empty-prefix one)
    assert (
        _tolerant_rewrite(b'<doc xmlns="http://x/" rsp.emptyP.x="v" :p="w"/>')
        is None
    )
    assert (
        _tolerant_rewrite(b"<doc rsp.emptyL='v'><ns: xmlns:ns='http://x/'/></doc>")
        is None
    )
    # an ill-formed "xmlns:" attribute must bail, not become a live
    # namespace declaration for the sentinel prefix
    assert _tolerant_rewrite(b'<doc xmlns:="http://x/" :p="v"/>') is None

    # ...but a sentinel merely MENTIONED in text content or a comment is
    # no collision (only real Names can be mis-resolved downstream):
    # such a document stays repairable
    out = _tolerant_rewrite(
        b'<doc xmlns="http://x/" :p="v"><!-- rsp.emptyP. -->'
        b"see rsp.emptyL in the docs</doc>"
    )
    assert out is not None and "rsp.emptyP.p" in out

    # a repaired-but-still-invalid document still errors through the
    # full parser (empty-prefix attr with NO default namespace in scope)
    triples, errs = RX.parse_document(
        b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        b'<rdf:Description rdf:about="http://e/x" :p="v"/></rdf:RDF>',
        base_uri="http://e/",
    )
    assert errs, "empty prefix without a default namespace must error"


def test_rdfxml_bad():
    v = makefile_vars("rdfxml")
    passes = []
    for f in v["RDF_BAD_TEST_FILES"] + v["RDF_BAD_NFC_TEST_FILES"]:
        triples, errs = RX.parse_document(_read_bytes(f), base_uri=_base_uri(f))
        if not errs:
            passes.append(f)
    assert not passes, passes


def test_non_utf8_document_roundtrips_through_string_transport():
    """A document in a non-UTF-8 encoding declared by its XML decl must
    survive the fixture-loader transport (bytes -> str via
    surrogateescape -> parse): the kernel re-encodes with
    surrogateescape FIRST, reconstructing the ORIGINAL bytes so expat
    can honor the declared encoding (the previous surrogatepass
    re-encode mangled 0x80-0xFF into invalid UTF-8 and rejected the
    document)."""
    from raptor_spark.kernel import rdfxml

    raw = (
        '<?xml version="1.0" encoding="ISO-8859-1"?>'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        '<rdf:Description rdf:about="http://e/x" rdf:value="caf\xe9"/>'
        "</rdf:RDF>"
    ).encode("latin-1")
    text = raw.decode("utf-8", "surrogateescape")
    triples, errs = rdfxml.parse_document(text)
    assert not errs
    assert [t.obj_lex for t in triples] == ["café"]
    # lone HIGH surrogates (fuzz inputs) still take the surrogatepass
    # fallback and yield an error record, not a crash
    _t2, errs2 = rdfxml.parse_document("<a>\ud800</a>")
    assert errs2
