"""N-Triples/N-Quads kernel conformance vs the reference's own fixtures.

Fixture layout per /root/reference/tests/ntriples/Makefile.am (legacy suite
with committed .out goldens) and the W3C 2013 suites in
tests/{ntriples,nquads}-2013 (good must parse clean, *-bad-* must error).
"""

import pathlib

import pytest

from raptor_spark.kernel.ntriples import parse_document
from raptor_spark.kernel.terms import nt_render_statement

REF = pathlib.Path("/root/reference/tests")

LEGACY_GOOD = [
    "test.nt",
    "nt2013-ex1.nt",
    "nt2013-ex2.nt",
    "nt2013-ex3.nt",
    "nt2013-ex4.nt",
    "bug-562.nt",
    "bug-574.nt",
    "bug-577.nt",
    "issue77.nt",
    "testnq-1.nq",
    "testnq-optional-context.nq",
    "bug-481.nq",
]

LEGACY_BAD = ["bad-%02d.nt" % i for i in (0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)]


def _read(p: pathlib.Path) -> str:
    return p.read_text(encoding="utf-8", errors="surrogateescape")


@pytest.mark.parametrize("name", LEGACY_GOOD)
def test_legacy_golden_bytes(name):
    p = REF / "ntriples" / name
    triples, errs = parse_document(_read(p), is_nquads=name.endswith(".nq"))
    assert not errs, errs
    out = "".join(nt_render_statement(t) + "\n" for t in triples)
    golden = _read(p.with_suffix(".out"))
    assert out == golden


@pytest.mark.parametrize("name", LEGACY_BAD)
def test_legacy_bad_must_fail(name):
    triples, errs = parse_document(_read(REF / "ntriples" / name))
    assert errs


def _suite_files(suite: str, ext: str):
    return sorted(p.name for p in (REF / suite).iterdir() if p.suffix == ext)


@pytest.mark.parametrize(
    "suite,ext,is_nq",
    [("ntriples-2013", ".nt", False), ("nquads-2013", ".nq", True)],
)
def test_w3c_2013_suites(suite, ext, is_nq):
    good_fail = []
    bad_pass = []
    for name in _suite_files(suite, ext):
        text = _read(REF / suite / name)
        triples, errs = parse_document(text, is_nquads=is_nq)
        if "-bad-" in name:
            if not errs:
                bad_pass.append(name)
        else:
            if errs:
                good_fail.append((name, errs[0]))
    assert not good_fail, good_fail
    assert not bad_pass, bad_pass
