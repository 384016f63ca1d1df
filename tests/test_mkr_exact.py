"""Byte-exact mKR serializer vs the reference's committed goldens.

Mirrors tests/mkr/Makefile.am check-mkr-serialize-syntax: each of the 10
TEST_SERIALIZE_FILES parses as Turtle and must serialize to the
byte-identical committed .mkr output (rapper -q -i turtle -o mkr <file>
<baseuri>, bases per the recipe).

These goldens are also the only observable witness of the reference
turtle parser's bnode-id allocation order (ids are generated at the ']'
/ ')' reductions, turtle_parser.y:1103-1270, so nested property lists
number inner-first and collection chains tail-first) — rdfq-results.mkr
sorts its rs:solution bnodes by generated label, which fixes the CSV
row order.
"""

import os

import pytest

from raptor_spark.kernel import turtle as TTL
from raptor_spark.kernel.serialize import to_mkr

MKR = "/root/reference/tests/mkr"
BASE = "http://www.w3.org/2001/sw/DataAccess/df1/tests/"

# bases from check-mkr-serialize-syntax (tests/mkr/Makefile.am:77-85)
SPECIAL_BASES = {
    "rdf-schema": "http://www.w3.org/1999/02/22-rdf-syntax-ns",
    "rdfs-namespace": "http://www.w3.org/2000/01/rdf-schema",
}

GOLDENS = sorted(
    f[:-4] for f in os.listdir(MKR) if f.endswith(".mkr")
)


def test_suite_is_complete():
    assert len(GOLDENS) == 10


@pytest.mark.parametrize("name", GOLDENS)
def test_mkr_serialize_syntax_golden(name):
    base = SPECIAL_BASES.get(name, BASE + name + ".ttl")
    parser = TTL.TurtleParser(base_uri=base)
    src = open(os.path.join(MKR, name + ".ttl"), newline="").read()
    triples, errs = parser.parse(src)
    assert not errs, (name, errs)
    got = to_mkr(triples, parser.namespaces, base_uri=base)
    want = open(os.path.join(MKR, name + ".mkr"), newline="").read()
    assert got == want, name
