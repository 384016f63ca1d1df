"""Property-based round-trip fuzzing of the serializer kernels.

For arbitrary well-formed statement sets (random URIs incl. non-ASCII,
blank nodes with awkward labels, literals with control characters,
language tags, datatypes), every writer's output must reparse cleanly and
yield a structurally equal graph — the generalization of the reference's
serialize-then-rdfdiff harness beyond its committed fixtures.
"""

from hypothesis import given, settings

from fuzzbudget import budget
from hypothesis import strategies as st

from raptor_spark.kernel import ntriples as NT
from raptor_spark.kernel import rdfjson as RJ
from raptor_spark.kernel import rdfxml as RX
from raptor_spark.kernel import serialize as S
from raptor_spark.kernel import turtle as T
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.terms import KIND_BLANK, KIND_LITERAL, KIND_URI, Triple

from raptor_spark.kernel.uri import resolve_uri

_uri = st.builds(
    lambda path, frag: "http://example.org/" + path + ("#" + frag if frag else ""),
    st.text(
        alphabet="abcdefgXYZ0129~!$&'()*+,;=:@%-._/é中", max_size=12
    ),
    st.text(alphabet="abcdef-._09", max_size=5),
).map(
    # parsers normalize dot segments on read (RFC3986, reference:
    # raptor_rfc2396.c), so the input domain is normalized URIs
    lambda u: resolve_uri(None, u)
)
_bnode_label = st.text(
    alphabet="abcXYZ0129_z.é", min_size=1, max_size=10
).filter(lambda s: not s.startswith(".") and not s.endswith("."))
_lex = st.text(max_size=24)
_lang = st.sampled_from([None, "en", "en-us", "DE"])
_dt = st.sampled_from(
    [
        None,
        "http://www.w3.org/2001/XMLSchema#integer",
        "http://www.w3.org/2001/XMLSchema#token",
    ]
)


@st.composite
def triples(draw):
    n = draw(st.integers(1, 8))
    out = []
    for _ in range(n):
        subj = draw(st.one_of(_uri, st.builds(lambda x: "_:" + x, _bnode_label)))
        pred = draw(_uri)
        kind = draw(st.sampled_from([KIND_URI, KIND_BLANK, KIND_LITERAL]))
        if kind == KIND_URI:
            obj = (KIND_URI, draw(_uri), None, None)
        elif kind == KIND_BLANK:
            obj = (KIND_BLANK, draw(_bnode_label), None, None)
        else:
            dt = draw(_dt)
            lang = None if dt else draw(_lang)
            lang = lang.lower() if lang else None
            obj = (KIND_LITERAL, draw(_lex), dt, lang)
        out.append(Triple(subj, pred, obj[0], obj[1], obj[2], obj[3], None))
    return out


def _rt(ts, write, parse):
    out = write(ts)
    back, errs = parse(out)
    assert not errs, (errs[:1], out[:400])
    a = list(dict.fromkeys(ts))
    b = list(dict.fromkeys(back))
    assert graphs_isomorphic(a, b), out[:400]


@settings(max_examples=budget(60), deadline=None)
@given(triples())
def test_ntriples_roundtrip_property(ts):
    _rt(ts, S.to_ntriples, lambda o: NT.parse_document(o))


@settings(max_examples=budget(60), deadline=None)
@given(triples())
def test_turtle_roundtrip_property(ts):
    _rt(
        ts,
        S.to_turtle,
        lambda o: T.parse_document(o, base_uri="http://rt/", trig=False),
    )


@settings(max_examples=budget(40), deadline=None)
@given(triples())
def test_json_roundtrip_property(ts):
    _rt(ts, S.to_json, RJ.parse_document)


def _xml_safe(ts):
    # RDF/XML cannot carry control chars in text, non-NCName bnode ids,
    # or predicates without an XML-name local part
    import re

    ok = []
    for t in ts:
        try:
            S.split_predicate(t.pred)
        except ValueError:
            continue
        if t.obj_kind == KIND_LITERAL and any(ord(c) < 0x20 for c in t.obj_lex):
            continue
        labels = [x for x in (t.subj[2:] if t.subj.startswith("_:") else None,
                              t.obj_lex if t.obj_kind == KIND_BLANK else None)
                  if x is not None]
        if any(not re.match(r"^[A-Za-z_][\w.\-]*$", l) for l in labels):
            continue
        ok.append(t)
    return ok


@settings(max_examples=budget(40), deadline=None)
@given(triples())
def test_rdfxml_roundtrip_property(ts):
    ts = _xml_safe(ts)
    if not ts:
        return
    for write in (S.to_rdfxml, S.to_rdfxml_abbrev):
        _rt(ts, write, lambda o: RX.parse_document(o, base_uri="http://rt/"))
