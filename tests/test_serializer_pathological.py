"""Pathological-graph robustness for the buffered writers: a corpus-
scale sink must degrade per-statement on bad input, never hang a task
or abort a whole Arrow batch."""

from raptor_spark.kernel.serialize import (
    to_mkr,
    to_rdfxml,
    to_rdfxml_abbrev,
    to_turtle_exact,
)
from raptor_spark.kernel.terms import (
    KIND_BLANK,
    KIND_LITERAL,
    KIND_URI,
    RDF_FIRST,
    RDF_REST,
    Triple,
)
from raptor_spark.kernel.turtle import parse_document as ttl_parse


def _t(s, p, k, o):
    return Triple(s, p, k, o, None, None, None)


def test_cyclic_collection_terminates():
    """A cyclic rdf:rest chain must not hang the exact/mkr writers'
    collection walk (leaf-only: the non-exact to_turtle already carried
    a seen-set)."""
    cyc = [
        _t("http://e/S", "http://e/p", KIND_BLANK, "b2"),
        _t("_:b2", RDF_FIRST, KIND_LITERAL, "y"),
        _t("_:b2", RDF_REST, KIND_BLANK, "b1"),
        _t("_:b1", RDF_FIRST, KIND_LITERAL, "x"),
        _t("_:b1", RDF_REST, KIND_BLANK, "b2"),
    ]
    assert to_turtle_exact(cyc)  # returns (terminates), content best-effort
    assert to_mkr(cyc)


def test_orphan_bnode_cycles_not_dropped():
    """Blank subjects in a reference cycle where every node has exactly
    one object reference were silently skipped ('inlined at its
    reference point' — but no live reference site exists); they must be
    emitted top-level in named form. The back-reference renders named
    (emit_blank marks the node invalid BEFORE recursing), so emission
    terminates."""
    orb = [
        _t("_:a", "http://e/p", KIND_BLANK, "b"),
        _t("_:b", "http://e/p", KIND_BLANK, "a"),
    ]
    out = to_turtle_exact(orb)
    reparsed, errs = ttl_parse(out)
    assert not errs and len(reparsed) == 2, out
    # self-loop
    sl = [_t("_:a", "http://e/p", KIND_BLANK, "a")]
    reparsed, errs = ttl_parse(to_turtle_exact(sl))
    assert not errs and len(reparsed) == 1
    # mkr: both statements present as 'has' clauses
    assert to_mkr(orb).count(" has") >= 2


def test_unsplittable_predicate_skips_statement():
    """The reference logs 'Cannot split predicate URI ... - skipping
    statement' (raptor_serialize_rdfxml.c:380) and continues; the
    writers must do the same, not abort the document (one bad predicate
    would kill the whole Arrow batch in the distributed sink)."""
    bad = [
        _t("http://e/s", "http://purl.org/dc/elements/1.1/", KIND_URI,
           "http://e/o"),
        _t("http://e/s", "http://e/ns#123", KIND_LITERAL, "v"),
        _t("http://e/s", "http://e/ns#ok", KIND_LITERAL, "kept"),
    ]
    for writer in (to_rdfxml, to_rdfxml_abbrev):
        out = writer(bad)
        assert "kept" in out
        assert "ns#123" not in out


def test_atom_default_namespace_renders_bare():
    """_qname_for with the serializer's default namespace must return
    the bare local name: the atom root element never declares an
    'atom:' prefix, so the prefixed form would be namespace-ill-formed
    XML for any leftover atom-namespace predicate."""
    from raptor_spark.kernel.atom import ATOM10_NS, _NS_URI, _qname_for

    atom_uri = _NS_URI[ATOM10_NS] + "customField"
    assert _qname_for(atom_uri, ATOM10_NS) == "customField"
    # non-default namespaces still render prefixed
    assert ":" in (_qname_for(atom_uri, 0) or "")


def test_mkr_recovered_orphans_use_named_has_grammar():
    """The mkr dangling-recovery block must emit recovered orphan-cycle
    blanks in the writer's own named-blank grammar ('_:x has ... ] ;'),
    not the Turtle writer's bare ' .' terminator it was first copied
    from (round-6 ADVICE fix)."""
    from raptor_spark.kernel.serialize import to_mkr

    orb = [
        _t("_:a", "http://e/p", KIND_BLANK, "b"),
        _t("_:b", "http://e/p", KIND_BLANK, "a"),
    ]
    out = to_mkr(orb)
    assert "_:a has" in out and "] ;" in out, out
    # no Turtle-style ' .' statement terminator anywhere in mkr output
    assert " .\n" not in out, out
