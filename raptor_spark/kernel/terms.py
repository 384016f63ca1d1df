"""RDF term model, canonicalization and canonical N-Triples rendering.

Semantics follow the reference implementation (dajobe/raptor):

- term kinds numbered 1=URI, 2=LITERAL, 4=BLANK
  (reference: src/raptor2.h.in:432-438; value 3 unused for librdf compat).
- literal canonicalization (reference: src/raptor_term.c:150-260):
  * empty language string == no language
  * language lowercased with '_' -> '-'
  * datatype xsd:string dropped (RDF 1.1)
  * language XOR datatype (both set is a construction error)
- N-Triples escape rules (reference: src/raptor_escaped.c:52-154 with the
  flag sets of src/raptor2.h.in:1846-1872):
  * literal: '"' and '\\' backslash-escaped; \\t \\n \\r named escapes;
    other C0 controls and 0x7f -> \\u00XX (uppercase hex); non-ASCII ->
    \\uXXXX / \\UXXXXXXXX (never raw UTF-8)
  * URI: backslash -> '\\\\'; chars <= 0x20 and <>"{}|^` -> \\u00XX;
    other ASCII raw; non-ASCII -> \\u / \\U
  * statement: terms joined by single spaces, terminated ' .\\n'
    (reference: src/raptor_serialize_ntriples.c:194-222)
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

KIND_URI = 1
KIND_LITERAL = 2
KIND_BLANK = 4

XSD_NS = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD_NS + "string"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_BOOLEAN = XSD_NS + "boolean"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_XMLLITERAL = RDF_NS + "XMLLiteral"


class ParseError(Exception):
    """Document-level parse failure with best-effort position info."""

    def __init__(self, message: str, line: int = 0, column: int = 0):
        super().__init__(message)
        self.message = message
        self.line = line
        self.column = column


class Triple(NamedTuple):
    """One statement row.

    ``subj``/``pred``/``graph`` are strings; blank nodes carry the ``_:``
    prefix (URIs are absolute so the encodings cannot collide). ``graph``
    is None for the default graph. Object is split by kind since only the
    object position admits literals.
    """

    subj: str
    pred: str
    obj_kind: int
    obj_lex: str
    obj_datatype: Optional[str]
    obj_lang: Optional[str]
    graph: Optional[str]


def make_literal(
    lex: str, datatype: Optional[str], lang: Optional[str]
) -> tuple[str, Optional[str], Optional[str]]:
    """Canonicalize a literal per the reference term constructor.

    Returns (lex, datatype, lang). Raises ValueError when both datatype and
    a non-empty language are supplied (callers decide whether that is a
    dropped-language warning, as in N-Triples, or a parse error, as in
    Turtle).
    """
    if lang == "":
        lang = None
    if lang is not None and datatype is not None:
        raise ValueError("literal cannot have both datatype and language")
    if datatype == XSD_STRING:
        datatype = None
    if lang is not None:
        lang = lang.lower().replace("_", "-")
    return lex, datatype, lang


def _u_escape(cp: int) -> str:
    if cp < 0x10000:
        return "\\u%04X" % cp
    return "\\U%08X" % cp


# Precomputed 1-char translation tables keep the common all-ASCII path on
# the fast str.translate / single-pass branch.
_LIT_TABLE = {}
for _c in range(0x20):
    _LIT_TABLE[_c] = "\\u%04X" % _c
_LIT_TABLE[0x09] = "\\t"
_LIT_TABLE[0x0A] = "\\n"
_LIT_TABLE[0x0D] = "\\r"
_LIT_TABLE[0x22] = '\\"'
_LIT_TABLE[0x5C] = "\\\\"
_LIT_TABLE[0x7F] = "\\u007F"

_URI_TABLE = {}
for _c in range(0x21):
    _URI_TABLE[_c] = "\\u%04X" % _c
for _s in '<>"{}|^`':
    _URI_TABLE[ord(_s)] = "\\u%04X" % ord(_s)
_URI_TABLE[0x5C] = "\\\\"


# Fast-path guards: one C-level regex scan decides "no escaping needed"
# (the overwhelmingly common case for minted URIs / clean text), else we
# fall back to the full per-character scanner. STRICT SUBSET rule: the
# character classes below are exactly the complement of what the tables
# rewrite, so the fast path can only ever return the input unchanged.
_LIT_NEEDS_ESCAPE = re.compile(r'[^\x20-\x7E]|["\\]')
_URI_NEEDS_ESCAPE = re.compile(r'[^\x21-\x7F]|[<>"{}|^`\\]')


def escape_nt_literal(s: str) -> str:
    """Escape a literal body for N-Triples output (reference rules above)."""
    if _LIT_NEEDS_ESCAPE.search(s) is None:
        return s
    out = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x80:
            t = _LIT_TABLE.get(cp)
            out.append(t if t is not None else ch)
        else:
            out.append(_u_escape(cp))
    return "".join(out)


def escape_nt_uri(s: str) -> str:
    """Escape a URI body for N-Triples output (SPARQL URI escape set)."""
    if _URI_NEEDS_ESCAPE.search(s) is None:
        return s
    out = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x80:
            t = _URI_TABLE.get(cp)
            out.append(t if t is not None else ch)
        else:
            out.append(_u_escape(cp))
    return "".join(out)


def nt_render_term(
    kind: int, lex: str, datatype: Optional[str] = None, lang: Optional[str] = None
) -> str:
    if kind == KIND_URI:
        return "<" + escape_nt_uri(lex) + ">"
    if kind == KIND_BLANK:
        return "_:" + lex
    if kind == KIND_LITERAL:
        body = '"' + escape_nt_literal(lex) + '"'
        if lang:
            body += "@" + lang
        if datatype:
            body += "^^<" + escape_nt_uri(datatype) + ">"
        return body
    raise ValueError("unknown term kind %r" % kind)


def render_subjlike(s: str) -> str:
    """Render a subject/graph-position string (URI or ``_:label``)."""
    if s.startswith("_:"):
        return s
    return "<" + escape_nt_uri(s) + ">"


def nt_render_statement(t: Triple, with_graph: bool = True) -> str:
    """Canonical N-Triples/N-Quads line WITHOUT the trailing newline."""
    parts = [
        render_subjlike(t.subj),
        "<" + escape_nt_uri(t.pred) + ">",
        nt_render_term(t.obj_kind, t.obj_lex, t.obj_datatype, t.obj_lang),
    ]
    if with_graph and t.graph is not None:
        parts.append(render_subjlike(t.graph))
    return " ".join(parts) + " ."


def is_absolute_uri(s: str) -> bool:
    """ASCII URI scheme grammar check (reference: src/raptor_uri.c:2103)."""
    if not s:
        return False
    c = s[0]
    if not (("A" <= c <= "Z") or ("a" <= c <= "z")):
        return False
    i = 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == ":":
            return True
        if not (c.isascii() and (c.isalnum() or c in "+-.")):
            return False
        i += 1
    return False


def check_ordinal(name: str) -> int:
    """rdf:_N ordinal check (reference: src/raptor_general.c:538-564)."""
    if not name:
        return -1
    ordinal = -1
    for c in name:
        if not ("0" <= c <= "9"):
            return -1
        if ordinal < 0:
            ordinal = 0
        ordinal = ordinal * 10 + (ord(c) - 48)
        if ordinal > 2**31 - 1:
            return -1
    return ordinal


def xml_escape_text(s: str) -> str:
    """Minimal XML text escaping shared by every XML-emitting kernel
    (rss/rdfa/atom/serialize) — ONE definition so the writers cannot
    drift."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def xml_escape_attr(s: str) -> str:
    return xml_escape_text(s).replace('"', "&quot;")
