"""Turtle 2013 / TriG document parser.

Python re-expression of the reference's Turtle grammar semantics
(dajobe/raptor: src/turtle_parser.y grammar actions, src/turtle_lexer.l
token classes, src/turtle_common.c:79-226 string unescaping,
src/raptor_qname.c:467 qname expansion). Not a port of the flex/bison
machinery — a recursive-descent parser producing the same triples and the
same accept/reject decisions.

Reference-specific choices preserved deliberately:
- PN_CHARS_BASE is byte-lenient: ``[A-Za-z]`` or any non-ASCII char
  (turtle_lexer.l:187), not the W3C range list.
- LANGTAG allows ``_`` separators (turtle_lexer.l:193).
- String escapes allow the reserved-char set ``-_~.!$&'()*+,;=/?#@%``
  beyond ECHAR (turtle_common.c:125-130).
- IRIs allow only ``\\u/\\U`` escapes; ``\\u0020/\\u003C/\\u003E`` and raw
  space are errors (turtle_lexer.l:203, turtle_common.c:98,168).
- Language + datatype on one literal is a parse error
  (turtle_parser.y:899-928).
- ``@prefix``/``@base`` require a terminating DOT; SPARQL-style
  ``PREFIX``/``BASE`` (case-insensitive) forbid it (turtle_parser.y:747-833).
- Anonymous nodes are labeled ``genid{N}``, N monotone per document
  (raptor_general.c:285-320).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from raptor_spark.kernel.terms import (
    KIND_BLANK,
    KIND_LITERAL,
    KIND_URI,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    ParseError,
    Triple,
    make_literal,
)
from raptor_spark.kernel.uri import resolve_uri

_WS = " \t\v\r\n"
_RESERVED_ESCAPES = set("-_~.!$&'()*+,;=/?#@%")
_HEX = set("0123456789abcdefABCDEF")

_WS_RE = re.compile(r"(?:[ \t\v\r\n]|#[^\r\n]*)*")
_WS_OR_HASH = " \t\v\r\n#"
# PN_CHARS|'.' body of a blank node label (_is_pn_chars ∪ {'.'})
_BNODE_BODY_RE = re.compile(r"(?:[A-Za-z0-9_\-.]|[^\x00-\x7F])*")
_IRI_SIMPLE_RE = re.compile(r'<([!#-;=?-\[\]_a-z~\x80-\U0010FFFF]*)>')
# one name-token chunk: PN_CHARS|'.'|':' | %HH | \<reserved>; any char
# > 0x7F counts as PN_CHARS_BASE (matches _is_pn_chars semantics)
_NAME_RE = re.compile(
    r"(?:[A-Za-z0-9_\-.:]|[^\x00-\x7F]|%[0-9A-Fa-f]{2}"
    r"|\\[\-_~.!$&'()*+,;=/?#@%])*"
)

_NUM_RE = re.compile(
    r"""
    [-+]?(?:
        [0-9]+\.[0-9]*[eE][+-]?[0-9]+   # DOUBLE 1.5e0 / 1.e0
      | \.[0-9]+[eE][+-]?[0-9]+         # DOUBLE .5e0
      | [0-9]+[eE][+-]?[0-9]+           # DOUBLE 5e0
      | [0-9]*\.[0-9]+                  # DECIMAL .5 / 1.5
      | [0-9]+                          # INTEGER
    )
    """,
    re.VERBOSE,
)

# ---------------------------------------------------------------------------
# Statement fast path. One precompiled regex recognizes the overwhelmingly
# common statement shape — simple subject, 1-4 ';'-separated (verb, single
# object) pairs, then mandatory whitespace with the statement terminator
# ahead — using only token forms whose semantics a regex group can
# reproduce EXACTLY (the strict-subset rule of CLAUDE.md: a fast path may
# only accept inputs the full grammar accepts with identical output, and
# everything else falls through untouched):
#   - qnames restricted to ASCII letter/digit/_/- with a non-empty prefix
#     and local (no dots, so the dot-give-back rule cannot apply; no
#     %-escapes or \-escapes; local may not start with '-'/'.', enforced
#     by construction);
#   - IRIs restricted to _IRI_SIMPLE_RE's escape-free char class (the
#     same set the scanner's own fast path polices);
#   - blank labels without dots (no give-back) in ASCII;
#   - plain short strings with no escapes/quotes/newlines and no trailing
#     @lang/^^ (the next token must be whitespace, so '@'/'^' kill the
#     match) — unescaping is the identity on this set;
#   - bare [0-9]+ integers (mapped to xsd:integer with the verbatim
#     lexical form, exactly like _NUM_RE's INTEGER arm) with MANDATORY
#     whitespace before the terminator, so '10.' still reaches _NUM_RE's
#     DECIMAL arm and errors like the grammar path does;
#   - inter-token whitespace without comments (a '#' anywhere breaks the
#     match), so self.line advances by exactly the newlines in the span.
# The match ends BEFORE the '.' (lookahead), composing with both callers
# of _triples (top-level statements and TriG graph blocks, which accept
# '.' or '}' themselves). Prefix lookups happen before any mutation —
# an undeclared prefix abandons the match so the grammar path raises the
# identical error. Measured 2-3x on the synthesized corpus profile where
# recursive-descent dispatch, not scanning, dominated (~45us/statement).
_FS_WS = r"[ \t\v\r\n]+"
_FS_Q = r"[A-Za-z][A-Za-z0-9_\-]*:[A-Za-z0-9][A-Za-z0-9_\-]*"
_FS_IRI = r"<[!#-;=?-\[\]_a-z~\x80-\U0010FFFF]*>"
_FS_BN = r"_:[A-Za-z0-9_][A-Za-z0-9_\-]*"
_FS_STR = r'"[^"\\\r\n]*"'
_FS_INT = r"[0-9]+"
_FS_VERB = r"(?:%s|%s|a(?=[ \t\v\r\n]))" % (_FS_Q, _FS_IRI)
_FS_OBJ = "(?:%s)" % "|".join((_FS_Q, _FS_IRI, _FS_BN, _FS_STR, _FS_INT))
_FS_PAIR = "(%s)%s(%s)" % (_FS_VERB, _FS_WS, _FS_OBJ)
_FAST_STMT_RE = re.compile(
    "(%s)%s%s" % ("(?:%s|%s|%s)" % (_FS_Q, _FS_IRI, _FS_BN), _FS_WS, _FS_PAIR)
    + ("(?:%s;%s%s)?" % (_FS_WS, _FS_WS, _FS_PAIR)) * 3
    + r"%s(?=\.)" % _FS_WS
)


def _is_pn_chars_base(c: str) -> bool:
    if not c:
        return False
    return ("A" <= c <= "Z") or ("a" <= c <= "z") or ord(c) > 0x7F


def _is_pn_chars(c: str) -> bool:
    return _is_pn_chars_base(c) or c == "_" or c == "-" or ("0" <= c <= "9")


class TurtleParser:
    """One-document Turtle/TriG parser. Not thread-safe; use per document."""

    def __init__(self, base_uri: Optional[str] = None, trig: bool = False):
        self.base = base_uri
        self.trig = trig
        self.ns: Dict[str, str] = {}
        self.default_ns: Optional[str] = None
        # @prefix declarations in document order (the namespace events a
        # raptor parser hands its serializer); prefix "" = default
        self.namespaces: List[Tuple[str, str]] = []
        self.bnode_counter = 0
        self._pending_n = 0
        self.triples: List[Triple] = []
        self.errors: List[dict] = []
        self.graph: Optional[str] = None
        self.text = ""
        self.pos = 0
        self.line = 1
        self._stmt_mark = 0
        self._fast_miss_pos = -1

    # ----- driver -------------------------------------------------------

    def parse(self, text: str) -> Tuple[List[Triple], List[dict]]:
        self.text = text
        self.pos = 0
        self._fast_miss_pos = -1  # per-document: offsets don't carry over
        n = len(text)
        while True:
            self._skip_ws()
            if self.pos >= n:
                break
            self._stmt_mark = len(self.triples)
            try:
                self._statement()
            except ParseError as e:
                # the reference emits a statement's triples only at the
                # dotTriplesList REDUCTION (turtle_parser.y:292-304), so
                # a statement that errors mid-parse contributes nothing
                # — discard this statement's partial emissions (the
                # mark is re-set per inner statement of a TriG block,
                # whose earlier statements already reduced)
                del self.triples[self._stmt_mark:]
                self.errors.append({"line": self.line, "message": e.message})
                self._recover()
        return self.triples, self.errors

    def _recover(self) -> None:
        """Skip to just past the next top-level '.' (bison 'error DOT')."""
        n = len(self.text)
        while self.pos < n:
            c = self.text[self.pos]
            if c == ".":
                self.pos += 1
                return
            if c == "\n":
                self.line += 1
            if c in "\"'<#":
                # skip over strings/IRIs/comments wholesale so a '.' inside
                # them doesn't end recovery
                try:
                    if c == "<":
                        self._read_iri_raw()
                    elif c == "#":
                        while self.pos < n and self.text[self.pos] not in "\r\n":
                            self.pos += 1
                    else:
                        self._read_string()
                except ParseError:
                    return
                continue
            self.pos += 1

    # ----- low-level scanning -------------------------------------------

    def _skip_ws(self) -> None:
        # hot path — called between every token. Two inline shortcuts
        # (no whitespace at all; exactly one space) cover most call
        # sites; anything else takes the one-regex hop over
        # whitespace+comments (behavior-identical to the per-char loop)
        text = self.text
        pos = self.pos
        c = text[pos : pos + 1]
        if c not in _WS_OR_HASH:  # a single non-ws char ('' tests as "in")
            return
        elif c == " ":
            nxt = text[pos + 1 : pos + 2]
            if nxt and nxt not in _WS_OR_HASH:
                self.pos = pos + 1
                return
        m = _WS_RE.match(text, pos)
        end = m.end()
        if end != pos:
            self.line += text.count("\n", pos, end)
            self.pos = end

    def _peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def _expect(self, ch: str) -> None:
        if self._peek() != ch:
            raise ParseError(
                "syntax error: expected '%s' at %r" % (ch, self._peek()), self.line
            )
        self.pos += 1

    def _genid(self) -> str:
        self.bnode_counter += 1
        return "genid%d" % self.bnode_counter

    # ----- tokens ---------------------------------------------------------

    def _read_iri_raw(self) -> str:
        """Scan '<...>' and return the unescaped, UNresolved body."""
        assert self.text[self.pos] == "<"
        # fast path: escape-free body with no chars the scanner polices
        m = _IRI_SIMPLE_RE.match(self.text, self.pos)
        if m is not None:
            self.pos = m.end()
            return m.group(1)
        self.pos += 1
        n = len(self.text)
        out: List[str] = []
        while True:
            if self.pos >= n:
                raise ParseError("EOF inside <IRI>", self.line)
            c = self.text[self.pos]
            o = ord(c)
            if c == ">":
                self.pos += 1
                break
            if c == "\\":
                e = self.text[self.pos + 1 : self.pos + 2]
                if e not in ("u", "U"):
                    raise ParseError(
                        "Turtle URI error - illegal escape '\\%s'" % e, self.line
                    )
                ulen = 4 if e == "u" else 8
                hexs = self.text[self.pos + 2 : self.pos + 2 + ulen]
                if len(hexs) < ulen or any(h not in _HEX for h in hexs):
                    raise ParseError(
                        "Turtle URI error - illegal hex digit in Unicode escape",
                        self.line,
                    )
                cp = int(hexs, 16)
                if cp in (0x0020, 0x003C, 0x003E):
                    raise ParseError(
                        "Turtle URI error - illegal Unicode escape \\u%04X in URI"
                        % cp,
                        self.line,
                    )
                if cp > 0x10FFFF or cp in (0xFFFE, 0xFFFF):
                    raise ParseError(
                        "illegal Unicode character #x%X" % cp, self.line
                    )
                out.append(chr(cp))
                self.pos += 2 + ulen
                continue
            if o <= 0x20 or c in '<"{}|^`':
                raise ParseError(
                    "syntax error: character %r in IRI" % c, self.line
                )
            out.append(c)
            self.pos += 1
        return "".join(out)

    def _read_iri(self) -> str:
        body = self._read_iri_raw()
        if not body:
            if self.base is None:
                raise ParseError("<> with no base URI", self.line)
            return self.base
        resolved = resolve_uri(self.base, body)
        if not resolved:
            raise ParseError(
                "could not resolve URI '%s' (no base?)" % body, self.line
            )
        return resolved

    def _unescape_string(self, raw: str, allow_newline: bool) -> str:
        """Unescape a string body (reference: turtle_common.c:79-226)."""
        out: List[str] = []
        i = 0
        n = len(raw)
        while i < n:
            c = raw[i]
            if c == "\n":
                self.line += 1
            if c != "\\":
                out.append(c)
                i += 1
                continue
            if i + 1 >= n:
                raise ParseError("\\ at end of string", self.line)
            e = raw[i + 1]
            if e in "nrtbf":
                out.append({"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}[e])
                i += 2
            elif e == "\\" or e == '"' or e == "'" or e in _RESERVED_ESCAPES:
                out.append(e)
                i += 2
            elif e in "uU":
                ulen = 4 if e == "u" else 8
                hexs = raw[i + 2 : i + 2 + ulen]
                if len(hexs) < ulen or any(h not in _HEX for h in hexs):
                    raise ParseError(
                        "Turtle string error - illegal hex digit in Unicode escape",
                        self.line,
                    )
                cp = int(hexs, 16)
                if cp > 0x10FFFF or cp in (0xFFFE, 0xFFFF):
                    raise ParseError(
                        "illegal Unicode character #x%X" % cp, self.line
                    )
                out.append(chr(cp))
                i += 2 + ulen
            else:
                raise ParseError(
                    "Turtle string error - illegal escape \\%s" % e, self.line
                )
        return "".join(out)

    def _read_string(self) -> str:
        """Read a short or long string at a quote char; returns the value."""
        q = self.text[self.pos]
        n = len(self.text)
        if self.text[self.pos : self.pos + 3] == q * 3:
            # long string
            self.pos += 3
            start = self.pos
            while True:
                idx = self.text.find(q * 3, self.pos)
                if idx < 0:
                    raise ParseError(
                        "End of file in middle of %slit%s" % (q * 3, q * 3),
                        self.line,
                    )
                # count preceding backslashes to see if first quote escaped
                bs = 0
                j = idx - 1
                while j >= start and self.text[j] == "\\":
                    bs += 1
                    j -= 1
                if bs % 2 == 0:
                    # the string ends at the FIRST unescaped triple-quote
                    # (flex maximal munch: the 3-char terminator rule beats
                    # the 1-char quote chunk rule) — a 4th quote is a new
                    # token, exactly like the reference lexer
                    raw = self.text[start:idx]
                    self.pos = idx + 3
                    return self._unescape_string(raw, allow_newline=True)
                self.pos = idx + 1
        # short string
        self.pos += 1
        out_start = self.pos
        while True:
            if self.pos >= n:
                raise ParseError("EOF inside string", self.line)
            c = self.text[self.pos]
            if c in "\r\n":
                raise ParseError("newline inside short string", self.line)
            if c == "\\":
                if self.pos + 1 < n and self.text[self.pos + 1] in "\r\n":
                    raise ParseError("escaped newline in short string", self.line)
                self.pos += 2
                continue
            if c == q:
                raw = self.text[out_start : self.pos]
                self.pos += 1
                return self._unescape_string(raw, allow_newline=False)
            self.pos += 1

    def _read_langtag(self) -> str:
        """LANGTAG body after '@' (turtle_lexer.l:193)."""
        n = len(self.text)
        start = self.pos
        while self.pos < n and self.text[self.pos].isascii() and self.text[
            self.pos
        ].isalpha():
            self.pos += 1
        if self.pos == start:
            raise ParseError("missing language tag after @", self.line)
        while self.pos < n and self.text[self.pos] in "-_":
            j = self.pos + 1
            k = j
            while k < n and self.text[k].isascii() and self.text[k].isalnum():
                k += 1
            if k == j:
                break
            self.pos = k
        return self.text[start : self.pos]

    def _scan_name(self) -> str:
        """Scan a qname/keyword word token (QNAME / PN_PREFIX / keyword).

        Returns the raw token text (escapes unexpanded). Grammar:
        turtle_lexer.l:196-200 — dots allowed interior only; ':' allowed in
        and at the end of the local part; PLX = %HH | \\<reserved>.
        """
        start = self.pos
        self.pos = _NAME_RE.match(self.text, self.pos).end()
        tok = self.text[start : self.pos]
        # dots cannot end a name token — give them back
        while tok.endswith(".") and not tok.endswith("\\."):
            tok = tok[:-1]
            self.pos -= 1
        # token-shape checks from the flex QNAME macro: the prefix part must
        # start with PN_CHARS_BASE; the local part may not start with '-'
        # or '.' (turtle_lexer.l:197-198)
        if ":" in tok:
            prefix, local = tok.split(":", 1)
            if prefix and not _is_pn_chars_base(prefix[0]):
                raise ParseError("syntax error at '%s'" % tok, self.line)
            if prefix.endswith("."):
                # flex PN_PREFIX cannot END in '.' (turtle_lexer.l:197:
                # '({PN_CHARS_BASE})(({PN_CHARS}|".")*({PN_CHARS}))*');
                # only the LOCAL part's trailing dots are given back
                # above — a dot-final prefix is a syntax error
                raise ParseError("syntax error at '%s'" % tok, self.line)
            if local[:1] in ("-", "."):
                raise ParseError("syntax error at '%s'" % tok, self.line)
        return tok

    def _expand_qname(self, tok: str) -> str:
        """Expand a QNAME token to a URI (reference: raptor_qname.c:467,
        escape expansion turtle_common.c:246-340)."""
        # expand backslash escapes first, like the reference
        if "\\" not in tok:
            name = tok
        else:
            out: List[str] = []
            i = 0
            n = len(tok)
            while i < n:
                c = tok[i]
                if c == "\\" and i + 1 < n:
                    out.append(tok[i + 1])
                    i += 2
                else:
                    out.append(c)
                    i += 1
            name = "".join(out)

        if name.startswith(":"):
            prefix, local = None, name[1:]
        elif ":" in name:
            prefix, local = name.split(":", 1)
        else:
            raise ParseError("syntax error at '%s'" % name, self.line)

        if prefix is None:
            ns_uri = self.default_ns
        else:
            ns_uri = self.ns.get(prefix)
        if ns_uri is None:
            raise ParseError(
                'The namespace prefix in "%s" was not declared.' % name, self.line
            )
        return ns_uri + local


    # ----- grammar --------------------------------------------------------

    def _statement(self) -> None:
        # statement fast path, hooked BEFORE the directive probes: a
        # _FAST_STMT_RE match is provably a plain triples statement (the
        # subject token requires a ':' inside a safe qname / an IRI / a
        # blank label, so no @-directive, SPARQL PREFIX/BASE/GRAPH word,
        # or TriG graph-name form can match), and the lookahead
        # guarantees the terminating '.' sits at the cursor on success
        m = _FAST_STMT_RE.match(self.text, self.pos)
        if m is not None and self._fast_statement(m):
            self.pos += 1  # the '.' the lookahead guaranteed
            return
        # remember the miss so _triples (reached through the directive
        # fall-through below) doesn't pay the same regex scan twice
        self._fast_miss_pos = self.pos
        c = self._peek()
        if c == "@":
            nxt = self.text[self.pos + 1 : self.pos + 8]
            if nxt.startswith("prefix") and not (
                len(nxt) > 6 and (nxt[6].isalnum() or nxt[6] in "-_")
            ):
                self.pos += 7
                self._prefix_directive(require_dot=True)
                return
            if nxt.startswith("base") and not (
                len(nxt) > 4 and (nxt[4].isalnum() or nxt[4] in "-_")
            ):
                self.pos += 5
                self._base_directive(require_dot=True)
                return
            raise ParseError("syntax error at '@'", self.line)

        if c == "{":
            self._graph_block(None)
            return

        # word-shaped: could be SPARQL PREFIX/BASE, qname subject, or
        # a TriG graph name
        if self._looks_like_sparql_directive("prefix"):
            self._prefix_directive(require_dot=False)
            return
        if self._looks_like_sparql_directive("base"):
            self._base_directive(require_dot=False)
            return

        # TriG graph forms. The reference grammar supports
        # '(iri|qname) ='? { ... }' and bare '{ ... }'
        # (turtle_parser.y:229-285); we additionally support the W3C TriG
        # 'GRAPH label' keyword form and blank-node graph labels, which the
        # reference's own imported W3C suite (trig-kw-graph-*,
        # *_blank_node_graph) expects.
        if self.trig:
            if self._looks_like_sparql_directive("graph"):
                save_pos, save_line = self.pos, self.line
                self.pos += 5
                self._skip_ws()
                name = self._graph_label()
                if name is not None:
                    self._skip_ws()
                    if self._peek() != "{":
                        raise ParseError(
                            "expected '{' after GRAPH label", self.line
                        )
                    self._graph_block(name)
                    return
                self.pos, self.line = save_pos, save_line
            save_pos, save_line = self.pos, self.line
            name = self._try_graph_name()
            if name is not None:
                self._graph_block(name)
                return
            self.pos, self.line = save_pos, save_line

        self._triples()
        self._skip_ws()
        if self._peek() != ".":
            raise ParseError(
                "syntax error: expected '.' at %r" % self._peek(), self.line
            )
        self.pos += 1

    def _looks_like_sparql_directive(self, word: str) -> bool:
        n = len(self.text)
        end = self.pos + len(word)
        if self.text[self.pos : end].lower() != word:
            return False
        if end < n:
            c = self.text[end]
            if _is_pn_chars(c) or c in ".:%\\":
                return False
        return True

    def _prefix_directive(self, require_dot: bool) -> None:
        self.pos += 0 if require_dot else 6
        self._skip_ws()
        # IDENTIFIER: PN_PREFIX? ':'
        tok = self._scan_name()
        if not tok.endswith(":"):
            raise ParseError("expected prefix identifier ending ':'", self.line)
        prefix = tok[:-1]
        self._skip_ws()
        if self._peek() != "<":
            raise ParseError("expected <URI> in @prefix", self.line)
        uri = self._read_iri()
        self._skip_ws()
        if require_dot:
            self._expect(".")
        self.namespaces.append((prefix, uri))
        if prefix == "":
            self.default_ns = uri
        else:
            self.ns[prefix] = uri

    def _base_directive(self, require_dot: bool) -> None:
        if not require_dot:
            self.pos += 4
        self._skip_ws()
        if self._peek() != "<":
            raise ParseError("expected <URI> in @base", self.line)
        uri = self._read_iri()
        self._skip_ws()
        if require_dot:
            self._expect(".")
        self.base = uri

    def _graph_label(self) -> Optional[str]:
        """Scan a graph label: iri | qname | '_:label' | '[]' (anon)."""
        c = self._peek()
        if c == "<":
            return self._read_iri()
        if self.text[self.pos : self.pos + 2] == "_:":
            return "_:" + self._read_bnode_label()
        if c == "[":
            save = self.pos
            self.pos += 1
            self._skip_ws()
            if self._peek() == "]":
                self.pos += 1
                return "_:" + self._genid()
            self.pos = save
            return None
        if _is_pn_chars_base(c) or c == ":":
            tok = self._scan_name()
            if ":" not in tok:
                return None
            return self._expand_qname(tok)
        return None

    def _try_graph_name(self) -> Optional[str]:
        """Try to scan 'label ws* =? ws* {'; None if not a graph head."""
        try:
            name = self._graph_label()
        except ParseError:
            return None
        if name is None:
            return None
        save = self.pos
        self._skip_ws()
        if self._peek() == "=":
            self.pos += 1
            self._skip_ws()
        if self._peek() == "{":
            return name
        self.pos = save
        return None

    def _graph_block(self, name: Optional[str]) -> None:
        if not self.trig:
            raise ParseError("{ ... } is not allowed in Turtle", self.line)
        self._skip_ws()
        self._expect("{")
        self.graph = name
        try:
            while True:
                self._skip_ws()
                if self._peek() == "}":
                    self.pos += 1
                    break
                if self.pos >= len(self.text):
                    raise ParseError("EOF inside { ... }", self.line)
                # per-inner-statement discard granularity (see parse())
                self._stmt_mark = len(self.triples)
                self._triples()
                self._skip_ws()
                if self._peek() == ".":
                    self.pos += 1
                elif self._peek() != "}":
                    raise ParseError(
                        "syntax error: expected '.' or '}' at %r" % self._peek(),
                        self.line,
                    )
        finally:
            self.graph = None

    def _triples(self) -> None:
        if self.pos != self._fast_miss_pos:
            m = _FAST_STMT_RE.match(self.text, self.pos)
            if m is not None and self._fast_statement(m):
                return
        c = self._peek()
        if c == "[":
            # blankNodePropertyList subject; predicateObjectList optional
            subj = self._bnode_property_list()
            self._skip_ws()
            if self._peek() not in ".}" and self.pos < len(self.text):
                self._predicate_object_list(subj)
        else:
            subj = self._subject()
            self._skip_ws()
            self._predicate_object_list(subj)

    def _fast_statement(self, m) -> bool:
        """Decode one _FAST_STMT_RE match; True = triples emitted and the
        cursor advanced, False = nothing touched (grammar path takes
        over — undeclared prefix, unresolvable/empty IRI with no base).
        Flat single-pass decode: no nested closures or intermediate
        tuples — this runs once per statement on the hot path."""
        ns_get = self.ns.get
        base = self.base
        g = m.group
        graph = self.graph

        tok = g(1)
        c0 = tok[0]
        if c0 == "<":
            body = tok[1:-1]
            if body:
                subj = resolve_uri(base, body)
                if not subj:
                    return False
            elif base:
                subj = base
            else:
                return False
        elif c0 == "_":
            subj = tok
        else:
            p, _, local = tok.partition(":")
            nsu = ns_get(p)
            if nsu is None:
                return False
            subj = nsu + local

        out = []
        append = out.append
        for i in (2, 4, 6, 8):
            vtok = g(i)
            if vtok is None:
                break
            if vtok == "a":
                pred = RDF_TYPE
            elif vtok[0] == "<":
                body = vtok[1:-1]
                if body:
                    pred = resolve_uri(base, body)
                    if not pred:
                        return False
                elif base:
                    pred = base
                else:
                    return False
            else:
                p, _, local = vtok.partition(":")
                nsu = ns_get(p)
                if nsu is None:
                    return False
                pred = nsu + local
            otok = g(i + 1)
            c0 = otok[0]
            if c0 == '"':
                append(Triple(subj, pred, KIND_LITERAL, otok[1:-1],
                              None, None, graph))
            elif c0 == "<":
                body = otok[1:-1]
                if body:
                    obj = resolve_uri(base, body)
                    if not obj:
                        return False
                elif base:
                    obj = base
                else:
                    return False
                append(Triple(subj, pred, KIND_URI, obj, None, None, graph))
            elif c0 == "_":
                append(Triple(subj, pred, KIND_BLANK, otok[2:],
                              None, None, graph))
            elif "0" <= c0 <= "9":
                append(Triple(subj, pred, KIND_LITERAL, otok,
                              XSD_INTEGER, None, graph))
            else:
                p, _, local = otok.partition(":")
                nsu = ns_get(p)
                if nsu is None:
                    return False
                append(Triple(subj, pred, KIND_URI, nsu + local,
                              None, None, graph))
        self.triples.extend(out)
        self.line += m[0].count("\n")
        self.pos = m.end()
        return True

    def _subject(self) -> str:
        c = self._peek()
        if not c:
            raise ParseError("unexpected end of input (expected subject)", self.line)
        if c == "<":
            return self._read_iri()
        if c == "(":
            return self._collection()
        if self.text[self.pos : self.pos + 2] == "_:":
            return "_:" + self._read_bnode_label()
        if _is_pn_chars_base(c) or c == ":" or ("0" <= c <= "9") or c == "%":
            tok = self._scan_name()
            if ":" not in tok.replace("\\:", ""):
                raise ParseError("syntax error at '%s'" % (tok or c), self.line)
            return self._expand_qname(tok)
        raise ParseError("syntax error at %r (expected subject)" % c, self.line)

    def _read_bnode_label(self) -> str:
        assert self.text[self.pos : self.pos + 2] == "_:"
        self.pos += 2
        n = len(self.text)
        start = self.pos
        if self.pos < n and (
            _is_pn_chars_base(self.text[self.pos])
            or self.text[self.pos] == "_"
            or "0" <= self.text[self.pos] <= "9"
        ):
            self.pos += 1
        else:
            raise ParseError("bad blank node label", self.line)
        # regex hop over the PN_CHARS|'.' body (same accepted set as the
        # per-char loop)
        self.pos = _BNODE_BODY_RE.match(self.text, self.pos).end()
        label = self.text[start : self.pos]
        while label.endswith("."):
            label = label[:-1]
            self.pos -= 1
        return label

    def _verb(self) -> str:
        c = self._peek()
        if c == "<":
            return self._read_iri()
        if _is_pn_chars_base(c) or c == ":":
            tok = self._scan_name()
            if tok == "a":
                return RDF_TYPE
            if ":" not in tok.replace("\\:", ""):
                raise ParseError("syntax error at '%s'" % tok, self.line)
            return self._expand_qname(tok)
        raise ParseError("syntax error at %r (expected predicate)" % c, self.line)

    def _predicate_object_list(self, subj: str) -> None:
        while True:
            pred = self._verb()
            self._skip_ws()
            self._object_list(subj, pred)
            self._skip_ws()
            if self._peek() != ";":
                return
            while self._peek() == ";":
                self.pos += 1
                self._skip_ws()
            c = self._peek()
            if c in ".]}" or self.pos >= len(self.text):
                return

    def _object_list(self, subj: str, pred: str) -> None:
        while True:
            kind, lex, dt, lang = self._object()
            self._emit(subj, pred, kind, lex, dt, lang)
            self._skip_ws()
            if self._peek() != ",":
                return
            self.pos += 1
            self._skip_ws()

    def _object(self) -> Tuple[int, str, Optional[str], Optional[str]]:
        c = self._peek()
        if not c:
            raise ParseError("unexpected end of input (expected object)", self.line)
        if c == "<":
            return (KIND_URI, self._read_iri(), None, None)
        if c == "(":
            node = self._collection()
            if node.startswith("_:"):
                return (KIND_BLANK, node[2:], None, None)
            return (KIND_URI, node, None, None)
        if c == "[":
            node = self._bnode_property_list()
            return (KIND_BLANK, node[2:], None, None)
        if self.text[self.pos : self.pos + 2] == "_:":
            return (KIND_BLANK, self._read_bnode_label(), None, None)
        if c in "\"'":
            return self._literal()
        if c in "+-.0123456789":
            m = _NUM_RE.match(self.text, self.pos)
            if not m:
                raise ParseError("syntax error at %r" % c, self.line)
            lex = m.group(0)
            self.pos = m.end()
            if "e" in lex or "E" in lex:
                dt = XSD_DOUBLE
            elif "." in lex:
                dt = XSD_DECIMAL
            else:
                dt = XSD_INTEGER
            return (KIND_LITERAL, lex, dt, None)
        if _is_pn_chars_base(c) or c == ":":
            tok = self._scan_name()
            if tok == "true" or tok == "false":
                return (KIND_LITERAL, tok, XSD_BOOLEAN, None)
            if ":" not in tok.replace("\\:", ""):
                raise ParseError("syntax error at '%s'" % (tok or c), self.line)
            return (KIND_URI, self._expand_qname(tok), None, None)
        raise ParseError("syntax error at %r (expected object)" % c, self.line)

    def _literal(self) -> Tuple[int, str, Optional[str], Optional[str]]:
        lex = self._read_string()
        lang: Optional[str] = None
        dt: Optional[str] = None
        # LANGTAG and '^^' are separate TOKENS in the reference
        # (turtle_lexer.l:193,512; grammar 'literal: STRING LANGTAG',
        # turtle_parser.y:887), so whitespace/comments may precede them
        # — byte-adjacency is not required. The flex file lists the
        # "@prefix"/"@base" keyword rules BEFORE {LANGTAG}, so an exact
        # '@prefix'/'@base' (nothing extending the tag) lexes as the
        # keyword and is a syntax error after a literal, never a
        # language tag.
        # speculative skips must restore LINE as well as pos: the
        # statement parser re-skips the same whitespace and would
        # double-count its newlines otherwise (caught by the
        # fast-vs-grammar differential fuzz on error line numbers)
        save, save_line = self.pos, self.line
        self._skip_ws()
        if self._peek() == "@":
            self.pos += 1
            lang = self._read_langtag()
            if lang in ("prefix", "base"):
                raise ParseError(
                    "syntax error at '@%s' (directive keyword after "
                    "literal)" % lang,
                    self.line,
                )
            save, save_line = self.pos, self.line
        else:
            self.pos, self.line = save, save_line
        self._skip_ws()
        if self.text[self.pos : self.pos + 2] != "^^":
            # no datatype: leave the cursor at the end of the literal
            # (post-langtag or post-string) — trailing whitespace
            # belongs to the statement parser
            self.pos, self.line = save, save_line
        if self.text[self.pos : self.pos + 2] == "^^":
            self.pos += 2
            if lang is not None:
                raise ParseError(
                    "Language not allowed with datatyped literal", self.line
                )
            self._skip_ws()
            c = self._peek()
            if c == "<":
                dt = self._read_iri()
            elif _is_pn_chars_base(c) or c == ":":
                tok = self._scan_name()
                if ":" not in tok.replace("\\:", ""):
                    raise ParseError("syntax error at '%s'" % tok, self.line)
                dt = self._expand_qname(tok)
            else:
                raise ParseError("expected datatype URI after ^^", self.line)
        lex, dt, lang = make_literal(lex, dt, lang)
        return (KIND_LITERAL, lex, dt, lang)

    def _bnode_property_list(self) -> str:
        """'[' predicateObjectList? ']' -> '_:genidN'.

        The generated id is allocated when ']' is reached — the
        reference's grammar action runs at reduction
        (turtle_parser.y:1103-1108), so nested property lists number
        inner-first. The inner triples are parsed against a placeholder
        subject and patched once the id exists (the reference defers
        them the same way and attaches the subject afterwards)."""
        self._expect("[")
        self._skip_ws()
        if self._peek() == "]":
            self.pos += 1
            return "_:" + self._genid()
        self._pending_n += 1
        placeholder = "_:\x00pending%d" % self._pending_n
        mark = len(self.triples)
        self._predicate_object_list(placeholder)
        self._skip_ws()
        self._expect("]")
        node = "_:" + self._genid()
        for i in range(mark, len(self.triples)):
            if self.triples[i].subj == placeholder:
                self.triples[i] = self.triples[i]._replace(subj=node)
        return node

    def _collection(self) -> str:
        """'(' object* ')' -> rdf:first/rest chain head or rdf:nil.

        The reference builds the chain tail-first at the ')' reduction
        (turtle_parser.y:1157-1270, generate_bnodeid in the
        i = size-1..0 loop), so the LAST element's node carries the
        smallest generated id — replicated here so labels match the
        reference byte-for-byte wherever they surface.
        """
        self._expect("(")
        items: List[Tuple[int, str, Optional[str], Optional[str]]] = []
        while True:
            self._skip_ws()
            if self._peek() == ")":
                self.pos += 1
                break
            if self.pos >= len(self.text):
                raise ParseError("EOF inside collection", self.line)
            items.append(self._object())
        if not items:
            return RDF_NIL
        nodes = ["_:" + g for g in
                 reversed([self._genid() for _ in items])]
        for k, (kind, lex, dt, lang) in enumerate(items):
            self._emit(nodes[k], RDF_FIRST, kind, lex, dt, lang)
            if k + 1 < len(nodes):
                self._emit(nodes[k], RDF_REST, KIND_BLANK, nodes[k + 1][2:], None, None)
            else:
                self._emit(nodes[k], RDF_REST, KIND_URI, RDF_NIL, None, None)
        return nodes[0]

    def _emit(
        self,
        subj: str,
        pred: str,
        kind: int,
        lex: str,
        dt: Optional[str],
        lang: Optional[str],
    ) -> None:
        self.triples.append(Triple(subj, pred, kind, lex, dt, lang, self.graph))


def parse_document(
    text: str,
    base_uri: Optional[str] = None,
    trig: bool = False,
) -> Tuple[List[Triple], List[dict]]:
    """Parse a Turtle (or TriG) document -> (triples, error records)."""
    return TurtleParser(base_uri=base_uri, trig=trig).parse(text)
