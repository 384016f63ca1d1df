"""RDF/XML parser kernel (pure Python, expat-backed).

Re-expresses the reference's RDF/XML grammar state machine
(dajobe/raptor: src/raptor_rdfxml.c:1569 start_element_grammar,
:2410 end_element_grammar, :2960 cdata_grammar) on top of
``xml.parsers.expat``. The semantics covered, with reference citations:

- node elements: rdf:about / rdf:ID / rdf:nodeID subject resolution
  (src/raptor_rdfxml.c:1748-1823), rdf:ID -> base#id URI
  (src/raptor_uri.c:502), duplicate-ID detection via a per-base id set
  (src/raptor_rdfxml.c:3136-3155, src/raptor_set.c:164), typed nodes ->
  rdf:type triple, property attributes (:1379) with in-scope xml:lang;
- property elements: rdf:li -> rdf:_N per-parent ordinals (:2503-2504),
  rdf:resource / rdf:nodeID objects, rdf:datatype, inline property
  attributes -> blank-node object, reification of rdf:ID statements ->
  +4 triples (:1308-1329), rdf:bagID membership bags (:1253-1300);
- parseType Literal (and unknown parseTypes, warned, taken as Literal) ->
  rdf:XMLLiteral with the reference xml-writer serialization
  (src/raptor_xml_writer.c: namespaces declared where first needed,
  attributes emitted sorted, no self-closing tags, &amp;/&lt;/&gt; text
  escapes); parseType Resource -> blank node property scope; parseType
  Collection -> rdf:first/rest/nil chain built like
  src/raptor_rdfxml.c's collection handling (tail wired at end-element);
  legacy parseType daml:collection -> daml first/rest/nil/List;
- xml:base / xml:lang scoping along the element stack (:3107,
  src/raptor_sax2.c:325-349), xml:base fragment stripping
  (raptor_new_uri_for_xmlbase);
- rdf namespace-URI misuse diagnostics (bad/warn split as in
  raptor_rdfxml.c's is_rdf_namespace checks): a declared namespace URI
  extending the RDF namespace is an error, a truncation of it a warning;
- NFC validation of literal/attribute content
  (src/raptor_unicode.c:782-815) -> parse error on non-NFC text.

Unsupported relative to the reference, by backend choice (expat rejects
the documents before RDF processing starts — the reference has the same
class of list for libxml2, RDF_MAYFAIL_XML_TEST_FILES in
tests/rdfxml/Makefile.am): leading-colon attribute names (ex-64.rdf) and
duplicate attributes via two prefixes of one namespace (ex-65.rdf).
"""

from __future__ import annotations

import re
import unicodedata
import xml.parsers.expat
from typing import Dict, List, Optional, Tuple

from raptor_spark.kernel.terms import (
    KIND_BLANK,
    KIND_LITERAL,
    KIND_URI,
    RDF_NS,
    Triple,
    make_literal,
)
from raptor_spark.kernel.uri import resolve_uri

XML_NS = "http://www.w3.org/XML/1998/namespace"
RDF_XMLLITERAL = RDF_NS + "XMLLiteral"
DAML_NS = "http://www.daml.org/2001/03/daml+oil#"

# rdf-namespace attribute vocabulary (reference: rdf_attr_info table in
# src/raptor_rdfxml.c). The unprefixed forms are accepted with a warning.
_RDF_SYNTAX_ATTRS = {
    "about",
    "aboutEach",
    "aboutEachPrefix",
    "bagID",
    "datatype",
    "ID",
    "nodeID",
    "parseType",
    "resource",
    "type",
}
# rdf:X names that are errors as property attributes
_FORBIDDEN_PROP_ATTRS = {"Description", "RDF", "li", "aboutEach", "aboutEachPrefix"}
# rdf:X names that are errors as node elements
_FORBIDDEN_NODE_ELEMENTS = {
    "RDF",
    "ID",
    "about",
    "bagID",
    "parseType",
    "resource",
    "nodeID",
    "li",
    "aboutEach",
    "aboutEachPrefix",
}
# rdf:X names that are errors as property elements
_FORBIDDEN_PROP_ELEMENTS = {
    "Description",
    "RDF",
    "ID",
    "about",
    "bagID",
    "parseType",
    "resource",
    "nodeID",
    "aboutEach",
    "aboutEachPrefix",
}
# node-element rdf:X names known to the vocabulary (anything else warns)
_KNOWN_RDF_NAMES = {
    "Description",
    "Seq",
    "Bag",
    "Alt",
    "Statement",
    "Property",
    "List",
    "XMLLiteral",
    "nil",
    "subject",
    "predicate",
    "object",
    "type",
    "value",
    "first",
    "rest",
    "li",
} | {"_%d" % i for i in range(1, 10)}

_NCNAME_RE = re.compile(r"^[^\W\d][\w.\-·]*$", re.UNICODE)


class _Abort(Exception):
    """Stop the expat feed after a fatal grammar error."""


class _RewriteBail(Exception):
    """Tolerant pre-pass hit a construct it won't re-serialize (DOCTYPE,
    entity declarations) — fall back to the original expat error."""


#: sentinels the tolerant pre-pass writes for names expat's namespace
#: processor rejects; both are valid NCNames that cannot collide with
#: real content (the pre-pass only runs on documents expat already
#: rejected). `rsp.emptyP.x` = attribute ":x" (empty prefix -> default
#: namespace, reference: raptor_namespaces_find_namespace(nstack, "", 0)
#: via ex-64.rdf); local name `rsp.emptyL` = empty local part ("ns:",
#: bug-650.rdf), mapped back when rendering XML literals.
_EMPTY_PREFIX = "rsp.emptyP."
_EMPTY_LOCAL = "rsp.emptyL"


def _tolerant_rewrite(data) -> Optional[str]:
    """Re-serialize a namespace-ill-formed document into a form expat's
    namespace processor accepts, preserving the reference's tolerant
    semantics for the three constructs it parses but expat rejects
    (tests/rdfxml ex-64/ex-65/bug-650; the reference documents the
    mirror-image backend gap as RDF_MAYFAIL_XML_TEST_FILES in
    tests/rdfxml/Makefile.am):

    - attribute ":x" (empty prefix) -> `rsp.emptyP.x`, resolved against
      the in-scope default namespace by _classify_attrs;
    - duplicate attributes through two prefixes of one namespace URI:
      the LATER occurrence wins (the reference frees the first value,
      src/raptor_rdfxml.c rdf_attr handling);
    - empty local names ("ns:", "rdf:") -> `prefix:rsp.emptyL`, mapped
      back when XML literals are rendered; an element ":x" becomes "x"
      (both mean the default namespace in namespace-XML).

    Walks the document with a NON-namespace expat parser (XML 1.0 allows
    ':' anywhere in a Name, so these documents are well-formed without
    namespace processing) and re-serializes events. Returns None when
    nothing needed fixing (so previously-rejected documents keep their
    original errors) or when the document is not XML-1.0-well-formed.

    Also bails when an actual element/attribute Name observed during
    the walk already CONTAINS a sentinel string (a real attribute named
    ``rsp.emptyP.x`` would otherwise be mis-resolved as an empty-prefix
    attribute after an unrelated rewrite) — names only, so a document
    that merely MENTIONS the sentinels in text content or a comment is
    still repairable — and on an ill-formed ``xmlns:`` attribute
    (renaming it would silently turn it into a live namespace
    declaration for the sentinel prefix — the reference rejects such
    documents)."""
    p = xml.parsers.expat.ParserCreate()
    p.ordered_attributes = True
    out: List[str] = []
    fixed = [False]
    scopes: List[dict] = [{}]

    def check_name(name: str) -> str:
        # sentinel collision in a REAL Name (element or attribute):
        # the rewrite's output could not be disambiguated downstream
        if _EMPTY_PREFIX in name or _EMPTY_LOCAL in name:
            raise _RewriteBail()
        return name

    def fix_attr_name(name: str) -> str:
        check_name(name)
        if name.startswith(":"):
            fixed[0] = True
            return _EMPTY_PREFIX + name[1:]
        if name.endswith(":"):
            if name == "xmlns:":
                # renaming would mint a live declaration for the
                # sentinel prefix; reject like DOCTYPE
                raise _RewriteBail()
            fixed[0] = True
            return name + _EMPTY_LOCAL
        return name

    def fix_elem_name(name: str) -> str:
        check_name(name)
        if name.startswith(":"):
            fixed[0] = True
            return name[1:]
        if name.endswith(":"):
            fixed[0] = True
            return name + _EMPTY_LOCAL
        return name

    def start(name, attrs):
        scope = dict(scopes[-1])
        pairs = [(attrs[i], attrs[i + 1]) for i in range(0, len(attrs), 2)]
        for k, v in pairs:
            if k == "xmlns":
                scope[""] = v
            elif k.startswith("xmlns:"):
                scope[k[6:]] = v
        scopes.append(scope)

        def key(k: str):
            if k == "xmlns" or k.startswith("xmlns:"):
                return ("xmlns", k)
            if ":" in k and not k.startswith(":") and not k.endswith(":"):
                pfx, loc = k.split(":", 1)
                uri = scope.get(pfx)
                if uri:
                    return ("ns", uri, loc)
            return ("q", k)

        deduped: List[Tuple[str, str]] = []
        seen: dict = {}
        for k, v in pairs:
            kk = key(k)
            if kk in seen:
                # later occurrence wins; drop the earlier one in place
                deduped[seen[kk]] = None
                fixed[0] = True
            seen[kk] = len(deduped)
            deduped.append((k, v))
        parts = ["<", fix_elem_name(name)]
        for kv in deduped:
            if kv is None:
                continue
            k, v = kv
            parts.append(' %s="%s"' % (fix_attr_name(k), _xml_escape_attr(v)))
        parts.append(">")
        out.append("".join(parts))

    def end(name):
        scopes.pop()
        out.append("</%s>" % fix_elem_name(name))

    def bail(*_a, **_kw):
        raise _RewriteBail()

    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = lambda s: out.append(_xml_escape_text(s))
    p.CommentHandler = lambda s: out.append("<!--%s-->" % s)
    p.ProcessingInstructionHandler = (
        lambda t, d: out.append("<?%s %s?>" % (t, d))
    )
    p.StartDoctypeDeclHandler = bail
    p.EntityDeclHandler = bail
    try:
        p.Parse(data, True)
    except (xml.parsers.expat.ExpatError, _RewriteBail):
        return None
    return "".join(out) if fixed[0] else None


class _Frame:
    """One element-stack entry (reference: raptor_rdfxml_element)."""

    __slots__ = (
        "kind",
        "base",
        "lang",
        "subject",
        "subject_kind",
        "li_counter",
        "bag_uri",
        "bag_counter",
        "pred",
        "reify_id",
        "datatype",
        "parse_type",
        "text",
        "has_child_node",
        "object",
        "object_kind",
        "prop_attrs",
        "collection",
        "daml",
        "seen_text_error",
    )

    def __init__(self, kind: str, base: Optional[str], lang: Optional[str]):
        self.kind = kind
        self.base = base
        self.lang = lang
        self.subject = None
        self.subject_kind = KIND_URI
        self.li_counter = 0
        self.bag_uri = None
        self.bag_counter = 0
        self.pred = None
        self.reify_id = None
        self.datatype = None
        self.parse_type = None
        self.text = []
        self.has_child_node = False
        self.object = None
        self.object_kind = KIND_URI
        self.prop_attrs = []
        self.collection = []
        self.daml = False
        self.seen_text_error = False


def _nfc_ok(s: str) -> bool:
    if s.isascii():
        return True
    return unicodedata.is_normalized("NFC", s)


def _xml_escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _xml_escape_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace('"', "&quot;")
        .replace("\t", "&#x9;")
        .replace("\n", "&#xA;")
        .replace("\r", "&#xD;")
    )


class _Parser:
    def __init__(self, base_uri: Optional[str], scan: bool = False):
        self.triples: List[Triple] = []
        self.errors: List[dict] = []
        self.warnings: List[dict] = []
        # xmlns declarations in document order (the namespace events a
        # raptor parser hands its serializer); prefix "" = default
        self.namespaces: List[tuple] = []
        self.base = base_uri
        self.scan = scan
        self._genid = 0
        self._ids: set = set()
        self._stack: List[_Frame] = []
        self._pending_ns: List[Tuple[Optional[str], Optional[str]]] = []
        self._ns_in_scope: List[List[Tuple[Optional[str], str]]] = []
        self._seen_root = False
        self._ignore_depth = 0
        # XML-literal collection state
        self._lit_frame: Optional[_Frame] = None
        self._lit_depth = 0
        self._lit_parts: List[str] = []
        self._lit_ns_stack: List[set] = []
        # in-scope default-namespace URIs (needed to resolve the
        # empty-prefix attribute sentinel the tolerant pre-pass writes)
        self._default_ns: List[Optional[str]] = []
        self.p = xml.parsers.expat.ParserCreate(namespace_separator=" ")
        self.p.namespace_prefixes = True
        self.p.StartElementHandler = self._start
        self.p.EndElementHandler = self._end
        self.p.CharacterDataHandler = self._cdata
        self.p.StartNamespaceDeclHandler = self._ns_decl
        self.p.EndNamespaceDeclHandler = self._ns_end
        self.p.CommentHandler = self._comment
        self.p.ProcessingInstructionHandler = self._pi

    # -- diagnostics -------------------------------------------------------
    def _error(self, msg: str):
        self.errors.append({"line": self.p.CurrentLineNumber, "message": msg})
        raise _Abort()

    def _warn(self, msg: str):
        self.warnings.append({"line": self.p.CurrentLineNumber, "message": msg})

    def _bnode(self) -> str:
        self._genid += 1
        return "genid%d" % self._genid

    # -- names -------------------------------------------------------------
    @staticmethod
    def _split(name: str) -> Tuple[Optional[str], str, Optional[str]]:
        """expat 'uri local prefix' -> (uri, local, prefix)."""
        parts = name.split(" ")
        if len(parts) == 3:
            return parts[0], parts[1], parts[2]
        if len(parts) == 2:
            return parts[0], parts[1], None
        return None, parts[0], None

    def _ns_decl(self, prefix, uri):
        self._pending_ns.append((prefix, uri))
        if prefix is None:
            self._default_ns.append(uri)
        if uri:
            self.namespaces.append((prefix or "", uri))
        if uri and uri != RDF_NS:
            if uri.startswith(RDF_NS):
                self._error(
                    "namespace URI %r is an illegal extension of the RDF "
                    "namespace" % uri
                )
            elif RDF_NS.startswith(uri) and len(uri) >= len(RDF_NS) - 1:
                self._warn("namespace URI %r is a truncation of the RDF namespace" % uri)

    def _ns_end(self, prefix):
        if prefix is None and self._default_ns:
            self._default_ns.pop()

    # -- XML literal writer ------------------------------------------------
    @staticmethod
    def _lit_qname(prefix: Optional[str], local: str) -> str:
        # map the tolerant pre-pass sentinels back to their source forms
        # so XML literals render the original (empty-local/empty-prefix)
        # names, byte-identical to the reference (bug-650.rdf)
        if local == _EMPTY_LOCAL:
            local = ""
        elif local.startswith(_EMPTY_PREFIX):
            return ":" + local[len(_EMPTY_PREFIX):]
        return (prefix + ":" + local) if prefix else local

    def _lit_start(self, name: str, attrs: Dict[str, str], explicit_ns):
        uri, local, prefix = self._split(name)
        qname = self._lit_qname(prefix, local)
        inherited = self._lit_ns_stack[-1] if self._lit_ns_stack else frozenset()
        needed = {}
        if uri and uri != XML_NS:
            needed[prefix or ""] = uri
        for k in attrs:
            auri, alocal, aprefix = self._split(k)
            if auri and auri != XML_NS:
                needed[aprefix or ""] = auri
        for np, nu in explicit_ns:
            if nu is not None:
                needed[np or ""] = nu
        decls = sorted(
            (p, u) for p, u in needed.items() if (p, u) not in inherited
        )
        parts = ["<", qname]
        for dp, du in decls:
            parts.append(
                ' xmlns="%s"' % _xml_escape_attr(du)
                if not dp
                else ' xmlns:%s="%s"' % (dp, _xml_escape_attr(du))
            )
        rendered_attrs = []
        for k, v in attrs.items():
            auri, alocal, aprefix = self._split(k)
            if auri == XML_NS:
                aq = "xml:" + alocal
            else:
                aq = self._lit_qname(aprefix, alocal)
            rendered_attrs.append((aq, v))
        for aq, v in sorted(rendered_attrs):
            parts.append(' %s="%s"' % (aq, _xml_escape_attr(v)))
        parts.append(">")
        self._lit_parts.append("".join(parts))
        scope = set(inherited)
        scope.update(needed.items())
        self._lit_ns_stack.append(frozenset(scope))
        self._lit_depth += 1

    def _lit_end(self, name: str):
        uri, local, prefix = self._split(name)
        qname = self._lit_qname(prefix, local)
        self._lit_parts.append("</%s>" % qname)
        self._lit_ns_stack.pop()
        self._lit_depth -= 1

    # -- statement emission --------------------------------------------------
    def _emit(self, subj, subj_kind, pred, okind, olex, odt=None, olang=None,
              reify_id=None, node: Optional[_Frame] = None):
        s = ("_:" + subj) if subj_kind == KIND_BLANK else subj
        self.triples.append(Triple(s, pred, okind, olex, odt, olang, None))
        bag = node.bag_uri if node is not None else None
        if reify_id is None and bag is None:
            return
        if reify_id is None:
            rid_kind, rid = KIND_BLANK, self._bnode()
        else:
            rid_kind, rid = reify_id
        r = ("_:" + rid) if rid_kind == KIND_BLANK else rid
        if bag is not None:
            node.bag_counter += 1
            self.triples.append(
                Triple(bag, RDF_NS + "_%d" % node.bag_counter,
                       rid_kind, rid, None, None, None)
            )
        elif reify_id is None:
            return
        self.triples.append(
            Triple(r, RDF_NS + "type", KIND_URI, RDF_NS + "Statement", None, None, None)
        )
        self.triples.append(
            Triple(r, RDF_NS + "subject",
                   KIND_BLANK if subj_kind == KIND_BLANK else KIND_URI,
                   subj, None, None, None)
        )
        self.triples.append(
            Triple(r, RDF_NS + "predicate", KIND_URI, pred, None, None, None)
        )
        self.triples.append(Triple(r, RDF_NS + "object", okind, olex, odt, olang, None))

    # -- id bookkeeping ------------------------------------------------------
    def _check_id(self, base: Optional[str], idname: str):
        if not _NCNAME_RE.match(idname):
            self._error("illegal rdf:ID value %r" % idname)
        key = ((base or "").split("#", 1)[0], idname)
        if key in self._ids:
            self._error("duplicate rdf:ID %r" % idname)
        self._ids.add(key)

    def _resolve(self, base: Optional[str], ref: str) -> str:
        out = resolve_uri(base, ref)
        if not out:
            self._error("cannot resolve URI reference %r without a base URI" % ref)
        return out

    # -- attribute classification --------------------------------------------
    def _classify_attrs(self, attrs: Dict[str, str], where: str):
        """Split attributes into (rdf_syntax, property_attrs, xml_lang,
        xml_base). ``where`` is 'node' or 'prop' for error wording."""
        rdf_attrs: Dict[str, str] = {}
        prop_attrs: List[Tuple[str, str, str]] = []
        xlang = None
        xbase = None
        for k, v in attrs.items():
            uri, local, prefix = self._split(k)
            if not _nfc_ok(v):
                self._error("attribute value not in Unicode NFC: %r" % v)
            if uri == XML_NS:
                if local == "lang":
                    xlang = v
                elif local == "base":
                    xbase = v
                continue
            if uri is None:
                if local.startswith(_EMPTY_PREFIX):
                    # tolerant pre-pass sentinel for ':x': the reference
                    # resolves an empty attribute prefix against the
                    # default namespace (ex-64.rdf)
                    real = local[len(_EMPTY_PREFIX):]
                    dns = self._default_ns[-1] if self._default_ns else None
                    if dns:
                        self._warn(
                            "attribute ':%s' with an empty prefix uses the "
                            "default namespace" % real
                        )
                        prop_attrs.append((dns + real, real, v))
                        continue
                    self._error(
                        "attribute ':%s' has an empty prefix and no default "
                        "namespace is in scope" % real
                    )
                if local in _RDF_SYNTAX_ATTRS:
                    self._warn(
                        "unqualified use of rdf attribute %r is deprecated" % local
                    )
                    rdf_attrs[local] = v
                    continue
                self._error("unqualified attribute %r is not allowed" % local)
            if uri == RDF_NS:
                if local in _RDF_SYNTAX_ATTRS:
                    rdf_attrs[local] = v
                    continue
                if local in _FORBIDDEN_PROP_ATTRS:
                    self._error("rdf:%s is not allowed as an attribute" % local)
                if local not in _KNOWN_RDF_NAMES:
                    self._warn("unknown RDF-namespace attribute rdf:%s" % local)
                prop_attrs.append((uri + local, local, v))
                continue
            prop_attrs.append((uri + local, local, v))
        for bad in ("aboutEach", "aboutEachPrefix"):
            if bad in rdf_attrs:
                self._error("rdf:%s was removed from the RDF specification" % bad)
        return rdf_attrs, prop_attrs, xlang, xbase

    # -- node element ----------------------------------------------------------
    def _start_node_element(self, name, attrs, base, lang):
        uri, local, prefix = self._split(name)
        if uri is None:
            self._error("node element %r has no namespace" % local)
        rdf_attrs, prop_attrs, xlang, xbase = self._classify_attrs(attrs, "node")
        if xbase is not None:
            base = self._resolve(base, xbase).split("#", 1)[0]
        if xlang is not None:
            lang = xlang or None
        if uri == RDF_NS:
            if local in _FORBIDDEN_NODE_ELEMENTS:
                self._error("rdf:%s is not allowed as a node element" % local)
            if local not in _KNOWN_RDF_NAMES:
                self._warn("unknown RDF-namespace node element rdf:%s" % local)

        f = _Frame("node", base, lang)
        exclusive = [a for a in ("about", "ID", "nodeID") if a in rdf_attrs]
        if len(exclusive) > 1:
            self._error(
                "node element cannot have more than one of rdf:about, rdf:ID, "
                "rdf:nodeID (%s)" % ", ".join(exclusive)
            )
        if "about" in rdf_attrs:
            about = rdf_attrs["about"]
            if not _nfc_ok(about):
                self._error("rdf:about value not in Unicode NFC")
            f.subject = self._resolve(base, about)
            f.subject_kind = KIND_URI
        elif "ID" in rdf_attrs:
            self._check_id(base, rdf_attrs["ID"])
            f.subject = self._resolve(base, "#" + rdf_attrs["ID"])
            f.subject_kind = KIND_URI
        elif "nodeID" in rdf_attrs:
            if not _NCNAME_RE.match(rdf_attrs["nodeID"]):
                self._error("illegal rdf:nodeID value %r" % rdf_attrs["nodeID"])
            f.subject = rdf_attrs["nodeID"]
            f.subject_kind = KIND_BLANK
        else:
            f.subject = self._bnode()
            f.subject_kind = KIND_BLANK
        if "resource" in rdf_attrs:
            self._error("rdf:resource is not allowed on a node element")
        if "parseType" in rdf_attrs:
            self._error("rdf:parseType is not allowed on a node element")
        if "bagID" in rdf_attrs:
            bid = rdf_attrs["bagID"]
            self._warn("rdf:bagID is deprecated")
            self._check_id(base, bid)
            f.bag_uri = self._resolve(base, "#" + bid)
            self.triples.append(
                Triple(f.bag_uri, RDF_NS + "type", KIND_URI, RDF_NS + "Bag",
                       None, None, None)
            )

        if local != "Description" or uri != RDF_NS:
            self._emit(f.subject, f.subject_kind, RDF_NS + "type",
                       KIND_URI, uri + local, node=f)
        if "type" in rdf_attrs:
            self._emit(f.subject, f.subject_kind, RDF_NS + "type",
                       KIND_URI, self._resolve(base, rdf_attrs["type"]), node=f)
        for pred, _local, v in prop_attrs:
            lex, dt, lg = make_literal(v, None, lang)
            self._emit(f.subject, f.subject_kind, pred, KIND_LITERAL,
                       lex, dt, lg, node=f)
        return f

    # -- property element ------------------------------------------------------
    def _start_property_element(self, name, attrs, parent: _Frame):
        uri, local, prefix = self._split(name)
        if uri is None:
            self._error("property element %r has no namespace" % local)
        base, lang = parent.base, parent.lang
        rdf_attrs, prop_attrs, xlang, xbase = self._classify_attrs(attrs, "prop")
        if xbase is not None:
            base = self._resolve(base, xbase).split("#", 1)[0]
        if xlang is not None:
            lang = xlang or None
        if uri == RDF_NS:
            if local in _FORBIDDEN_PROP_ELEMENTS:
                self._error("rdf:%s is not allowed as a property element" % local)
            if local == "li":
                parent.li_counter += 1
                local = "_%d" % parent.li_counter
            elif local not in _KNOWN_RDF_NAMES:
                self._warn("unknown RDF-namespace property element rdf:%s" % local)

        f = _Frame("prop", base, lang)
        f.pred = uri + local
        for bad in ("about",):
            if bad in rdf_attrs:
                self._error("rdf:%s is not allowed on a property element" % bad)
        if "ID" in rdf_attrs:
            self._check_id(base, rdf_attrs["ID"])
            f.reify_id = (KIND_URI, self._resolve(base, "#" + rdf_attrs["ID"]))
        if "bagID" in rdf_attrs:
            # only legal on a property element whose statements come from
            # property attributes (or none at all): reference behavior per
            # tests/rdfxml ex-44/ex-45 vs bad-05..bad-09
            if (
                "parseType" in rdf_attrs
                or "resource" in rdf_attrs
                or "nodeID" in rdf_attrs
            ):
                self._error(
                    "rdf:bagID is not allowed on a property element with "
                    "rdf:resource, rdf:nodeID or rdf:parseType"
                )
            self._warn("rdf:bagID is deprecated")
            bid = rdf_attrs["bagID"]
            self._check_id(base, bid)
            f.bag_uri = self._resolve(base, "#" + bid)
            self.triples.append(
                Triple(f.bag_uri, RDF_NS + "type", KIND_URI, RDF_NS + "Bag",
                       None, None, None)
            )
        if "datatype" in rdf_attrs:
            f.datatype = self._resolve(base, rdf_attrs["datatype"])
        pt = rdf_attrs.get("parseType")
        if pt is not None:
            if "resource" in rdf_attrs or "nodeID" in rdf_attrs:
                self._error("rdf:parseType cannot be combined with rdf:resource "
                            "or rdf:nodeID")
            if pt == "Resource":
                f.parse_type = "resource"
                f.object = self._bnode()
                f.object_kind = KIND_BLANK
                # acts as a node element scope for nested property elements
                f.subject = f.object
                f.subject_kind = KIND_BLANK
            elif pt == "Collection":
                f.parse_type = "collection"
            elif pt in ("daml:collection", "daml:Collection"):
                f.parse_type = "collection"
                f.daml = True
            else:
                if pt != "Literal":
                    self._warn("unknown rdf:parseType %r treated as Literal" % pt)
                f.parse_type = "literal"
                f.datatype = RDF_XMLLITERAL
            if prop_attrs:
                self._error("property attributes are not allowed with rdf:parseType")
            return f

        obj_res = None
        if "resource" in rdf_attrs and "nodeID" in rdf_attrs:
            self._error("rdf:resource and rdf:nodeID are mutually exclusive")
        if "resource" in rdf_attrs:
            obj_res = (KIND_URI, self._resolve(base, rdf_attrs["resource"]))
        elif "nodeID" in rdf_attrs:
            if not _NCNAME_RE.match(rdf_attrs["nodeID"]):
                self._error("illegal rdf:nodeID value %r" % rdf_attrs["nodeID"])
            obj_res = (KIND_BLANK, rdf_attrs["nodeID"])
        if prop_attrs or "type" in rdf_attrs:
            # object is a (possibly fresh) resource carrying the attributes
            if obj_res is None:
                obj_res = (KIND_BLANK, self._bnode())
            okind, olex = obj_res
            subj = olex
            if "type" in rdf_attrs:
                self._emit(subj, okind, RDF_NS + "type", KIND_URI,
                           self._resolve(base, rdf_attrs["type"]), node=f)
            for pred, _l, v in prop_attrs:
                lex, dt, lg = make_literal(v, None, lang)
                self._emit(subj, okind, pred, KIND_LITERAL, lex, dt, lg, node=f)
            f.prop_attrs = prop_attrs or [("rdf:type", "type", "")]
        if obj_res is not None:
            f.object_kind, f.object = obj_res
        return f

    # -- expat handlers ----------------------------------------------------------
    def _start(self, name, attrs):
        explicit_ns = self._pending_ns
        self._pending_ns = []
        try:
            if self._lit_frame is not None:
                self._lit_start(name, attrs, explicit_ns)
                return
            uri, local, prefix = self._split(name)
            top = self._stack[-1] if self._stack else None

            if top is not None and top.kind == "ignore":
                if self.scan and uri == RDF_NS and local == "RDF":
                    base, lang = top.base, top.lang
                    xb = attrs.get(XML_NS + " base xml")
                    if xb is not None:
                        base = self._resolve(base, xb).split("#", 1)[0]
                    xl = attrs.get(XML_NS + " lang xml")
                    f = _Frame("rdf", base, (xl or None) if xl is not None else lang)
                else:
                    f = _Frame("ignore", top.base, top.lang)
                self._stack.append(f)
                return

            if top is None:
                self._seen_root = True
                if uri == RDF_NS and local == "RDF":
                    base, lang = self.base, None
                    xb = attrs.get(XML_NS + " base xml")
                    if xb is not None:
                        base = self._resolve(base, xb).split("#", 1)[0]
                    xl = attrs.get(XML_NS + " lang xml")
                    f = _Frame("rdf", base, xl or None)
                    self._stack.append(f)
                    return
                if self.scan:
                    self._stack.append(_Frame("ignore", self.base, None))
                    return
                # document element as node element (assumed RDF content,
                # reference: check-assume-rdf / ex-19)
                self._stack.append(self._start_node_element(
                    name, attrs, self.base, None))
                return

            if top.kind == "rdf" or top.kind == "collection":
                f = self._start_node_element(name, attrs, top.base, top.lang)
                if top.kind == "collection":
                    top.collection.append((f.subject_kind, f.subject))
                self._stack.append(f)
                return

            if top.kind == "node" or (top.kind == "prop" and
                                      top.parse_type == "resource"):
                self._stack.append(self._start_property_element(name, attrs, top))
                return

            if top.kind == "prop":
                if top.parse_type == "literal":
                    # begin XML-literal capture; this element is content.
                    # Text collected before it belongs to the literal too.
                    self._lit_frame = top
                    self._lit_depth = 0
                    self._lit_ns_stack = [frozenset()]
                    self._lit_parts = [_xml_escape_text("".join(top.text))]
                    top.text = []
                    self._lit_start(name, attrs, explicit_ns)
                    return
                if top.parse_type == "collection":
                    f = self._start_node_element(name, attrs, top.base, top.lang)
                    top.collection.append((f.subject_kind, f.subject))
                    self._stack.append(f)
                    return
                # element content: exactly one node element allowed
                if top.has_child_node:
                    self._error("property element %r has more than one object "
                                "node element" % top.pred)
                if top.prop_attrs:
                    self._error("property element %r cannot have both property "
                                "attributes and node element content" % top.pred)
                if top.object is not None:
                    self._error("property element %r cannot have both "
                                "rdf:resource and node element content" % top.pred)
                if "".join(top.text).strip():
                    self._error("property element %r has mixed text and element "
                                "content" % top.pred)
                top.text = []
                top.has_child_node = True
                f = self._start_node_element(name, attrs, top.base, top.lang)
                top.object_kind, top.object = f.subject_kind, f.subject
                self._stack.append(f)
                return

            self._error("unexpected element %r" % name)
        except _Abort:
            raise
        except xml.parsers.expat.ExpatError:
            raise
        except Exception as e:  # pragma: no cover - defensive
            self._error("internal: %r" % e)

    def _end(self, name):
        if self._lit_frame is not None:
            if self._lit_depth > 0:
                self._lit_end(name)
                return
            # the property element carrying parseType=Literal is ending
            f = self._lit_frame
            self._lit_frame = None
            lit = "".join(self._lit_parts)
            self._lit_parts = []
            self._finish_literal_prop(f, lit)
            self._stack.pop()
            return
        try:
            f = self._stack.pop()
            if f.kind in ("rdf", "ignore"):
                return
            if f.kind == "node":
                return
            # property element end
            parent = self._stack[-1]
            if f.parse_type == "literal":
                # literal with no element content: plain XML literal of text
                text = "".join(f.text)
                if not _nfc_ok(text):
                    self._error("XML literal text not in Unicode NFC")
                self._finish_literal_prop(f, _xml_escape_text(text))
                return
            if f.parse_type == "resource":
                self._emit(parent.subject, parent.subject_kind, f.pred,
                           KIND_BLANK, f.object, reify_id=f.reify_id, node=parent)
                return
            if f.parse_type == "collection":
                first = RDF_NS + "first" if not f.daml else DAML_NS + "first"
                rest = RDF_NS + "rest" if not f.daml else DAML_NS + "rest"
                nil = RDF_NS + "nil" if not f.daml else DAML_NS + "nil"
                nodes = [self._bnode() for _ in f.collection]
                for i, (ikind, item) in enumerate(f.collection):
                    if f.daml:
                        self.triples.append(
                            Triple("_:" + nodes[i], RDF_NS + "type", KIND_URI,
                                   DAML_NS + "List", None, None, None)
                        )
                    self.triples.append(
                        Triple("_:" + nodes[i], first, ikind, item, None, None, None)
                    )
                    nxt = ("_:" + nodes[i + 1]) if i + 1 < len(nodes) else None
                    if nxt is None:
                        self.triples.append(
                            Triple("_:" + nodes[i], rest, KIND_URI, nil,
                                   None, None, None)
                        )
                    else:
                        self.triples.append(
                            Triple("_:" + nodes[i], rest, KIND_BLANK,
                                   nodes[i + 1], None, None, None)
                        )
                if nodes:
                    self._emit(parent.subject, parent.subject_kind, f.pred,
                               KIND_BLANK, nodes[0], reify_id=f.reify_id,
                               node=parent)
                else:
                    self._emit(parent.subject, parent.subject_kind, f.pred,
                               KIND_URI, nil, reify_id=f.reify_id, node=parent)
                return
            if f.has_child_node or f.object is not None or f.prop_attrs:
                okind = f.object_kind
                olex = f.object
                if olex is None:
                    okind, olex = KIND_BLANK, self._bnode()
                self._emit(parent.subject, parent.subject_kind, f.pred,
                           okind, olex, reify_id=f.reify_id, node=parent)
                return
            # literal content
            text = "".join(f.text)
            if not _nfc_ok(text):
                self._error("literal value not in Unicode NFC")
            if f.bag_uri is not None and text.strip():
                self._error("rdf:bagID is not allowed on a property element "
                            "with literal content")
            if f.datatype is not None:
                lex, dt, lg = make_literal(text, f.datatype, None)
            else:
                lex, dt, lg = make_literal(text, None, f.lang)
            self._emit(parent.subject, parent.subject_kind, f.pred,
                       KIND_LITERAL, lex, dt, lg, reify_id=f.reify_id, node=parent)
        except _Abort:
            raise
        except IndexError:
            self._error("element stack underflow")

    def _cdata(self, data):
        if self._lit_frame is not None:
            if not _nfc_ok(data):
                self._error("XML literal text not in Unicode NFC")
            self._lit_parts.append(_xml_escape_text(data))
            return
        if not self._stack:
            return
        top = self._stack[-1]
        if top.kind == "prop" and top.parse_type in (None, "literal"):
            top.text.append(data)
        elif data.strip():
            if top.kind in ("node", "rdf") and not top.seen_text_error:
                top.seen_text_error = True
                self._error("unexpected text content %r" % data.strip()[:40])

    def _comment(self, data):
        if self._lit_frame is not None:
            self._lit_parts.append("<!--%s-->" % data)

    def _pi(self, target, data):
        if self._lit_frame is not None:
            self._lit_parts.append("<?%s %s?>" % (target, data))

    def _finish_literal_prop(self, f: _Frame, lit: str):
        # parent is below the prop frame; the frame may or may not have
        # been popped yet depending on the call path
        if self._stack and self._stack[-1] is f:
            parent = self._stack[-2]
        else:
            parent = self._stack[-1]
        lex, dt, lg = make_literal(lit, RDF_XMLLITERAL, None)
        self._emit(parent.subject, parent.subject_kind, f.pred, KIND_LITERAL,
                   lex, dt, lg, reify_id=f.reify_id, node=parent)

    # -- driver ----------------------------------------------------------------
    def run(self, text, _allow_rewrite: bool = True):
        try:
            if isinstance(text, str):
                try:
                    # surrogateescape FIRST: it inverts a surrogateescape
                    # decode, so non-UTF-8 document bytes that rode
                    # through a string column (fixture loaders read text
                    # that way) reach expat in their ORIGINAL form —
                    # where the XML declaration's encoding can still
                    # make them a valid document
                    data = text.encode("utf-8", "surrogateescape")
                except UnicodeEncodeError:
                    # other lone surrogates (fuzz inputs) still need a
                    # byte form; surrogatepass yields bytes expat will
                    # reject as malformed UTF-8 — an error record, not
                    # a crash
                    data = text.encode("utf-8", "surrogatepass")
            else:
                data = text
        except UnicodeEncodeError as e:
            self.errors.append({"line": 0, "message": "encoding error: %s" % e})
            return
        try:
            self.p.Parse(data, True)
        except _Abort:
            pass
        except xml.parsers.expat.ExpatError as e:
            # tolerant retry: when expat's NAMESPACE processor rejects a
            # construct the reference accepts, re-serialize (see
            # _tolerant_rewrite) and reparse fresh; anything not fixable
            # keeps the original error
            fixed = _tolerant_rewrite(data) if _allow_rewrite else None
            if fixed is not None:
                p2 = _Parser(self.base, scan=self.scan)
                p2.run(fixed, _allow_rewrite=False)
                self.triples = p2.triples
                self.errors = p2.errors
                self.warnings = p2.warnings
                self.namespaces = p2.namespaces
                self._seen_root = p2._seen_root
                return
            self.errors.append(
                {"line": self.p.CurrentLineNumber, "message": "XML error: %s" % e}
            )
        if not self.errors and not self._seen_root:
            self.errors.append({"line": 0, "message": "no XML content"})


def parse_document(
    text, base_uri: Optional[str] = None, scan: bool = False
) -> Tuple[List[Triple], List[dict]]:
    """Parse one RDF/XML document -> (triples, errors).

    ``scan=True`` ignores content outside any embedded rdf:RDF element
    (reference: the rapper -s / RAPTOR_OPTION_SCANNING behavior used by
    tests/rdfxml's check-scan-rdf)."""
    p = _Parser(base_uri, scan=scan)
    p.run(text)
    return p.triples, p.errors


def parse_document_full(
    text, base_uri: Optional[str] = None, scan: bool = False
) -> Tuple[List[Triple], List[dict], List[dict]]:
    """Like parse_document but also returns warnings (suite runner needs
    the error/warning split: warn-* files must parse with zero errors)."""
    p = _Parser(base_uri, scan=scan)
    p.run(text)
    return p.triples, p.errors, p.warnings
