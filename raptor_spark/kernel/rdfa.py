"""RDFa 1.0 / 1.1 parse kernel (pure Python, expat-backed).

Re-expresses the reference's RDFa parser (dajobe/raptor:
src/raptor_librdfa.c + bundled librdfa/) as a single-pass SAX processor
over well-formed (X)HTML/XML. The processing sequence follows RDFa Core
1.1 §7.5 with an explicit version switch for the XHTML+RDFa 1.0
differences, mirroring librdfa's behavior where the specs leave slack:

- subject/object resolution order (librdfa/rdfa.c:740-940): 1.0 takes
  @about/@src on the subject side and @resource/@href on the object
  side; 1.1 moves @src to the object side;
- hanging @rel/@rev: incomplete triples + a fresh bnode as the children's
  parent object (librdfa/triple.c:472-533 rdfa_save_incomplete_triples),
  completed per establishing child as (parent subject, pred, new subject)
  (librdfa/triple.c:276-350 rdfa_complete_incomplete_triples);
- literal rules: 1.0 defaults mixed content to rdf:XMLLiteral, 1.1 to the
  plain text content; @datatype=""/unresolvable -> plain; explicit
  rdf:XMLLiteral -> markup (librdfa/triple.c
  rdfa_complete_object_literal_triples);
- initial context: the RDFa 1.1 prefix/term mappings and the XHTML
  @rel/@rev term list exactly as librdfa ships them
  (librdfa/context.c:150-340 rdfa_setup_initial_context) — these are the
  W3C-published RDFa 1.1 initial context + XHTML vocab;
- @inlist list mappings (rdf:first/rest/nil chains) owned by the element
  that established the list's subject (librdfa/lists.c:93-210
  rdfa_complete_list_triples);
- XMLLiteral reconstruction declares the in-scope namespaces on each
  top-level child element, like librdfa's xml-literal buffering
  (librdfa/rdfa.c xml_literal handling).

Conformance gate: the reference's own automake suites
(tests/rdfa/Makefile.am, tests/rdfa11/Makefile.am) — every test the
reference passes must pass; its EXPECTED_FAILURES may go either way
(tests/test_kernel_rdfa.py).
"""

from __future__ import annotations

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

XHV = "http://www.w3.org/1999/xhtml/vocab#"
RDF_XMLLITERAL = RDF_NS + "XMLLiteral"
RDFA_NS = "http://www.w3.org/ns/rdfa#"

# XHTML @rel/@rev link-relation terms (librdfa/context.c:254-340; the
# XHTML Metainformation Vocabulary). Matched case-insensitively.
_XHTML_TERMS = {
    t: XHV + t
    for t in (
        "alternate appendix bookmark cite chapter contents copyright "
        "first glossary help icon index last license meta next prev "
        "previous section start stylesheet subsection top up p3pv1 role"
    ).split()
}

# RDFa 1.1 initial context (librdfa/context.c:180-240; the W3C-published
# http://www.w3.org/2011/rdfa-context/rdfa-1.1 mappings librdfa bakes in).
_INITIAL_PREFIXES_11 = {
    "grddl": "http://www.w3.org/2003/g/data-view#",
    "ma": "http://www.w3.org/ns/ma-ont#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdf": RDF_NS,
    "rdfa": RDFA_NS,
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rif": "http://www.w3.org/2007/rif#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "wdr": "http://www.w3.org/2007/05/powder#",
    "void": "http://rdfs.org/ns/void#",
    "wdrs": "http://www.w3.org/2007/05/powder-s#",
    "xhv": XHV,
    "xml": "http://www.w3.org/XML/1998/namespace",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "cc": "http://creativecommons.org/ns#",
    "ctag": "http://commontag.org/ns#",
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "gr": "http://purl.org/goodrelations/v1#",
    "ical": "http://www.w3.org/2002/12/cal/icaltzd#",
    "og": "http://ogp.me/ns#",
    "rev": "http://purl.org/stuff/rev#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "v": "http://rdf.data-vocabulary.org/#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "schema": "http://schema.org/",
}

_INITIAL_TERMS_11 = {
    "describedby": "http://www.w3.org/2007/05/powder-s#describedby",
    "license": XHV + "license",
    "role": XHV + "role",
}

_XHTML10_DTD = b"-//W3C//DTD XHTML+RDFa 1.0//EN"
_XHTML11_DTD = b"-//W3C//DTD XHTML+RDFa 1.1//EN"


class _Frame:
    """Per-element state: the evaluation context handed to children plus
    everything end-element needs (pending literal, list ownership)."""

    __slots__ = (
        "name", "base", "parent_subject", "parent_object", "incomplete",
        "lang", "terms", "vocab", "skip",
        "new_subject", "current_object", "local_incomplete",
        "pending_property", "collector", "depth", "suppress_owner",
    )


class _Collector:
    """Captures descendant content for a deferred @property literal."""

    __slots__ = ("text", "xml", "depth")

    def __init__(self):
        self.text: List[str] = []
        self.xml: List[str] = []
        self.depth = 0


from raptor_spark.kernel.terms import (  # noqa: E402
    xml_escape_attr as _xml_attr_escape,
    xml_escape_text as _xml_escape,
)


class RdfaParser:
    def __init__(self, base_uri: Optional[str], version: int = 11):
        self.base = base_uri or ""
        self.version = version  # 10 or 11
        self.host = "xhtml"  # set from the document sniff in run()
        self.triples: List[Triple] = []
        self.errors: List[dict] = []
        self._bnode_n = 0
        self._stack: List[_Frame] = []
        # document-global list mappings keyed (subject, predicate) with
        # creation depth, exactly like librdfa's "subject predicate"
        # realkeys (rdfa_utils.c:326-362); flushed entries are removed
        # (RDFA_MAPPING_DELETED_KEY) so a later sibling re-creates them
        self._lists: Dict[Tuple[Optional[str], str], dict] = {}
        # per-prefix namespace chains replicating raptor's bucketed
        # namespace stack as librdfa drives it: xmlns pushes at element
        # depth, @prefix pushes at depth 0 (namespace.c:95-99). End-
        # element pops only while the chain HEAD matches the depth
        # (raptor_namespace.c:357-378), so a depth-0 @prefix entry
        # permanently blocks — leaks — every entry beneath it. CURIE
        # lookup reads the head; XML-literal serialization reads the
        # topmost depth>=1 entry (stack_to_array skips depth<1,
        # raptor_namespace.c:1060), which can be a stale blocked xmlns.
        self._ns_chains: Dict[str, List[Tuple[str, int]]] = {}
        self._collectors: List[_Collector] = []
        self._root_seen = False
        # RDFa 1.0 sets recurse=false under an XMLLiteral-producing
        # @property (XHTML+RDFa 1.0 §5.5 step 11): descendants are
        # captured for the literal but generate no triples of their own
        self._suppress = 0

        self.p = xml.parsers.expat.ParserCreate()
        self.p.ordered_attributes = True
        self.p.StartElementHandler = self._start
        self.p.EndElementHandler = self._end
        self.p.CharacterDataHandler = self._cdata
        # expand entity refs / char refs into character data
        self.p.buffer_text = True

    # -- helpers ---------------------------------------------------------

    def _bnode(self) -> str:
        self._bnode_n += 1
        return "_:rdfa%d" % self._bnode_n

    def _named_bnode(self, label: str) -> str:
        if label == "":
            return "_:rdfaempty"
        return "_:u" + label

    def _emit(self, s, p, o_kind, o_lex, dt=None, lang=None):
        if s is None or p is None or o_lex is None:
            return
        try:
            lex, dt, lang = (
                (o_lex, dt, lang)
                if o_kind != KIND_LITERAL
                else make_literal(o_lex, dt, lang)
            )
        except ValueError:
            return
        self.triples.append(Triple(s, p, o_kind, lex, dt, lang, None))

    def _ns_push(self, prefix: str, uri: str, depth: int) -> None:
        self._ns_chains.setdefault(prefix, []).append((uri, depth))

    def _emit_res(self, s, p, o):
        """Emit with subject/object that may be bnode-labelled strings."""
        if s is None or p is None or o is None:
            return
        kind = KIND_BLANK if o.startswith("_:") else KIND_URI
        lex = o[2:] if kind == KIND_BLANK else o
        self.triples.append(Triple(s, p, kind, lex, None, None, None))

    # -- CURIE / term machinery -----------------------------------------

    def _expand_curie(self, value: str, frame, allow_bnode: bool):
        """Expand a (non-safe) CURIE; None when not a declared CURIE."""
        if ":" not in value:
            return None
        prefix, _, ref = value.partition(":")
        if prefix == "_":
            return self._named_bnode(ref) if allow_bnode else None
        if prefix == "":
            return XHV + ref
        chain = self._ns_chains.get(prefix)
        if not chain:
            return None
        return chain[-1][0] + ref

    def _safecurie_or_uri(self, value, frame, allow_bnode=True):
        """@about/@resource value -> IRI or bnode label, else None.

        1.0: SafeCURIEorURI — brackets force CURIE, everything else is an
        IRI reference. 1.1: SafeCURIEorCURIEorIRI — an unbracketed value
        whose prefix is declared expands as a CURIE first."""
        if value is None:
            return None
        v = value.strip()
        if v.startswith("[") and v.endswith("]"):
            inner = v[1:-1].strip()
            if inner == "":
                return None
            return self._expand_curie(inner, frame, allow_bnode)
        if v.startswith("_:") and allow_bnode:
            return self._named_bnode(v[2:])
        if self.version >= 11:
            got = self._expand_curie(v, frame, allow_bnode)
            if got is not None:
                return got
        return resolve_uri(frame.base, v) or None

    def _term_or_curie(self, value, frame, mode="prop", allow_bnode=False):
        """@property/@typeof/@datatype/@rel/@rev single value -> IRI.

        1.0: CURIE only, plus the XHTML reserved words in @rel/@rev.
        1.1: librdfa's resolution order (librdfa/curie.c:348-648), which
        differs per attribute class exactly like its curieparse_t modes:

        - ``relrev`` (rdfa_resolve_relrev_curie): an in-scope @vocab
          overrides the reserved words (suite 0189); otherwise the term
          map is consulted — case-insensitively only in the XHTML host
          language (curie.c:604-616); then CURIE expansion; unmatched
          values finally resolve against base (curie.c:637-645).
        - ``prop`` (CURIE_PARSE_PROPERTY): term map first (case-
          sensitive, curie.c:375-384), then CURIE, then @vocab for
          colon-less values, then base resolution (curie.c:547-565).
        - ``instof`` (@typeof/@datatype, CURIE_PARSE_INSTANCEOF_DATATYPE):
          never consults the term map — CURIE, then @vocab, then base."""
        v = value.strip()
        if not v:
            return None
        if self.version == 10:
            if ":" not in v:
                if mode == "relrev":
                    return _XHTML_TERMS.get(v.lower())
                return None
            return self._expand_curie(v, frame, allow_bnode)
        if mode == "relrev":
            if frame.vocab is None:
                res = v[1:] if v.startswith(":") else v
                if ":" not in res:
                    t = (
                        frame.terms.get(res.lower())
                        if self.host == "xhtml"
                        else frame.terms.get(res)
                    )
                    if t is not None:
                        return t
            got = self._expand_curie(v, frame, False)
            if got is not None:
                return got
        else:
            if mode == "prop" and ":" not in v:
                t = frame.terms.get(v)
                if t is not None:
                    return t
            got = self._expand_curie(v, frame, allow_bnode)
            if got is not None:
                return got
        if frame.vocab is not None and ":" not in v:
            return frame.vocab + v
        if v.startswith("[") or "_:" in v:
            # failed safe CURIEs and bnode shapes never fall through to
            # the IRI fallback (curie.c:549, :560-563)
            return None
        return resolve_uri(frame.base, v) or None

    def _term_list(self, value, frame, mode="prop", allow_bnode=False):
        out = []
        for tok in value.split():
            iri = self._term_or_curie(
                tok, frame, mode=mode, allow_bnode=allow_bnode
            )
            if iri is not None:
                out.append(iri)
        return out

    # -- SAX handlers ----------------------------------------------------

    def _start(self, name, attr_list):
        attrs: Dict[str, str] = {}
        attr_order: List[Tuple[str, str]] = []
        for i in range(0, len(attr_list), 2):
            attrs[attr_list[i]] = attr_list[i + 1]
            attr_order.append((attr_list[i], attr_list[i + 1]))

        parent = self._stack[-1] if self._stack else None

        if self._suppress:
            # inside a 1.0 XMLLiteral: maintain ns scope for the literal
            # serialization, emit nothing
            frame = _Frame()
            frame.name = name
            frame.skip = True
            frame.base = parent.base
            frame.parent_subject = parent.parent_subject
            frame.parent_object = parent.parent_object
            frame.incomplete = parent.incomplete
            frame.lang = parent.lang
            frame.terms = parent.terms
            frame.vocab = parent.vocab
            frame.new_subject = None
            frame.current_object = None
            frame.local_incomplete = []
            frame.pending_property = None
            frame.collector = None
            frame.depth = len(self._stack) + 1
            frame.suppress_owner = False
            for k, v in attrs.items():
                if k == "xmlns":
                    self._ns_push("", v, frame.depth)
                elif k.startswith("xmlns:"):
                    self._ns_push(k[6:], v, frame.depth)
            for c in self._collectors:
                if c.depth == 0:
                    decls = self._scope_decl_string(frame)
                else:
                    decls = self._own_decl_string(attr_order)
                c.xml.append(self._serialize_start(name, attr_order, decls))
                c.depth += 1
            self._stack.append(frame)
            return

        frame = _Frame()
        frame.name = name
        frame.suppress_owner = False
        local = name.rsplit(":", 1)[-1].lower()

        # ---- evaluation context inheritance ----
        if parent is None:
            frame.base = self.base
            frame.parent_subject = None
            frame.parent_object = None
            frame.incomplete = []
            frame.lang = None
            # initial-context prefixes sit at the bottom of each chain
            # at depth 0: never popped, never in XML literals
            if self.version >= 11:
                self._ns_chains = {
                    k: [(v, 0)] for k, v in _INITIAL_PREFIXES_11.items()
                }
            # term map by host language (librdfa/context.c:240-345):
            # the XHTML reserved words exist only in the XHTML host;
            # HTML/XML hosts get just the RDFa 1.1 initial-context terms
            if self.version == 10:
                frame.terms = dict(_XHTML_TERMS)
            elif self.host == "xhtml":
                frame.terms = {**_INITIAL_TERMS_11, **_XHTML_TERMS}
            else:
                frame.terms = dict(_INITIAL_TERMS_11)
            frame.vocab = None
        elif parent.skip:
            # skipped parents pass their evaluation context through
            # untouched except lang/prefixes (RDFa Core 1.1 §7.5 step 13)
            frame.base = parent.base
            frame.parent_subject = parent.parent_subject
            frame.parent_object = parent.parent_object
            frame.incomplete = parent.incomplete
            frame.lang = parent.lang
            frame.terms = parent.terms
            frame.vocab = parent.vocab
        else:
            frame.base = parent.base
            frame.parent_subject = parent.new_subject or parent.parent_subject
            frame.parent_object = (
                parent.current_object
                or parent.new_subject
                or parent.parent_subject
            )
            frame.incomplete = parent.local_incomplete
            frame.lang = parent.lang
            frame.terms = parent.terms
            frame.vocab = parent.vocab

        frame.skip = False
        frame.new_subject = None
        frame.current_object = None
        frame.local_incomplete = []
        frame.pending_property = None
        frame.collector = None
        frame.depth = len(self._stack) + 1

        # ---- local mappings: xmlns / @prefix / @vocab / lang / base ----
        for k, v in attrs.items():
            if k == "xmlns":
                self._ns_push("", v, frame.depth)
            elif k.startswith("xmlns:"):
                self._ns_push(k[6:], v, frame.depth)
        if self.version >= 11 and "prefix" in attrs:
            # @prefix mappings push at depth 0 (see _ns_chains above):
            # document-global from here on; "_" is rejected like librdfa
            # (namespace.c:74-87); they beat same-element xmlns because
            # they are pushed later (rdfa.c:411-415)
            toks = attrs["prefix"].split()
            i = 0
            while i + 1 < len(toks):
                p = toks[i]
                if p.endswith(":") and p[:-1] != "_":
                    self._ns_push(p[:-1], toks[i + 1], 0)
                i += 2

        default_ns = self._ns_chains.get("")
        if "xml:base" in attrs and (
            not default_ns
            or default_ns[-1][0] != "http://www.w3.org/1999/xhtml"
        ):
            # @xml:base is invalid in XHTML and ignored there (suite
            # 0109); honored for SVG and other XML host languages
            b = resolve_uri(frame.base, attrs["xml:base"])
            if b:
                frame.base = b.split("#", 1)[0]
        if local == "base" and "href" in attrs:
            b = resolve_uri(frame.base, attrs["href"])
            if b:
                # XHTML <base href>: rebases the document, including the
                # already-established root subject (librdfa rdfa.c:168-175
                # resets current_object_resource to the cleaned base)
                old = frame.base
                new = b.split("#", 1)[0]
                frame.base = new
                self.base = new
                for f in self._stack:
                    f.base = new
                    for slot in ("parent_subject", "parent_object",
                                 "new_subject", "current_object"):
                        if getattr(f, slot) == old:
                            setattr(f, slot, new)
                self._lists = {
                    ((new if s == old else s), p): e
                    for (s, p), e in self._lists.items()
                }
                for slot in ("parent_subject", "parent_object"):
                    if getattr(frame, slot) == old:
                        setattr(frame, slot, new)

        if "xml:lang" in attrs:
            frame.lang = attrs["xml:lang"] or None
        elif "lang" in attrs:
            frame.lang = attrs["lang"] or None

        if self.version >= 11 and "vocab" in attrs:
            v = attrs["vocab"].strip()
            if v:
                frame.vocab = v
                self._emit_res(frame.base, RDFA_NS + "usesVocabulary", v)
            else:
                frame.vocab = None

        # ---- attribute value resolution ----
        is_root = not self._root_seen
        self._root_seen = True

        about = self._safecurie_or_uri(attrs.get("about"), frame)
        resource = self._safecurie_or_uri(attrs.get("resource"), frame)
        href = (
            resolve_uri(frame.base, attrs["href"].strip()) or None
            if "href" in attrs
            else None
        )
        src = (
            resolve_uri(frame.base, attrs["src"].strip()) or None
            if "src" in attrs
            else None
        )
        rel_present = "rel" in attrs
        rev_present = "rev" in attrs
        rel = self._term_list(attrs.get("rel", ""), frame, mode="relrev")
        rev = self._term_list(attrs.get("rev", ""), frame, mode="relrev")
        prop_present = "property" in attrs
        props = (
            self._term_list(attrs["property"], frame) if prop_present else []
        )
        typeof_present = "typeof" in attrs
        types = (
            self._term_list(attrs["typeof"], frame, mode="instof",
                            allow_bnode=True)
            if typeof_present
            else []
        )
        content = attrs.get("content")
        datatype_attr = attrs.get("datatype")
        inlist = self.version >= 11 and "inlist" in attrs

        # head/body inherit the parent subject only in the (X)HTML host
        # languages (librdfa/rdfa.c:728-733)
        head_body = local in ("head", "body") and self.host != "xml"
        typed_resource = None

        # ---- establish new subject / current object resource ----
        if not rel_present and not rev_present:
            if (
                self.version >= 11
                and prop_present
                and content is None
                and datatype_attr is None
            ):
                # RDFa 1.1 §7.5 step 5.1
                if about is not None:
                    frame.new_subject = about
                elif is_root:
                    frame.new_subject = resolve_uri(frame.base, "") or frame.base
                else:
                    frame.new_subject = frame.parent_object
                if typeof_present:
                    if about is not None:
                        typed_resource = about
                    elif is_root:
                        typed_resource = frame.new_subject
                    elif head_body:
                        typed_resource = frame.new_subject
                    else:
                        typed_resource = (
                            resource or href or src or self._bnode()
                        )
                        frame.current_object = typed_resource
            else:
                # step 5.2 (1.1) / §5.5 step 4 (1.0)
                if self.version == 10:
                    subj = about or src or resource or href
                else:
                    subj = about if about is not None else (
                        resource or href or src
                    )
                if subj is not None:
                    frame.new_subject = subj
                elif is_root:
                    frame.new_subject = resolve_uri(frame.base, "") or frame.base
                elif head_body:
                    frame.new_subject = frame.parent_object
                elif typeof_present:
                    frame.new_subject = self._bnode()
                else:
                    frame.new_subject = frame.parent_object
                    if not prop_present:
                        frame.skip = True
                if typeof_present:
                    typed_resource = frame.new_subject
        else:
            # @rel/@rev present (step 6 / 1.0 step 5)
            if self.version == 10:
                subj = about or src
            else:
                subj = about
            if subj is not None:
                frame.new_subject = subj
                if typeof_present:
                    typed_resource = frame.new_subject
            elif is_root:
                frame.new_subject = resolve_uri(frame.base, "") or frame.base
                if typeof_present:
                    typed_resource = frame.new_subject
            elif head_body:
                frame.new_subject = frame.parent_object
                if typeof_present:
                    typed_resource = frame.new_subject
            elif self.version == 10 and typeof_present:
                # 1.0 attaches @typeof to a fresh bnode subject even in
                # the rel/rev branch (XHTML+RDFa 1.0 §5.5 step 5)
                frame.new_subject = self._bnode()
                typed_resource = frame.new_subject
            else:
                frame.new_subject = frame.parent_object
            if self.version == 10:
                frame.current_object = resource or href
            else:
                frame.current_object = resource or href or src
            if (
                self.version >= 11
                and typeof_present
                and typed_resource is None
            ):
                # 1.1: @typeof without @about types the object side
                if frame.current_object is None:
                    frame.current_object = self._bnode()
                typed_resource = frame.current_object

        # ---- hanging rel/rev: materialize the children's bnode now so
        # the list-mapping scope below sees the final current object
        # (librdfa/triple.c:481-484 creates it inside save_incomplete) ----
        hanging = (
            (rel_present or rev_present)
            and frame.current_object is None
            and bool(rel or rev)
        )
        if hanging:
            frame.current_object = self._bnode()

        # ---- typeof triples ----
        for t in types:
            self._emit_res(typed_resource, RDF_NS + "type", t)

        # ---- complete parent's incomplete triples ----
        if not frame.skip and frame.new_subject is not None:
            for entry in frame.incomplete:
                kind = entry[0]
                if kind == "forward":
                    self._emit_res(
                        frame.parent_subject, entry[1], frame.new_subject
                    )
                elif kind == "reverse":
                    self._emit_res(
                        frame.new_subject, entry[1], frame.parent_subject
                    )
                else:  # list
                    entry[2].append((KIND_URI, frame.new_subject, None, None))

        # ---- rel/rev triples or incomplete ----
        if rel_present or rev_present:
            if frame.current_object is not None and not hanging:
                for r in rel:
                    if inlist:
                        # librdfa emits the list item AND the plain rel
                        # triple when a resource is present
                        # (librdfa/rdfa.c:900-922, suite 0220)
                        self._list_append(
                            frame, r,
                            (KIND_URI, frame.current_object, None, None),
                        )
                    self._emit_res(frame.new_subject, r, frame.current_object)
                for r in rev:
                    self._emit_res(frame.current_object, r, frame.new_subject)
            elif hanging:
                if inlist and rel:
                    for r in rel:
                        lst = self._list_for(frame, r)
                        frame.local_incomplete.append(("list", r, lst))
                    for r in rev:
                        frame.local_incomplete.append(("reverse", r))
                else:
                    for r in rel:
                        frame.local_incomplete.append(("forward", r))
                    for r in rev:
                        frame.local_incomplete.append(("reverse", r))

        # ---- property handling ----
        if prop_present and props:
            self._setup_property(
                frame, props, content, datatype_attr, inlist,
                resource, href, src, typeof_present, about, typed_resource,
                rel_present, rev_present,
            )

        # ---- literal collectors ----
        for c in self._collectors:
            if c.depth == 0:
                decls = self._scope_decl_string(frame)
            else:
                decls = self._own_decl_string(attr_order)
            c.xml.append(self._serialize_start(name, attr_order, decls))
            c.depth += 1

        if frame.pending_property is not None and frame.pending_property[3]:
            # needs captured content (text and/or xml)
            frame.collector = _Collector()
            self._collectors.append(frame.collector)
            if self.version == 10 and frame.pending_property[1] in (
                "auto10", "xml",
            ):
                self._suppress += 1
                frame.suppress_owner = True

        self._stack.append(frame)

    def _list_for(self, frame, pred):
        # lists live in one document-global mapping keyed
        # (new subject, predicate), created at the @inlist element's
        # depth (librdfa rdfa_create_list_mapping / establish_new_inlist
        # / save_incomplete_list_triples — lists.c:36-93); the head bnode
        # is allocated at creation like librdfa's sentinel item
        key = (frame.new_subject, pred)
        entry = self._lists.get(key)
        if entry is None:
            entry = {"depth": frame.depth, "head": self._bnode(),
                     "items": []}
            self._lists[key] = entry
        return entry["items"]

    def _list_append(self, frame, pred, item):
        self._list_for(frame, pred).append(item)

    def _setup_property(
        self, frame, props, content, datatype_attr, inlist,
        resource, href, src, typeof_present, about, typed_resource,
        rel_present, rev_present,
    ):
        """Decide the @property object now if possible; else register a
        deferred literal completed at end-element (needs text/XML)."""
        dt = None
        mode = "plain"
        if datatype_attr is not None:
            s = datatype_attr.strip()
            if s == "":
                mode = "plain"
            else:
                dt = self._term_or_curie(s, frame, mode="instof")
                if dt is None:
                    mode = "plain"
                elif dt == RDF_XMLLITERAL:
                    mode = "xml"
                else:
                    mode = "typed"
        elif self.version >= 11:
            if content is None and not rel_present and not rev_present:
                res_obj = resource or href or src
                if res_obj is not None:
                    for p in props:
                        if inlist:
                            self._list_append(
                                frame, p, (KIND_URI, res_obj, None, None)
                            )
                        else:
                            self._emit_res(frame.new_subject, p, res_obj)
                    return
                if typeof_present and about is None:
                    for p in props:
                        if inlist:
                            self._list_append(
                                frame, p,
                                (KIND_URI, typed_resource, None, None),
                            )
                        else:
                            self._emit_res(frame.new_subject, p, typed_resource)
                    return
        else:
            # 1.0: mixed content (element children) -> XMLLiteral,
            # decided at end-element
            if content is None:
                mode = "auto10"

        if content is not None:
            for p in props:
                if inlist:
                    self._list_append(
                        frame, p,
                        (
                            KIND_LITERAL, content,
                            dt if mode == "typed" else None,
                            frame.lang if mode != "typed" else None,
                        ),
                    )
                else:
                    self._emit(
                        frame.new_subject, p, KIND_LITERAL, content,
                        dt if mode == "typed" else None,
                        frame.lang if mode != "typed" else None,
                    )
            return

        needs_capture = True
        frame.pending_property = (props, mode, dt, needs_capture, inlist,
                                  frame.lang, frame.new_subject)

    # -- XMLLiteral serialization helpers ---------------------------------

    def _scope_decl_string(self, frame) -> str:
        # librdfa serializes the whole namespace stack, skipping depth-0
        # entries (@prefix and the initial context — stack_to_array,
        # raptor_namespace.c:1060) and keeping the topmost entry per
        # prefix, which can be a stale xmlns blocked by an @prefix
        decls = {}
        for p, chain in self._ns_chains.items():
            for uri, depth in reversed(chain):
                if depth >= 1:
                    decls[p] = uri
                    break
        parts = []
        if "" in decls:
            parts.append(' xmlns="%s"' % _xml_attr_escape(decls[""]))
        for p in sorted(k for k in decls if k):
            parts.append(' xmlns:%s="%s"' % (p, _xml_attr_escape(decls[p])))
        return "".join(parts)

    def _own_decl_string(self, attr_order) -> str:
        parts = []
        for k, v in attr_order:
            if k == "xmlns" or k.startswith("xmlns:"):
                parts.append(' %s="%s"' % (k, _xml_attr_escape(v)))
        return "".join(parts)

    def _serialize_start(self, name, attr_order, decls) -> str:
        attrs = "".join(
            ' %s="%s"' % (k, _xml_attr_escape(v))
            for k, v in attr_order
            if k != "xmlns" and not k.startswith("xmlns:")
        )
        return "<%s%s%s>" % (name, decls, attrs)

    # -- end / cdata -------------------------------------------------------

    def _cdata(self, data):
        for c in self._collectors:
            c.text.append(data)
            c.xml.append(_xml_escape(data))

    def _end(self, name):
        frame = self._stack.pop()

        # pop namespaces like raptor_namespaces_end_for_depth
        # (raptor_namespace.c:357-378): only while the chain head is at
        # this depth — a depth-0 @prefix head blocks everything beneath
        for chain in self._ns_chains.values():
            while chain and chain[-1][1] == frame.depth:
                chain.pop()

        if frame.suppress_owner:
            self._suppress -= 1
        if frame.collector is not None:
            self._collectors.remove(frame.collector)

        for c in self._collectors:
            c.depth -= 1
            c.xml.append("</%s>" % name)

        if frame.pending_property is not None:
            props, mode, dt, _cap, inlist, lang, subj = frame.pending_property
            col = frame.collector
            text = "".join(col.text)
            xml_text = "".join(col.xml)
            has_markup = xml_text != _xml_escape(text)
            if mode == "auto10":
                if has_markup:
                    mode, dt = "xml", RDF_XMLLITERAL
                else:
                    mode = "plain"
            if mode == "xml":
                value, dtype, lng = xml_text, RDF_XMLLITERAL, None
            elif mode == "typed":
                value, dtype, lng = text, dt, None
            else:
                value, dtype, lng = text, None, lang
            for p in props:
                if inlist:
                    self._list_append(frame, p, (KIND_LITERAL, value, dtype, lng))
                else:
                    self._emit(subj, p, KIND_LITERAL, value, dtype, lng)

        # list triples flush at the first element end strictly above the
        # creation depth, provided a new subject was established
        # (librdfa rdfa.c:1179-1203, lists.c:93-210); flushed entries
        # are removed so later siblings start fresh lists
        if self.version >= 11 and frame.new_subject is not None:
            for key in list(self._lists):
                entry = self._lists[key]
                if frame.depth < entry["depth"]:
                    self._emit_list(key[0], key[1], entry,
                                    frame.new_subject)
                    del self._lists[key]

    def _emit_list(self, subject, pred, entry, flush_subject):
        items = entry["items"]
        if not items:
            # an empty list attaches to the flushing element's subject
            # (lists.c:160-170 uses context->new_subject)
            self._emit_res(flush_subject, pred, RDF_NS + "nil")
            return
        nodes = [entry["head"]]
        nodes += [self._bnode() for _ in items[1:]]
        self._emit_res(subject, pred, nodes[0])
        for i, (kind, lex, dt, lang) in enumerate(items):
            if kind == KIND_LITERAL:
                self._emit(nodes[i], RDF_NS + "first", KIND_LITERAL,
                           lex, dt, lang)
            else:
                self._emit_res(nodes[i], RDF_NS + "first", lex)
            nxt = nodes[i + 1] if i + 1 < len(nodes) else RDF_NS + "nil"
            self._emit_res(nodes[i], RDF_NS + "rest", nxt)

    # -- driver ------------------------------------------------------------

    def run(self, data) -> None:
        if isinstance(data, str):
            try:
                try:
                    # surrogateescape FIRST (same contract as the rdfxml
                    # kernel): it inverts the fixture loaders' string
                    # transport, so non-UTF-8 document bytes reach the
                    # tokenizer in their original form
                    data = data.encode("utf-8", "surrogateescape")
                except UnicodeEncodeError:
                    data = data.encode("utf-8")
            except UnicodeEncodeError as e:
                # lone surrogates are not encodable text — an input
                # error record, never a crash (same contract as the
                # other kernels' fuzz gate)
                self.errors.append({"line": 0, "message": str(e)})
                return
        # host-language sniff (librdfa/rdfa.c:100-129): an XHTML+RDFa
        # DOCTYPE forces the XHTML host (and RDFa 1.0 for the 1.0 DTD);
        # a bare <html> is HTML; anything else (SVG, generic XML) is
        # XML. The raptor-style version pin (rdfa.c:123-128) overrides
        # the RDFa version but keeps the sniffed host — except
        # version 10, which forces XHTML. version 0 = pure sniff.
        if _XHTML10_DTD in data:
            self.host, sniffed = "xhtml", 10
        elif _XHTML11_DTD in data:
            self.host, sniffed = "xhtml", 11
        elif b"<html" in data:
            self.host, sniffed = "html", 11
        else:
            self.host, sniffed = "xml", 11
        if self.version == 10:
            self.host = "xhtml"
        elif self.version == 0:
            self.version = sniffed
            if sniffed == 10:
                self.host = "xhtml"
        try:
            self.p.Parse(data, True)
        except xml.parsers.expat.ExpatError as e:
            self.errors.append(
                {"line": getattr(e, "lineno", 0), "message": str(e)}
            )


def parse_document(
    data, base_uri: Optional[str] = None, version: int = 11
) -> Tuple[List[Triple], List[dict]]:
    """Parse one (X)HTML+RDFa document -> (triples, errors).

    ``version`` selects the processing rules: 10 (XHTML+RDFa 1.0) or
    11 (RDFa Core 1.1, XHTML host language)."""
    p = RdfaParser(base_uri, version=version)
    p.run(data)
    # graph set semantics: several children may complete the same hanging
    # @rel incomplete triple against one shared bnode — one triple results
    return list(dict.fromkeys(p.triples)), p.errors
