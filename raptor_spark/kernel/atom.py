"""Atom 1.0 serializer (the reference's rss-1.0/atom serializer family).

Re-expresses dajobe/raptor's src/raptor_serialize_rss.c in atom mode with
rssTriples=atom-triples: triples are folded back into the RSS/Atom item
model (statement intake + group map + the move/build passes,
raptor_serialize_rss.c:310-1035), atom validity rules are applied
(ensure_atom_feed_valid :1606-1731, remove_mapped_fields :553-651), and
the result is emitted through an auto-indenting XML writer with raptor's
exact layout (src/raptor_xml_writer.c: sorted namespace/attribute
declarations, lazy '>' for auto-empty elements, newline+indent before
elements only).

Verified byte-exact against tests/feeds/test0{1,2,3}-result.atom
(the check-serialize-atom recipe in tests/feeds/Makefile.am, including
the atomEntryUri single-entry mode used by test01).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

from raptor_spark.kernel.rss import (
    _ATOM_TO_RSS,
    _FIELD_NAMES,
    _field_uri,
    _NS_PREFIX,
    _NS_URI,
    _TYPES,
    ATOM03_NS,
    ATOM10_NS,
    F_ATOM_AUTHOR,
    F_ATOM_ID,
    F_ATOM_LINK,
    F_ATOM_SUMMARY,
    F_ATOM_TITLE,
    F_ATOM_UPDATED,
    F_CONTENT_ENCODED,
    F_DESCRIPTION,
    F_ITEMS,
    T_ATOM_AUTHOR,
    T_CHANNEL,
    T_ENCLOSURE,
    T_FEED as T_ATOM_FEED,
    T_ENTRY as T_ATOM_ENTRY,
    T_ITEM,
    _Field,
    _Item,
    format_iso_date,
)
from raptor_spark.kernel.terms import (
    KIND_BLANK,
    KIND_LITERAL,
    KIND_URI,
    RDF_NS,
    Triple,
    check_ordinal,
)
from raptor_spark.kernel.uri import uri_to_relative

_XMLLIT = RDF_NS + "XMLLiteral"

# field indexes the C code references that kernel.rss does not export
F_ATOM_NAME = 55
F_ATOM_URI = 61
F_ATOM_EMAIL = 48
F_ATOM_CONTENT = 46
F_AT_CONTENT_TYPE = 89
F_ATOM_ICON = 52
F_ATOM_LOGO = 54
F_ATOM_RIGHTS = 57
F_ATOM_SUBTITLE = 59
F_ATOM_PUBLISHED = 56
F_ATOM_SOURCE = 58

_FEEDMAP_FROM = (F_ATOM_ID, F_ATOM_UPDATED, F_ATOM_RIGHTS, F_ATOM_TITLE)


#: pred URI -> field index, built once (the intake paths previously
#: rebuilt all ~100 field URIs by string concatenation PER STATEMENT —
#: O(statements x fields) inside the per-feed Arrow kernel). First
#: field wins on duplicate URIs, matching the ascending scan it replaces.
_FIELD_OF_URI: dict = {}
for _f in range(len(_FIELD_NAMES)):
    _u = _field_uri(_f)
    if _u is not None and _u not in _FIELD_OF_URI:
        _FIELD_OF_URI[_u] = _f
del _f, _u

_F_ITEMS_URI = _field_uri(F_ITEMS)


from raptor_spark.kernel.terms import (  # noqa: E402
    xml_escape_attr as _xml_escape_attr,
    xml_escape_text as _xml_escape_text,
)


class _XmlWriter:
    """raptor_xml_writer: auto-indent 2, auto-empty, sorted namespace
    and attribute declarations with 1-extra-level continuation indent."""

    def __init__(self):
        self.parts: List[str] = ['<?xml version="1.0" encoding="utf-8"?>\n']
        self.depth = 0
        self.started = False  # no newline before the very first element
        self._open = False  # '<name ...' written, '>' pending
        self._stack: List[list] = []  # [tag, cdata_seen, element_seen]

    def _flush_bracket(self):
        if self._open:
            self.parts.append(">")
            self._open = False

    def _indent(self):
        if not self.started:
            self.started = True
            return
        self.parts.append("\n" + "  " * self.depth)

    def _element_open(self, tag: str, attrs, nsdecls):
        # declarations sorted by their formatted string
        # (raptor_xml_writer.c:161-173 nsd_compare), namespaces first
        decls = sorted(
            (
                 'xmlns:%s="%s"' % (p, _xml_escape_attr(u))
                 if p else 'xmlns="%s"' % _xml_escape_attr(u)
            )
            for p, u in nsdecls
        )
        decls += sorted(
            '%s="%s"' % (k, _xml_escape_attr(v)) for k, v in attrs
        )
        self.parts.append("<" + tag)
        cont = "\n" + "  " * (self.depth + 1) + " "
        for i, d in enumerate(decls):
            self.parts.append((" " if i == 0 else cont) + d)

    def start(self, tag: str, attrs=(), nsdecls=()):
        self._flush_bracket()
        self._indent()
        if self._stack:
            self._stack[-1][2] = True
        self._element_open(tag, attrs, nsdecls)
        self._open = True
        self.depth += 1
        self._stack.append([tag, False, False])

    def end(self):
        tag, cdata_seen, element_seen = self._stack.pop()
        self.depth -= 1
        if element_seen:
            self.parts.append("\n" + "  " * self.depth)
        if self._open and not cdata_seen and not element_seen:
            self.parts.append("/>")
            self._open = False
        else:
            self._flush_bracket()
            self.parts.append("</" + tag + ">")

    def empty(self, tag: str, attrs=(), nsdecls=()):
        self._flush_bracket()
        self._indent()
        if self._stack:
            self._stack[-1][2] = True
        self._element_open(tag, attrs, nsdecls)
        self.parts.append("/>")

    def cdata(self, s: str):
        self._flush_bracket()
        self.parts.append(_xml_escape_text(s))
        if self._stack:
            self._stack[-1][1] = True

    def raw(self, s: str):
        self._flush_bracket()
        self.parts.append(s)
        if self._stack:
            self._stack[-1][1] = True

    def getvalue(self) -> str:
        self._flush_bracket()
        return "".join(self.parts)


def _qname_for(uri: str, default_nsid: int = ATOM10_NS) -> Optional[str]:
    """Abbreviate with the rss table namespaces (the ones declared on
    the root element); the serializer's default namespace renders as a
    bare local name."""
    for nsid, prefix in _NS_PREFIX.items():
        ns = _NS_URI[nsid]
        if ns and uri.startswith(ns) and len(uri) > len(ns):
            local = uri[len(ns):]
            if local and "/" not in local and "#" not in local:
                if nsid == default_nsid:
                    # the root element's DEFAULT namespace renders as a
                    # bare local name — for the atom serializer that is
                    # the atom namespace itself, whose 'atom:' prefix
                    # the root deliberately never declares (the old
                    # `nsid != ATOM10_NS` guard forced the prefixed
                    # form there, namespace-ill-formed XML)
                    return local
                return "%s:%s" % (prefix, local)
    return None


class AtomSerializer:
    """Statement sink + emitter; feed triples in document order, then
    call to_xml()."""

    def __init__(
        self,
        base_uri: Optional[str] = None,
        entry_uri: Optional[str] = None,
        now: int = 0,
    ):
        self.base = base_uri
        self.entry_uri = entry_uri
        self.now = now
        self._default_nsid = ATOM10_NS
        # (prefix, uri) pairs declared by the input document's parser;
        # deduped by prefix/URI like rss10's user_namespaces
        self.user_namespaces: List[Tuple[Optional[str], str]] = []
        self.channel: Optional[_Item] = None
        self.common: Dict[int, List[_Item]] = {}
        self.items: List[Optional[_Item]] = []
        self.enclosures: List[_Item] = []
        self.pool: List[Optional[Triple]] = []
        self.group: Dict[str, _Item] = {}
        self.seq_term: Optional[str] = None

    # -- statement intake (raptor_rss10_serialize_statement) --------------

    def _subject_key(self, t: Triple) -> str:
        return t.subj

    def _object_key(self, t: Triple) -> Optional[str]:
        if t.obj_kind == KIND_URI:
            return t.obj_lex
        if t.obj_kind == KIND_BLANK:
            return "_:" + t.obj_lex
        return None

    def statement(self, t: Triple) -> None:
        if t.pred == _F_ITEMS_URI:
            return  # (? rss:items ?) is inferred
        if t.pred == RDF_NS + "type":
            if t.obj_kind == KIND_URI:
                if t.obj_lex == RDF_NS + "Seq":
                    self.seq_term = self._subject_key(t)
                    return  # handled, not stored
                for i, (name, nsid, _c, _cf, _pf) in enumerate(_TYPES):
                    ns = _NS_URI[nsid]
                    if ns and t.obj_lex == ns + name:
                        self._typed_node(t, i)
                        return
            self._store(t)
            return
        self._store(t)

    def _typed_node(self, t: Triple, type_i: int) -> None:
        item = None
        if type_i == T_ITEM:
            for it in self.items:
                if it is not None and it.uri == t.subj:
                    item = it
                    break
        elif type_i == T_ENCLOSURE:
            for it in self.enclosures:
                if it.uri == t.subj:
                    item = it
                    break
            if item is None:
                item = _Item()
                self.enclosures.append(item)
        else:
            item = _Item()
            self.common.setdefault(type_i, []).append(item)
        # URI subjects only, EXACTLY like the reference
        # (raptor_serialize_rss.c:938 `item && subject->type ==
        # RAPTOR_TERM_TYPE_URI`): a bnode-subject typed node leaves the
        # freshly-appended empty item in common/enclosures and falls
        # through to the triple store — reference-faithful, including
        # that side effect
        if item is not None and not t.subj.startswith("_:"):
            item.uri = t.subj
            item.term = t.subj
            self._move_statements(item)
            self.group[item.term] = item
        else:
            self._store(t)

    def _make_field(self, t: Triple, f: int) -> Tuple[int, _Field]:
        field = _Field()
        if t.obj_kind == KIND_URI:
            field.uri = t.obj_lex
        else:
            field.value = t.obj_lex
            if t.obj_datatype == _XMLLIT:
                field.is_xml = True
            if f == F_CONTENT_ENCODED:
                field.is_xml = True
            if f == F_ATOM_SUMMARY and field.value.startswith("<"):
                field.is_xml = True
        return f, field

    def _rewrite_rss_to_atom(self, item: _Item, f: int, field: _Field):
        # Rewrite rss/dc fields to their atom names on intake
        # (raptor_rss10_store_statement :705-733)
        for from_a, to_r, _conv in _ATOM_TO_RSS:
            if _FIELD_NAMES[from_a][1] == ATOM03_NS:
                continue
            if f == to_r and not (
                item.first(from_a) is not None
                and item.first(from_a).value
            ):
                f = from_a
                if (
                    f == F_ATOM_SUMMARY
                    and field.value
                    and field.value.startswith("<")
                ):
                    field.is_xml = True
                field.is_mapped = True
                break
        return f

    def _store(self, t: Triple) -> None:
        item = self.group.get(self._subject_key(t))
        if item is not None and t.obj_kind in (KIND_URI, KIND_LITERAL):
            f = _FIELD_OF_URI.get(t.pred)
            if f is not None:
                f2, field = self._make_field(t, f)
                f2 = self._rewrite_rss_to_atom(item, f2, field)
                item.add_field(f2, field)
                return
        self.pool.append(t)

    # -- post passes --------------------------------------------------------

    def _move_statements(self, item: _Item) -> None:
        for i, t in enumerate(self.pool):
            if t is None or t.subj != item.uri:
                continue
            if t.obj_kind == KIND_BLANK:
                self.group["_:" + t.obj_lex] = item
                item.triples.append(t)
                self.pool[i] = None
                continue
            f = _FIELD_OF_URI.get(t.pred)
            if f is not None:
                f2, field = self._make_field(t, f)
                f2 = self._rewrite_rss_to_atom(item, f2, field)
                item.add_field(f2, field)
                self.pool[i] = None
            else:
                item.triples.append(t)
                self.pool[i] = None

    def _move_anonymous_statements(self) -> None:
        handled = True
        while handled:
            handled = False
            for i, t in enumerate(self.pool):
                if t is None or not t.subj.startswith("_:"):
                    continue
                item = self.group.get(t.subj)
                if item is None:
                    continue
                item.triples.append(t)
                self.pool[i] = None
                if t.obj_kind == KIND_BLANK:
                    self.group["_:" + t.obj_lex] = item
                handled = True

    def _build_items(self) -> None:
        if self.seq_term is None:
            return
        for i, t in enumerate(self.pool):
            if t is None or t.obj_kind != KIND_URI:
                continue
            if t.subj != self.seq_term:
                continue
            if not t.pred.startswith(RDF_NS + "_"):
                continue
            ordinal = check_ordinal(t.pred[len(RDF_NS) + 1:])
            if ordinal < 0:
                continue
            item = _Item()
            item.uri = t.obj_lex
            item.term = t.obj_lex
            while len(self.items) < ordinal:
                self.items.append(None)
            self.items[ordinal - 1] = item
            self.pool[i] = None
            self._move_statements(item)
            self.group[item.term] = item

    def _zero_one(self, item: _Item, f: int) -> None:
        lst = item.fields.get(f)
        if lst and len(lst) > 1:
            del lst[1:]

    def _ensure_valid(self) -> None:
        item = self.channel
        if item is not None:
            if not item.fields.get(F_ATOM_ID):
                item.add_field(F_ATOM_ID, _Field(uri=item.uri))
            if not item.fields.get(F_ATOM_UPDATED):
                item.add_field(
                    F_ATOM_UPDATED, _Field(value=format_iso_date(self.now))
                )
            item.fields.pop(F_ATOM_CONTENT, None)
            item.fields.pop(F_ATOM_SUMMARY, None)
            for f in (F_ATOM_ICON, F_ATOM_LOGO, F_ATOM_RIGHTS,
                      F_ATOM_SUBTITLE):
                self._zero_one(item, f)
        for item in self.items:
            if item is None:
                continue
            if not item.fields.get(F_ATOM_ID):
                item.add_field(F_ATOM_ID, _Field(uri=item.uri))
            if not item.fields.get(F_ATOM_TITLE):
                item.add_field(F_ATOM_TITLE, _Field(value="untitled"))
            if not item.fields.get(F_ATOM_UPDATED):
                item.add_field(
                    F_ATOM_UPDATED, _Field(value=format_iso_date(self.now))
                )
            if not item.fields.get(F_ATOM_CONTENT) and not item.fields.get(
                F_ATOM_LINK
            ):
                item.add_field(F_ATOM_LINK, _Field(uri=item.uri))
            for f in (F_ATOM_PUBLISHED, F_ATOM_RIGHTS, F_ATOM_SOURCE,
                      F_ATOM_SUMMARY):
                self._zero_one(item, f)

    def _remove_mapped(self) -> None:
        def one(item: _Item):
            for f in list(item.fields):
                lst = item.fields[f]
                mapped = [fd for fd in lst if fd.is_mapped]
                plain = [fd for fd in lst if not fd.is_mapped]
                if mapped and plain:
                    item.fields[f] = plain

        for item in self.items:
            if item is not None:
                one(item)
        for lst in self.common.values():
            for item in lst:
                one(item)
        if self.channel is not None:
            one(self.channel)

    # -- emission -----------------------------------------------------------

    def _rel(self, uri: str) -> str:
        return uri_to_relative(self.base, uri) if self.base else uri

    def _emit_atmd(self, w: _XmlWriter, item: _Item) -> None:
        # <at:md> holding the leftover triples as rdfxml-abbrev property
        # elements of the single node (raptor_rss10_emit_rdfxml_item_triples)
        stmts = [t for t in item.triples if t is not None]
        if not stmts:
            return
        w.start("at:md")
        self._emit_abbrev_props(w, item.uri, stmts, set())
        w.end()

    def _emit_abbrev_props(self, w, subject, stmts, seen) -> None:
        for t in stmts:
            if t.subj != subject:
                continue
            if t.pred == RDF_NS + "type":
                continue  # the single node is never written as a typed node
            q = _qname_for(t.pred, self._default_nsid)
            if q is None:
                continue
            if t.obj_kind == KIND_LITERAL:
                w.start(q)
                w.cdata(t.obj_lex)
                w.end()
            elif t.obj_kind == KIND_URI:
                w.empty(q, attrs=[("rdf:resource", self._rel(t.obj_lex))])
            else:
                bkey = "_:" + t.obj_lex
                if bkey in seen:
                    continue
                seen.add(bkey)
                w.start(q)
                btype = next(
                    (
                        s.obj_lex
                        for s in stmts
                        if s.subj == bkey
                        and s.pred == RDF_NS + "type"
                        and s.obj_kind == KIND_URI
                    ),
                    None,
                )
                bq = _qname_for(btype, self._default_nsid) if btype else None
                w.start(bq or "rdf:Description")
                for s in stmts:
                    if s.subj != bkey or s.pred == RDF_NS + "type":
                        continue
                    sq = _qname_for(s.pred, self._default_nsid)
                    if sq is None:
                        continue
                    if s.obj_kind == KIND_LITERAL:
                        w.start(sq)
                        w.cdata(s.obj_lex)
                        w.end()
                    elif s.obj_kind == KIND_URI:
                        w.empty(
                            sq, attrs=[("rdf:resource", self._rel(s.obj_lex))]
                        )
                w.end()
                w.end()

    def _emit_maps(self, w: _XmlWriter) -> None:
        for is_feed, root in ((True, "at:feedmap"), (False, "at:entrymap")):
            w.start(root)
            for from_a, to_r, _conv in _ATOM_TO_RSS:
                if _FIELD_NAMES[from_a][1] == ATOM03_NS:
                    continue
                if is_feed and from_a not in _FEEDMAP_FROM:
                    continue
                prefix = _NS_PREFIX.get(_FIELD_NAMES[from_a][1])
                if not prefix:
                    continue
                prop = self._rel(_field_uri(to_r))
                w.start(root, attrs=[("property", prop)])
                w.cdata("%s:%s" % (prefix, _FIELD_NAMES[from_a][0]))
                w.end()
            w.end()

    def _emit_author(self, w: _XmlWriter, channel: _Item) -> None:
        lst = self.common.get(T_ATOM_AUTHOR)
        if not lst:
            author = _Item()
            self.common[T_ATOM_AUTHOR] = [author]
            name = channel.fields.pop(F_ATOM_NAME, None)
            author.add_field(
                F_ATOM_NAME,
                name[0] if name else _Field(value="unknown"),
            )
            for f in (F_ATOM_URI, F_ATOM_EMAIL):
                moved = channel.fields.pop(f, None)
                if moved:
                    for fd in moved:
                        author.add_field(f, fd)
            lst = [author]
        self._emit_item(w, lst[0], T_ATOM_AUTHOR, emit_container=True)

    def _emit_item(self, w, item: _Item, item_type: int,
                   emit_container: bool) -> None:
        if not item.fields_count:
            return
        if emit_container:
            typei = item_type
            if typei == T_CHANNEL:
                typei = T_ATOM_FEED
            elif typei == T_ITEM:
                typei = T_ATOM_ENTRY
            name, nsid, _c, _cf, _pf = _TYPES[typei]
            w.start(name)  # atom default namespace element
        for f in range(len(_FIELD_NAMES)):
            if f == F_ITEMS or _field_uri(f) is None:
                continue
            if f == F_ATOM_AUTHOR:
                if item_type == T_CHANNEL:
                    self._emit_author(w, item)
                continue
            if f == F_DESCRIPTION:
                continue  # atom prefers atom:summary
            for field in item.fields.get(f, []):
                name, nsid, _fl, _bt = _FIELD_NAMES[f]
                prefix = _NS_PREFIX.get(nsid)
                tag = (
                    name if nsid == ATOM10_NS
                    else "%s:%s" % (prefix, name) if prefix else None
                )
                if tag is None:
                    continue
                if field.uri is not None:
                    ruri = (
                        field.uri if f == F_ATOM_ID else self._rel(field.uri)
                    )
                    if f == F_ATOM_LINK and not item.fields.get(
                        F_ATOM_CONTENT
                    ):
                        w.empty(tag, attrs=[("href", ruri),
                                            ("rel", "alternate")])
                    elif f == F_ATOM_CONTENT:
                        ctf = item.fields.get(F_AT_CONTENT_TYPE)
                        ctype = (
                            ctf[0].value
                            if ctf and ctf[0].value
                            else "text/html"
                        )
                        item.fields.pop(F_AT_CONTENT_TYPE, None)
                        w.empty(tag, attrs=[("src", ruri), ("type", ctype)])
                    else:
                        w.start(tag)
                        w.cdata(ruri)
                        w.end()
                elif field.value is not None:
                    if field.is_xml:
                        w.start(tag, attrs=[("type", "xhtml")])
                        w.raw(field.value)
                        w.end()
                    else:
                        w.start(tag)
                        w.cdata(field.value)
                        w.end()
        if item_type == T_CHANNEL:
            w.empty(
                "link",
                attrs=[("href", self._rel(item.uri) if item.uri else ""),
                       ("rel", "self")],
            )
            self._emit_maps(w)
        self._emit_atmd(w, item)
        if emit_container:
            w.end()

    def to_xml(self) -> str:
        self._build_items()
        # leftover + anonymous moves (raptor_rss10_serialize_end order)
        for item in self.items:
            if item is not None:
                self._move_statements(item)
        if self.common.get(T_CHANNEL):
            self.channel = self.common[T_CHANNEL][0]
            self._move_statements(self.channel)
        self._move_anonymous_statements()

        if self.channel is None:
            raise ValueError("No RSS channel found")

        self._ensure_valid()
        self._remove_mapped()

        entry_item = None
        if self.entry_uri:
            for item in self.items:
                if item is not None and item.uri == self.entry_uri:
                    entry_item = item
                    break

        # root declarations (raptor_rss10_build_xml_names:1121-1146): the
        # atom namespace is the DEFAULT namespace (its table prefix is
        # dropped), so xmlns:atom appears only when the input document
        # declared it; dedup is by prefix (raptor_xml_element_declare_
        # namespace)
        w = _XmlWriter()
        nsdecls = [(None, _NS_URI[ATOM10_NS])]
        for nsid in sorted(_NS_PREFIX):
            if _NS_URI.get(nsid) and nsid != ATOM10_NS:
                nsdecls.append((_NS_PREFIX[nsid], _NS_URI[nsid]))
        seen_prefixes = {p for p, _u in nsdecls}
        for prefix, uri in self.user_namespaces:
            if prefix and prefix not in seen_prefixes:
                nsdecls.append((prefix, uri))
                seen_prefixes.add(prefix)
        root = "entry" if entry_item is not None else "feed"
        w.start(root, nsdecls=nsdecls)
        if entry_item is not None:
            self._emit_item(w, entry_item, T_ITEM, emit_container=False)
            w.raw("\n")
        else:
            self._emit_item(w, self.channel, T_CHANNEL, emit_container=False)
            w.raw("\n")
            for item in self.items:
                if item is not None:
                    self._emit_item(w, item, T_ITEM, emit_container=True)
                    w.raw("\n")
        w.end()
        return w.getvalue() + "\n"


def to_atom(
    triples: Iterable[Triple],
    namespaces: Iterable[Tuple[Optional[str], str]] = (),
    base_uri: Optional[str] = None,
    entry_uri: Optional[str] = None,
    now: int = 0,
) -> str:
    """Serialize triples (fed in document order) to Atom 1.0 with
    atom-triples maps, like rapper -o atom -f rssTriples=atom-triples."""
    ser = AtomSerializer(base_uri=base_uri, entry_uri=entry_uri, now=now)
    for prefix, uri in namespaces:
        if not any(
            p == prefix or u == uri for p, u in ser.user_namespaces
        ):
            ser.user_namespaces.append((prefix or None, uri))
    for t in triples:
        ser.statement(t)
    return ser.to_xml()


# -- rss-1.0 mode ----------------------------------------------------------

from raptor_spark.kernel.rss import (  # noqa: E402 (near first use)
    F_RDF_ENCLOSURE_LENGTH,
    F_RDF_ENCLOSURE_TYPE,
    F_RDF_ENCLOSURE_URL,
)

from raptor_spark.kernel.rss import RSS10_NS  # noqa: E402


class Rss10Serializer(AtomSerializer):
    """rss-1.0 mode of the shared feed serializer: the ``is_atom == 0``
    paths of src/raptor_serialize_rss.c. Shares statement intake and the
    build/move passes with the atom mode, but:

    - no rss->atom field rewriting at intake (the ``if(is_atom)`` guard
      around the raptor_atom_to_rss rewrite, :385/:705);
    - no ensure_atom_feed_valid / remove_mapped_fields passes
      (raptor_rss10_serialize_end :2167 runs them only when is_atom);
    - root element is ``rdf:RDF`` with the rss-1.0 namespace as the
      default xmlns (raptor_rss10_build_xml_names :1058-1069);
    - channel/items emit as RSS 1.0 typed nodes with ``rdf:about``, the
      channel carries the <items><rdf:Seq><rdf:li/>..</rdf:Seq></items>
      block (raptor_rss10_emit_rss_items :1376-1458);
    - leftover triples emit inline as rdfxml-abbrev property elements
      with no <at:md> wrapper when rss_triples == "rdf-xml"
      (raptor_rss10_emit_rdfxml_item_triples :1482 gates mode 1 to the
      rss serializer, mode 2 to atom).

    Note: the ``f == RAPTOR_RSS_FIELD_ENCLOSURE`` emit branch in the C
    (:2004-2050, the enc:type/enc:length attribute form) is unreachable
    there — field 23 has RSS2_0_NS == RSS_NO_NS so it has no field URI
    and intake can never store it; the enclosure link arrives as field
    24 (enc:enclosure) and emits through the generic rdf:resource form,
    which is what this writer does. The fields-less-item enclosure
    conflation (:1762-1788) IS reachable and is replicated.
    """

    def __init__(
        self,
        base_uri: Optional[str] = None,
        rss_triples: str = "rdf-xml",
        now: int = 0,
    ):
        super().__init__(base_uri=base_uri, now=now)
        self._default_nsid = RSS10_NS
        self.rss_triples = rss_triples

    def _rewrite_rss_to_atom(self, item: _Item, f: int, field: _Field):
        return f  # no field rewriting outside atom mode

    def _field_tag(self, f: int) -> Optional[str]:
        name, nsid, _fl, _bt = _FIELD_NAMES[f]
        if nsid == RSS10_NS:
            return name  # default namespace
        prefix = _NS_PREFIX.get(nsid)
        return "%s:%s" % (prefix, name) if prefix else None

    def _emit_atmd(self, w: _XmlWriter, item: _Item) -> None:
        # rdf-xml triples mode: abbrev property elements inline, no
        # <at:md> wrapper (that wrapper is atom-only)
        if self.rss_triples != "rdf-xml":
            return
        stmts = [t for t in item.triples if t is not None]
        if not stmts:
            return
        self._emit_abbrev_props(w, item.uri, stmts, set())

    def _conflate_enclosure(self, item: _Item) -> None:
        for encl in self.enclosures:
            if encl.uri and item.uri == encl.uri:
                for f in list(encl.fields):
                    if f in (F_RDF_ENCLOSURE_TYPE, F_RDF_ENCLOSURE_LENGTH,
                             F_RDF_ENCLOSURE_URL):
                        continue
                    for fd in encl.fields.pop(f):
                        item.add_field(f, fd)
                break

    def _emit_rss_items(self, w: _XmlWriter) -> None:
        items = [it for it in self.items if it is not None]
        if not items:
            return
        w.start("items")
        w.start("rdf:Seq")
        for it in items:
            w.empty("rdf:li", attrs=[("rdf:resource", self._rel(it.uri))])
        w.end()
        w.end()

    def _emit_item(self, w, item: _Item, item_type: int,
                   emit_container: bool) -> None:
        if not item.fields_count:
            self._conflate_enclosure(item)
        if not item.fields_count:
            return
        if emit_container:
            name, nsid, _c, _cf, _pf = _TYPES[item_type]
            tag = name if nsid == RSS10_NS else (
                "%s:%s" % (_NS_PREFIX[nsid], name)
                if _NS_PREFIX.get(nsid) else name
            )
            attrs = []
            if item.uri:
                attrs.append(("rdf:about", self._rel(item.uri)))
            w.start(tag, attrs=attrs)
        for f in range(len(_FIELD_NAMES)):
            if f == F_ITEMS or _field_uri(f) is None:
                continue
            if f == F_ATOM_AUTHOR:
                continue  # "rss 1.0 ignores atom:author for now" (:2300)
            tag = self._field_tag(f)
            if tag is None:
                continue
            for field in item.fields.get(f, []):
                if field.uri is not None:
                    w.empty(
                        tag, attrs=[("rdf:resource", self._rel(field.uri))]
                    )
                elif field.value is not None:
                    prefer_cdata = f == F_CONTENT_ENCODED
                    if field.is_xml and not prefer_cdata:
                        w.start(tag, attrs=[("rdf:parseType", "Literal")])
                        w.raw(field.value)
                        w.end()
                    elif field.is_xml:
                        w.start(tag)
                        w.raw("<![CDATA[" + field.value + "]]>")
                        w.end()
                    else:
                        w.start(tag)
                        w.cdata(field.value)
                        w.end()
        if item_type == T_CHANNEL:
            self._emit_rss_items(w)
        self._emit_atmd(w, item)
        if emit_container:
            w.end()

    def to_xml(self) -> str:
        self._build_items()
        for item in self.items:
            if item is not None:
                self._move_statements(item)
        if self.common.get(T_CHANNEL):
            self.channel = self.common[T_CHANNEL][0]
            self._move_statements(self.channel)
        self._move_anonymous_statements()

        if self.channel is None:
            raise ValueError("No RSS channel found")

        w = _XmlWriter()
        nsdecls = [(None, _NS_URI[RSS10_NS])]
        for nsid in sorted(_NS_PREFIX):
            if _NS_URI.get(nsid) and nsid != RSS10_NS:
                nsdecls.append((_NS_PREFIX[nsid], _NS_URI[nsid]))
        seen_prefixes = {p for p, _u in nsdecls}
        for prefix, uri in self.user_namespaces:
            if prefix and prefix not in seen_prefixes:
                nsdecls.append((prefix, uri))
                seen_prefixes.add(prefix)
        w.start("rdf:RDF", nsdecls=nsdecls)
        self._emit_item(w, self.channel, T_CHANNEL, emit_container=True)
        w.raw("\n")
        for item in self.items:
            if item is not None:
                self._emit_item(w, item, T_ITEM, emit_container=True)
                w.raw("\n")
        for typei in range(T_CHANNEL + 1, len(_TYPES)):
            if typei == T_ATOM_AUTHOR:
                continue
            for item in self.common.get(typei, []):
                self._emit_item(w, item, typei, emit_container=True)
        w.end()
        return w.getvalue() + "\n"


def to_rss10(
    triples: Iterable[Triple],
    namespaces: Iterable[Tuple[Optional[str], str]] = (),
    base_uri: Optional[str] = None,
    rss_triples: str = "rdf-xml",
    now: int = 0,
) -> str:
    """Serialize triples (fed in document order) to RSS 1.0 XML, like
    rapper -o rss-1.0 -f rssTriples=rdf-xml."""
    ser = Rss10Serializer(base_uri=base_uri, rss_triples=rss_triples,
                          now=now)
    for prefix, uri in namespaces:
        if not any(
            p == prefix or u == uri for p, u in ser.user_namespaces
        ):
            ser.user_namespaces.append((prefix or None, uri))
    for t in triples:
        ser.statement(t)
    return ser.to_xml()
