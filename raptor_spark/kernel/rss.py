"""rss-tag-soup parse kernel (pure Python, expat-backed).

Re-expresses the reference's feed parser (dajobe/raptor:
src/raptor_rss.c + the model/tables in src/raptor_rss_common.c and
src/raptor_rss.h) as a single-pass SAX processor that accepts the whole
RSS family "tag soup" — RSS 0.9/0.91/0.92/1.0/1.1/2.0 and Atom 0.3/1.0 —
and emits the RSS-1.0-in-RDF triple model:

- containers (channel/item/image/textinput/atom author/...) become typed
  nodes; the element tables are transcriptions of
  raptor_rss_items_info / raptor_rss_fields_info / the block-field table
  (src/raptor_rss_common.c:120-290) including namespace promotion
  (RSS 0.9 & 1.1 -> RSS 1.0, Atom 0.3 -> 1.0, raptor_rss.c:321-341);
- metadata blocks (atom:link, enclosure, atom:category, atom:source) get
  bnode subjects with attribute-derived fields (raptor_rss.c:536-600);
- identifiers come from rdf:about, rss:link / image url, atom:id, or an
  atom:link[@rel=self]/@href, else a fresh bnode
  (raptor_rss_insert_identifiers, raptor_rss.c:1008-1128);
- atom fields are uplifted to their RSS/DC clones (raptor_atom_to_rss,
  raptor_rss_common.c:204-234), with RSS 2.0 pubDate converted to an
  ISO8601 dc:date exactly like parsedate.y + RAPTOR_ISO_DATE_FORMAT
  (raptor_rss_common.c:668-724);
- the channel links items through an rdf:Seq of rdf:_N ordinals and the
  other containers through their type URIs (raptor_rss_emit,
  raptor_rss.c:1362-1476);
- atom content typed xhtml/xml/*+xml is captured as serialized XML
  (raptor_rss.c:654-686).

Conformance gate: the reference's tests/feeds suite — the rss-tag-soup
inputs (test04/test05.atom) must produce graphs isomorphic to the
committed -result.ttl goldens (tests/test_kernel_rss.py).
"""

from __future__ import annotations

import calendar
import time
import xml.parsers.expat
from email.utils import parsedate_tz
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

# -- namespace ids (raptor_rss.h:91-111; RSS 0.92 / 2.0 have no ns) ------
UNKNOWN_NS = 0
NO_NS = 1
RSS091_NS = 2
RSS09_NS = 3
RSS10_NS = 4
ATOM03_NS = 5
DC_NS = 6
ENC_NS = 7
RSS11_NS = 8
CONTENT_NS = 9
ATOM10_NS = 10
RDFNS = 11
AT_NS = 12
ITUNES_NS = 13

_NS_PREFIX: Dict[int, Optional[str]] = {
    RSS091_NS: "rss091",
    RSS10_NS: "rss",
    DC_NS: "dc",
    ENC_NS: "enc",
    CONTENT_NS: "content",
    ATOM10_NS: "atom",
    RDFNS: "rdf",
    AT_NS: "at",
    ITUNES_NS: "itunes",
}

_NS_URI: Dict[int, Optional[str]] = {
    UNKNOWN_NS: None,
    NO_NS: None,
    RSS091_NS: "http://purl.org/rss/1.0/modules/rss091#",
    RSS09_NS: "http://my.netscape.com/rdf/simple/0.9/",
    RSS10_NS: "http://purl.org/rss/1.0/",
    ATOM03_NS: "http://purl.org/atom/ns#",
    DC_NS: "http://purl.org/dc/elements/1.1/",
    ENC_NS: "http://purl.oclc.org/net/rss_2.0/enc#",
    RSS11_NS: "http://purl.org/net/rss1.1#",
    CONTENT_NS: "http://purl.org/rss/1.0/modules/content/",
    ATOM10_NS: "http://www.w3.org/2005/Atom",
    RDFNS: RDF_NS,
    AT_NS: "http://purl.org/syndication/atomtriples/1",
    ITUNES_NS: "http://www.itunes.com/dtds/podcast-1.0.dtd",
}

# element namespaces that match fields declared with no/RSS-ish namespace
_RSSISH_NS = (NO_NS, RSS10_NS, RSS091_NS, RSS09_NS, RSS11_NS)

_URI_VALUE = 1
_BLOCK_VALUE = 2

# -- container/type ids (raptor_rss.h:34-73) ------------------------------
T_CHANNEL = 0
T_IMAGE = 1
T_TEXTINPUT = 2
T_ITEM = 3
T_ATOM_AUTHOR = 4
T_ATOM_LINK = 5
T_ITUNES_OWNER = 6
T_SKIPHOURS = 7
T_SKIPDAYS = 8
T_ENCLOSURE = 9
T_ATOM_CATEGORY = 10
T_SOURCE = 11
T_FEED = 12
T_ENTRY = 13
T_NONE = 14
_COMMON_IGNORED = T_SKIPHOURS  # skipHours/skipDays parsed but not emitted

# -- field ids: transcription of raptor_rss_fields_info in table order ----
_FIELD_NAMES = [
    # (name, nsid, flags, block_type)
    ("title", RSS10_NS, 0, None),            # 0  TITLE
    ("link", RSS10_NS, 0, None),             # 1  LINK (spec'd literal)
    ("description", RSS10_NS, 0, None),      # 2  DESCRIPTION
    ("url", RSS10_NS, 0, None),              # 3  URL
    ("name", RSS10_NS, 0, None),             # 4  NAME
    ("language", RSS091_NS, 0, None),        # 5
    ("rating", RSS091_NS, 0, None),          # 6
    ("copyright", RSS091_NS, 0, None),       # 7
    ("pubDate", RSS091_NS, 0, None),         # 8  PUBDATE
    ("lastBuildDate", RSS091_NS, 0, None),   # 9
    ("docs", RSS091_NS, _URI_VALUE, None),   # 10
    ("managingEditor", RSS091_NS, 0, None),  # 11
    ("webMaster", RSS091_NS, 0, None),       # 12
    ("cloud", NO_NS, 0, None),               # 13
    ("ttl", NO_NS, 0, None),                 # 14
    ("width", RSS091_NS, 0, None),           # 15
    ("height", RSS091_NS, 0, None),          # 16
    ("hour", RSS091_NS, 0, None),            # 17
    ("day", RSS091_NS, 0, None),             # 18
    ("generator", NO_NS, 0, None),           # 19
    ("source", NO_NS, 0, None),              # 20
    ("author", NO_NS, 0, None),              # 21
    ("guid", NO_NS, 0, None),                # 22
    ("enclosure", NO_NS, _BLOCK_VALUE, T_ENCLOSURE),  # 23
    ("enclosure", ENC_NS, 0, None),          # 24 RDF_ENCLOSURE
    ("Enclosure", ENC_NS, 0, None),          # 25 RDF_ENCLOSURE_CLASS
    ("url", ENC_NS, 0, None),                # 26 RDF_ENCLOSURE_URL
    ("length", ENC_NS, 0, None),             # 27 RDF_ENCLOSURE_LENGTH
    ("type", ENC_NS, 0, None),               # 28 RDF_ENCLOSURE_TYPE
    ("length", NO_NS, 0, None),              # 29
    ("type", NO_NS, 0, None),                # 30
    ("category", NO_NS, 0, None),            # 31
    ("comments", NO_NS, 0, None),            # 32
    ("items", RSS10_NS, 0, None),            # 33 ITEMS
    ("image", RSS10_NS, 0, None),            # 34
    ("textinput", RSS10_NS, 0, None),        # 35
    ("copyright", ATOM03_NS, 0, None),       # 36 ATOM_COPYRIGHT
    ("created", ATOM03_NS, 0, None),         # 37
    ("issued", ATOM03_NS, 0, None),          # 38
    ("modified", ATOM03_NS, 0, None),        # 39
    ("tagline", ATOM03_NS, 0, None),         # 40 ATOM_TAGLINE
    ("id", ATOM10_NS, _URI_VALUE, None),     # 41 ATOM_ID
    ("title", ATOM10_NS, 0, None),           # 42 ATOM_TITLE
    ("updated", ATOM10_NS, 0, None),         # 43 ATOM_UPDATED
    ("author", ATOM10_NS, 0, None),          # 44 ATOM_AUTHOR (container)
    ("category", ATOM10_NS, _BLOCK_VALUE, T_ATOM_CATEGORY),  # 45
    ("content", ATOM10_NS, 0, None),         # 46 ATOM_CONTENT
    ("contributor", ATOM10_NS, 0, None),     # 47
    ("email", ATOM10_NS, 0, None),           # 48
    ("entry", ATOM10_NS, 0, None),           # 49
    ("feed", ATOM10_NS, 0, None),            # 50
    ("generator", ATOM10_NS, 0, None),       # 51
    ("icon", ATOM10_NS, _URI_VALUE, None),   # 52
    ("link", ATOM10_NS, _BLOCK_VALUE, T_ATOM_LINK),  # 53 ATOM_LINK
    ("logo", ATOM10_NS, _URI_VALUE, None),   # 54
    ("name", ATOM10_NS, 0, None),            # 55
    ("published", ATOM10_NS, 0, None),       # 56
    ("rights", ATOM10_NS, 0, None),          # 57 ATOM_RIGHTS
    ("source", ATOM10_NS, _BLOCK_VALUE, T_SOURCE),  # 58
    ("subtitle", ATOM10_NS, 0, None),        # 59 ATOM_SUBTITLE
    ("summary", ATOM10_NS, 0, None),         # 60 ATOM_SUMMARY
    ("uri", ATOM10_NS, 0, None),             # 61
    ("Author", ATOM10_NS, 0, None),          # 62 ATOM_AUTHOR_CLASS
    ("Category", ATOM10_NS, 0, None),        # 63 ATOM_CATEGORY_CLASS
    ("Link", ATOM10_NS, 0, None),            # 64 ATOM_LINK_CLASS
    ("label", ATOM10_NS, 0, None),           # 65
    ("scheme", ATOM10_NS, _URI_VALUE, None),  # 66
    ("term", ATOM10_NS, 0, None),            # 67
    ("href", ATOM10_NS, _URI_VALUE, None),   # 68
    ("rel", ATOM10_NS, 0, None),             # 69
    ("type", ATOM10_NS, 0, None),            # 70
    ("hreflang", ATOM10_NS, 0, None),        # 71
    ("length", ATOM10_NS, 0, None),          # 72
    ("title", DC_NS, 0, None),               # 73
    ("contributor", DC_NS, 0, None),         # 74
    ("creator", DC_NS, 0, None),             # 75
    ("publisher", DC_NS, 0, None),           # 76
    ("subject", DC_NS, 0, None),             # 77
    ("description", DC_NS, 0, None),         # 78
    ("date", DC_NS, 0, None),                # 79 DC_DATE
    ("type", DC_NS, 0, None),                # 80
    ("format", DC_NS, 0, None),              # 81
    ("identifier", DC_NS, 0, None),          # 82
    ("language", DC_NS, 0, None),            # 83
    ("relation", DC_NS, 0, None),            # 84
    ("source", DC_NS, 0, None),              # 85
    ("coverage", DC_NS, 0, None),            # 86
    ("rights", DC_NS, 0, None),              # 87 DC_RIGHTS
    ("encoded", CONTENT_NS, 0, None),        # 88 CONTENT_ENCODED
    ("contentType", AT_NS, 0, None),         # 89
    ("author", ITUNES_NS, 0, None),          # 90
    ("subtitle", ITUNES_NS, 0, None),        # 91
    ("summary", ITUNES_NS, 0, None),         # 92
    ("keywords", ITUNES_NS, 0, None),        # 93
    ("explicit", ITUNES_NS, 0, None),        # 94
    ("image", ITUNES_NS, 0, None),           # 95
    ("name", ITUNES_NS, 0, None),            # 96
    ("owner", ITUNES_NS, 0, None),           # 97
    ("block", ITUNES_NS, 0, None),           # 98
    ("category", ITUNES_NS, 0, None),        # 99
    ("email", ITUNES_NS, 0, None),           # 100
]

F_TITLE = 0
F_LINK = 1
F_DESCRIPTION = 2
F_URL = 3
F_PUBDATE = 8
F_GUID = 22
F_ITEMS = 33
F_ATOM_COPYRIGHT = 36
F_ATOM_TAGLINE = 40
F_ATOM_ID = 41
F_ATOM_TITLE = 42
F_ATOM_UPDATED = 43
F_ATOM_AUTHOR = 44
F_ATOM_LINK = 53
F_ATOM_RIGHTS = 57
F_ATOM_SUBTITLE = 59
F_ATOM_SUMMARY = 60
F_ATOM_AUTHOR_CLASS = 62
F_ATOM_CATEGORY_CLASS = 63
F_ATOM_LINK_CLASS = 64
F_ATOM_LABEL = 65
F_ATOM_SCHEME = 66
F_ATOM_TERM = 67
F_ATOM_HREF = 68
F_ATOM_REL = 69
F_ATOM_TYPE = 70
F_ATOM_HREFLANG = 71
F_ATOM_LENGTH = 72
F_DC_DATE = 79
F_DC_RIGHTS = 87
F_CONTENT_ENCODED = 88
F_RDF_ENCLOSURE = 24
F_RDF_ENCLOSURE_CLASS = 25
F_RDF_ENCLOSURE_URL = 26
F_RDF_ENCLOSURE_LENGTH = 27
F_RDF_ENCLOSURE_TYPE = 28
F_SOURCE = 20
F_NONE = -1
F_UNKNOWN = -2


def _field_uri(f: int) -> Optional[str]:
    if f is None or f < 0:
        return None
    name, nsid, _flags, _bt = _FIELD_NAMES[f]
    ns = _NS_URI[nsid]
    return (ns + name) if ns else None


# (name, nsid, is_container, rdf_class_field, predicate_field)
# raptor_rss_items_info (raptor_rss_common.c:120-140)
_TYPES = [
    ("channel", RSS10_NS, True, F_NONE, F_NONE),
    ("image", RSS10_NS, True, F_NONE, F_NONE),
    ("textinput", RSS10_NS, True, F_NONE, F_NONE),
    ("item", RSS10_NS, True, F_NONE, F_NONE),
    ("author", ATOM10_NS, True, F_ATOM_AUTHOR_CLASS, F_ATOM_AUTHOR),
    ("Link", ATOM10_NS, False, F_ATOM_LINK_CLASS, F_ATOM_LINK),
    ("owner", ITUNES_NS, True, 97, 97),
    ("skipHours", RSS091_NS, True, F_NONE, F_NONE),
    ("skipDays", RSS091_NS, True, F_NONE, F_NONE),
    ("Enclosure", ENC_NS, False, F_RDF_ENCLOSURE_CLASS, F_RDF_ENCLOSURE),
    ("category", ATOM10_NS, False, F_ATOM_CATEGORY_CLASS, 45),
    ("source", NO_NS, False, F_SOURCE, F_NONE),
    ("feed", ATOM10_NS, True, F_NONE, F_NONE),
    ("entry", ATOM10_NS, True, F_NONE, F_NONE),
]


def _type_uri(t: int) -> Optional[str]:
    name, nsid, _c, _cf, _pf = _TYPES[t]
    ns = _NS_URI[nsid]
    return (ns + name) if ns else None


# block attribute table (raptor_rss_block_fields_info,
# raptor_rss_common.c:237-290): (type, attribute, is_url, offset, field)
_URLV = "url"
_STRV = "str"
_BLOCK_FIELDS = [
    (T_ENCLOSURE, "url", _URLV, 0, F_RDF_ENCLOSURE_URL),
    (T_ENCLOSURE, "length", _STRV, 0, F_RDF_ENCLOSURE_LENGTH),
    (T_ENCLOSURE, "type", _STRV, 1, F_RDF_ENCLOSURE_TYPE),
    # RSS 2 <source url=...>: the C row leaves the output field
    # zero-initialized, i.e. field index 0 (rss:title)
    (T_SOURCE, "url", _URLV, 0, F_TITLE),
    (T_ATOM_CATEGORY, "term", _STRV, 0, F_ATOM_TERM),
    (T_ATOM_CATEGORY, "scheme", _URLV, 0, F_ATOM_SCHEME),
    (T_ATOM_CATEGORY, "label", _STRV, 1, F_ATOM_LABEL),
    (T_ATOM_LINK, "href", _URLV, 0, F_ATOM_HREF),
    (T_ATOM_LINK, "rel", _STRV, 0, F_ATOM_REL),
    (T_ATOM_LINK, "type", _STRV, 1, F_ATOM_TYPE),
    (T_ATOM_LINK, "hreflang", _STRV, 2, F_ATOM_HREFLANG),
    (T_ATOM_LINK, "title", _STRV, 3, F_ATOM_TITLE),
    (T_ATOM_LINK, "length", _STRV, 4, F_ATOM_LENGTH),
    (T_ATOM_LINK, None, _URLV, 0, F_ATOM_HREF),
]

# atom -> rss/dc uplift pairs (raptor_atom_to_rss,
# raptor_rss_common.c:204-234); "date" marks the parsedate conversion
_ATOM_TO_RSS: List[Tuple[int, int, Optional[str]]] = [
    (F_ATOM_SUMMARY, F_DESCRIPTION, None),
    (F_ATOM_ID, F_LINK, None),
    (F_ATOM_UPDATED, F_DC_DATE, None),
    (F_ATOM_RIGHTS, F_DC_RIGHTS, None),
    (F_ATOM_TITLE, F_TITLE, None),
    (F_ATOM_SUMMARY, F_CONTENT_ENCODED, None),
    (F_ATOM_COPYRIGHT, F_ATOM_RIGHTS, None),
    (F_ATOM_TAGLINE, F_ATOM_SUBTITLE, None),
    (F_PUBDATE, F_DC_DATE, "date"),
    (F_DESCRIPTION, F_CONTENT_ENCODED, None),
]

_ISO_FORMATS = (
    "%Y-%m-%dT%H:%M:%SZ",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d",
)


def parse_date(s: str) -> Optional[int]:
    """RFC822/ISO8601 date string -> unix seconds (parsedate.y subset:
    the grammar accepts both mail-style and ISO timestamps)."""
    s = s.strip()
    if not s:
        return None
    tt = parsedate_tz(s)
    if tt is not None and tt[0] > 31:
        from email.utils import mktime_tz

        try:
            return int(mktime_tz(tt))
        except (ValueError, OverflowError):
            return None
    iso = s
    offset = 0
    if (
        len(iso) >= 6
        and iso[-3] == ":"
        and iso[-6] in "+-"
        # digits required: a malformed date whose tail merely SHAPES
        # like an offset ('foo-ab:cd') must fall through to the format
        # loop and return None (the reference's parsedate grammar just
        # fails to match), not raise ValueError out of the kernel
        and iso[-5:-3].isdigit()
        and iso[-2:].isdigit()
    ):
        sign = -1 if iso[-6] == "-" else 1
        offset = sign * (int(iso[-5:-3]) * 3600 + int(iso[-2:]) * 60)
        iso = iso[:-6]
    for fmt in _ISO_FORMATS:
        try:
            return int(calendar.timegm(time.strptime(iso, fmt))) - offset
        except ValueError:
            continue
    return None


def format_iso_date(unix_time: int) -> str:
    """RAPTOR_ISO_DATE_FORMAT (raptor_rss_common.c:668)."""
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(unix_time))


from raptor_spark.kernel.terms import (  # noqa: E402
    xml_escape_attr as _xml_attr_escape,
    xml_escape_text as _xml_escape,
)


class _Field:
    __slots__ = ("value", "uri", "is_xml", "is_mapped")

    def __init__(self, value=None, uri=None):
        self.value = value
        self.uri = uri
        self.is_xml = False
        self.is_mapped = False


class _Block:
    __slots__ = ("rss_type", "identifier", "urls", "strings", )

    def __init__(self, rss_type, identifier):
        self.rss_type = rss_type
        self.identifier = identifier  # bnode label "_:genidN"
        self.urls: Dict[int, str] = {}
        self.strings: Dict[int, str] = {}


class _Item:
    __slots__ = ("fields", "blocks", "uri", "term", "typei", "triples")

    def __init__(self):
        self.fields: Dict[int, List[_Field]] = {}
        self.blocks: List[_Block] = []
        self.uri: Optional[str] = None
        self.term: Optional[str] = None  # URI or "_:label"
        self.typei: Optional[int] = None
        self.triples: list = []  # leftover statements (serializer model)

    @property
    def fields_count(self) -> int:
        return len(self.fields)

    def add_field(self, f: int, field: _Field) -> None:
        self.fields.setdefault(f, []).append(field)

    def first(self, f: int) -> Optional[_Field]:
        lst = self.fields.get(f)
        return lst[0] if lst else None


class RssParser:
    def __init__(self, base_uri: Optional[str]):
        self.base = base_uri or ""
        self.triples: List[Triple] = []
        self.errors: List[dict] = []
        self._bnode_n = 0
        self.is_atom = False
        self.current_type = T_NONE
        self.prev_type = T_NONE
        self.current_field = F_NONE
        self.current_block: Optional[_Block] = None
        self.common: Dict[int, List[_Item]] = {}
        self.items: List[_Item] = []
        # namespaces to declare to a serializer (raptor_rss.c
        # nspaces_seen + raptor_rss_start_namespaces): marked by field/
        # block/uplift processing — and by the quirky xmlns handler
        # (raptor_rss.c:924-949) that marks the FIRST table namespace
        # differing from each declared one (i.e. rss091, practically)
        self.nspaces_seen: set = set()
        # per-element: [name, text_parts, uri, xml_mode, had_cdata]
        self._stack: List[list] = []
        self._ns_stack: List[Dict[str, Optional[str]]] = [{}]
        self._xml_buf: Optional[List[str]] = None
        self._xml_owner_depth = -1

        self.p = xml.parsers.expat.ParserCreate()
        self.p.ordered_attributes = True
        self.p.buffer_text = True
        self.p.StartElementHandler = self._start
        self.p.EndElementHandler = self._end
        self.p.CharacterDataHandler = self._cdata

    # -- helpers ----------------------------------------------------------

    def _bnode(self) -> str:
        self._bnode_n += 1
        return "_:genid%d" % self._bnode_n

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

    def _emit_res(self, s, p, o):
        if s is None or p is None or o is None:
            return
        kind = KIND_BLANK if o.startswith("_:") else KIND_URI
        lex = o[2:] if kind == KIND_BLANK else o
        self.triples.append(Triple(s, p, kind, lex, None, None, None))

    def _get_current_item(self) -> Optional[_Item]:
        if self.current_type == T_ITEM:
            return self.items[-1] if self.items else None
        lst = self.common.get(self.current_type)
        return lst[-1] if lst else None

    def _add_container(self, local: str) -> bool:
        t = T_NONE
        if local in ("rss", "rdf", "RDF"):
            pass
        elif local.lower() == "channel":
            t = T_CHANNEL
        elif local == "feed":
            t = T_CHANNEL
            self.is_atom = True
        elif local == "item":
            t = T_ITEM
        elif local == "entry":
            t = T_ITEM
            self.is_atom = True
        else:
            for i, (name, _ns, is_cont, _cf, _pf) in enumerate(_TYPES):
                if not is_cont:
                    continue
                if local == name and (
                    i != T_ATOM_AUTHOR or self.is_atom
                ):
                    t = i
                    break
        if t != T_NONE:
            if t == T_ITEM:
                self.items.append(_Item())
            else:
                self.common.setdefault(t, []).append(_Item())
            if self.current_type != T_NONE:
                self.prev_type = self.current_type
            self.current_type = t
            return True
        return False

    # -- SAX --------------------------------------------------------------

    def _split_name(self, name: str, scope, is_attr=False):
        if ":" in name:
            prefix, _, local = name.partition(":")
            return local, scope.get(prefix)
        return name, (None if is_attr else scope.get(""))

    def _start(self, name, attr_list):
        attrs: List[Tuple[str, str]] = [
            (attr_list[i], attr_list[i + 1])
            for i in range(0, len(attr_list), 2)
        ]
        scope = self._ns_stack[-1]
        new_scope = None
        for k, v in attrs:
            if k == "xmlns" or k.startswith("xmlns:"):
                new_scope = dict(scope) if new_scope is None else new_scope
                new_scope[k[6:] if k.startswith("xmlns:") else ""] = v
                for nsid in sorted(_NS_URI):
                    if _NS_URI[nsid] is not None and _NS_URI[nsid] != v:
                        self.nspaces_seen.add(nsid)
                        break
        scope = new_scope if new_scope is not None else scope
        self._ns_stack.append(scope)

        if self._xml_buf is not None:
            # inside an atom XML content capture: serialize verbatim
            self._xml_buf.append(
                "<%s%s>" % (name, "".join(
                    ' %s="%s"' % (k, _xml_attr_escape(v)) for k, v in attrs
                ))
            )
            self._stack.append([name, [], None, False, False])
            return

        self._stack.append([name, [], None, False, False])
        frame = self._stack[-1]
        if len(self._stack) >= 2:
            self._stack[-2][4] = True  # parent is not empty

        local, ns_uri = self._split_name(name, scope)

        if self._add_container(local):
            update_item = self._get_current_item()
            for k, v in attrs:
                alocal, _ = self._split_name(k, scope, is_attr=True)
                if alocal == "about" and update_item is not None:
                    # rdf:about is taken verbatim (raptor_rss.c:473-480)
                    update_item.uri = v
                    update_item.term = v
            return
        if self.current_type == T_NONE:
            return

        # field lookup (raptor_rss.c:496-528) with namespace promotion
        self.current_field = F_UNKNOWN
        if ns_uri in (
            _NS_URI[RSS09_NS], _NS_URI[RSS11_NS]
        ):
            ns_uri = _NS_URI[RSS10_NS]
        elif ns_uri == _NS_URI[ATOM03_NS]:
            ns_uri = _NS_URI[ATOM10_NS]
        for i, (fname, nsid, _flags, _bt) in enumerate(_FIELD_NAMES):
            if local != fname:
                continue
            if ns_uri is None:
                if nsid not in _RSSISH_NS:
                    continue
                self.current_field = i
                break
            if _NS_URI[nsid] == ns_uri:
                self.current_field = i
                break
        if self.current_field == F_UNKNOWN:
            return

        fname, nsid, flags, block_type = _FIELD_NAMES[self.current_field]
        self.nspaces_seen.add(nsid)

        if flags & _BLOCK_VALUE:
            self.nspaces_seen.add(_TYPES[block_type][1])
            update_item = self._get_current_item()
            block = _Block(block_type, self._bnode())
            if update_item is not None:
                update_item.blocks.append(block)
            self.current_block = block
            for k, v in attrs:
                alocal, _ = self._split_name(k, scope, is_attr=True)
                for btype, battr, bkind, offset, _f in _BLOCK_FIELDS:
                    if battr is None or btype != block_type:
                        continue
                    if alocal == battr:
                        if bkind == _URLV:
                            block.urls[offset] = (
                                resolve_uri(self.base, v) or v
                            )
                        else:
                            block.strings[offset] = v
                        break
            return

        # field attributes (raptor_rss.c:609-697)
        for k, v in attrs:
            alocal, _ = self._split_name(k, scope, is_attr=True)
            if alocal == "isPermaLink" and local == "guid":
                update_item = self.items[-1] if self.items else None
                if update_item is not None:
                    field = _Field()
                    update_item.add_field(F_GUID, field)
                    if v == "true":
                        field.uri = resolve_uri(self.base, v) or v
                    else:
                        field.value = v
            elif alocal == "href":
                if self.current_field in (F_LINK, F_ATOM_LINK):
                    frame[2] = resolve_uri(self.base, v) or v
            elif alocal == "type":
                if self.current_field == F_ATOM_LINK:
                    pass
                elif self.is_atom and (
                    v in ("xhtml", "xml") or "+xml" in v
                ):
                    # capture descendant XML verbatim (raptor_rss.c:654-686)
                    frame[3] = True
                    self._xml_buf = []
                    self._xml_owner_depth = len(self._stack)
            elif alocal == "version":
                if local.lower() == "feed" and v == "0.3":
                    self.is_atom = True

    def _cdata(self, data):
        if self._xml_buf is not None:
            self._xml_buf.append(_xml_escape(data))
            return
        if self._stack:
            self._stack[-1][1].append(data)
            self._stack[-1][4] = True  # element is not empty

    def _end(self, name):
        frame = self._stack.pop()
        self._ns_stack.pop()

        if self._xml_buf is not None and len(self._stack) + 1 > (
            self._xml_owner_depth
        ):
            # closing a descendant of the XML-capture owner
            self._xml_buf.append("</%s>" % name)
            return

        cdata = None
        if frame[3] and self._xml_buf is not None:
            cdata = "".join(self._xml_buf)
            self._xml_buf = None
            self._xml_owner_depth = -1
        elif frame[1]:
            cdata = "".join(frame[1])

        if cdata:
            if self.current_block is not None:
                block = self.current_block
                for btype, battr, bkind, offset, _f in _BLOCK_FIELDS:
                    if btype != block.rss_type or battr is not None:
                        continue
                    if bkind == _URLV:
                        block.urls[offset] = (
                            resolve_uri(self.base, cdata) or cdata
                        )
                    else:
                        block.strings[offset] = cdata
                    break
                self.current_block = None
                self._end_tail()
                return

            if self.current_type == T_NONE or self.current_field in (
                F_NONE, F_UNKNOWN,
            ):
                pass  # ignore stray text (raptor_rss.c:781-797)
            elif self.current_type >= _COMMON_IGNORED:
                pass  # skipHours/skipDays parsed but ignored
            else:
                update_item = self._get_current_item()
                field = _Field()
                if _FIELD_NAMES[self.current_field][2] & _URI_VALUE:
                    field.uri = resolve_uri(self.base, cdata) or cdata
                else:
                    field.value = cdata
                if update_item is not None:
                    update_item.add_field(self.current_field, field)
        elif not frame[4] and frame[2]:
            # empty element with a captured href (raptor_rss.c:832-856)
            if (
                self.current_type < _COMMON_IGNORED
                and self.current_field not in (F_NONE, F_UNKNOWN)
            ):
                update_item = self._get_current_item()
                if update_item is not None:
                    update_item.add_field(
                        self.current_field, _Field(uri=frame[2])
                    )

        self._end_tail()

    def _end_tail(self):
        if self.current_type != T_NONE:
            if self.current_field != F_NONE:
                self.current_field = F_NONE
            else:
                if self.prev_type != T_NONE:
                    self.current_type = self.prev_type
                    self.prev_type = T_NONE
                else:
                    self.current_type = T_NONE
        self.current_block = None

    # -- post-parse model passes ------------------------------------------

    def _insert_rss_link(self, item: _Item) -> None:
        """Add rss:link from atom:id or atom:link[@rel=self]/@href
        (raptor_rss.c:951-1006)."""
        id_field = item.first(F_ATOM_ID)
        if id_field is not None and id_field.value:
            item.add_field(F_LINK, _Field(value=id_field.value))
            return
        for block in item.blocks:
            if block.rss_type != T_ATOM_LINK:
                continue
            if 0 not in block.urls or (
                block.strings.get(0) is not None
                and block.strings[0] != "self"
            ):
                continue
            item.add_field(F_LINK, _Field(value=block.urls[0]))
            return

    def _insert_identifiers(self) -> None:
        for i, lst in sorted(self.common.items()):
            for item in lst:
                if not item.fields_count:
                    continue
                if item.uri:
                    item.term = item.uri
                else:
                    url_fields = [
                        F_URL if i == T_IMAGE else F_LINK
                    ]
                    if i == T_CHANNEL:
                        url_fields.append(F_ATOM_ID)
                    for f in url_fields:
                        for field in item.fields.get(f, ()):
                            got = field.value or field.uri
                            if got:
                                item.term = got
                                break
                        if item.term:
                            break
                    if not item.term:
                        item.term = self._bnode()
                if i == T_CHANNEL and F_LINK not in item.fields:
                    self._insert_rss_link(item)
                item.typei = i
        for item in self.items:
            if F_LINK not in item.fields:
                self._insert_rss_link(item)
            uri = item.uri
            if not uri:
                link = item.first(F_LINK)
                if link is not None:
                    uri = link.value or link.uri
                elif item.first(F_ATOM_ID) is not None:
                    f = item.first(F_ATOM_ID)
                    uri = f.value or f.uri
            if not uri:
                continue
            item.term = uri
            item.typei = T_ITEM

    def _uplift(self) -> None:
        def uplift_item(item: _Item) -> None:
            for from_f, to_f, conv in _ATOM_TO_RSS:
                src = item.first(from_f)
                if src is None or not src.value:
                    continue
                dst = item.first(to_f)
                if dst is not None and dst.value:
                    continue
                field = _Field()
                if conv == "date":
                    t = parse_date(src.value)
                    if t is None:
                        continue
                    field.value = format_iso_date(t)
                else:
                    field.value = src.value
                item.add_field(to_f, field)
                self.nspaces_seen.add(_FIELD_NAMES[to_f][1])

        for lst in self.common.values():
            for item in lst:
                uplift_item(item)
        for item in self.items:
            uplift_item(item)

    def _emit_block_triples(self, resource: str, block: _Block) -> None:
        pred = _field_uri(_TYPES[block.rss_type][4])
        self._emit_res(resource, pred, block.identifier)
        self._emit_res(
            block.identifier, RDF_NS + "type", _type_uri(block.rss_type)
        )
        for btype, battr, bkind, offset, f in _BLOCK_FIELDS:
            if btype != block.rss_type or battr is None:
                continue
            pred = _field_uri(f)
            if pred is None:
                continue
            if bkind == _URLV:
                if offset in block.urls:
                    self._emit_res(block.identifier, pred,
                                   block.urls[offset])
            else:
                if offset in block.strings:
                    self._emit(block.identifier, pred, KIND_LITERAL,
                               block.strings[offset])

    def _emit_item(self, item: _Item) -> None:
        if not item.fields_count:
            return
        if item.typei == T_ATOM_AUTHOR:
            type_uri = _field_uri(F_ATOM_AUTHOR_CLASS)
        else:
            type_uri = _type_uri(item.typei)
        if type_uri is not None:
            self._emit_res(item.term, RDF_NS + "type", type_uri)
        for f in sorted(item.fields):
            if f == F_ITEMS:
                continue
            pred = _field_uri(f)
            if pred is None:
                continue  # RSS 2 fields have no namespace -> no predicate
            for field in item.fields[f]:
                if field.value is not None:
                    self._emit(item.term, pred, KIND_LITERAL, field.value)
                elif field.uri is not None:
                    self._emit_res(item.term, pred, field.uri)
        for block in item.blocks:
            self._emit_block_triples(item.term, block)

    def _emit_all(self) -> None:
        # the FIRST channel in model order, like the reference's
        # model.common[RAPTOR_RSS_CHANNEL] list head (raptor_rss.c:1374)
        channel = None
        for item in self.common.get(T_CHANNEL, ()):
            if item.fields_count:
                channel = item
                break
        if channel is None or channel.term is None:
            self.errors.append(
                {"line": 0, "message": "No RSS channel item present"}
            )
            return
        for i, lst in sorted(self.common.items()):
            for item in lst:
                if not item.fields_count:
                    continue
                if item.term is None:
                    # reference: parser error + ABORT the emit, keeping
                    # the triples already produced (raptor_rss.c:
                    # 1397-1402) — never a crash on identifier-less
                    # nodes (e.g. an RSS 2.0 item with no link/guid)
                    self.errors.append(
                        {
                            "line": 0,
                            "message": "RSS %s has no identifier"
                            % _TYPES[i][0],
                        }
                    )
                    return
                self._emit_item(item)
                if i != T_CHANNEL:
                    self._emit_res(channel.term, _type_uri(i), item.term)
        if self.items:
            seq = self._bnode()
            self._emit_res(seq, RDF_NS + "type", RDF_NS + "Seq")
            self._emit_res(channel.term, _field_uri(F_ITEMS), seq)
            for n, item in enumerate(self.items, 1):
                if item.term is None:
                    # raptor_rss_emit_type_triple(NULL): error + abort
                    self.errors.append(
                        {
                            "line": 0,
                            "message": "RSS node has no identifier",
                        }
                    )
                    return
                self._emit_item(item)
                self._emit_res(seq, RDF_NS + "_%d" % n, item.term)

    # -- driver -------------------------------------------------------------

    def namespaces(self) -> List[Tuple[str, str]]:
        """(prefix, uri) declarations for a serializer, in the table's
        enum order, for seen namespaces with prefixes — exactly the set
        raptor_rss_start_namespaces starts (raptor_rss.c:1565-1597;
        its final pass also marks every field namespace present on the
        common items, but not on the feed entries)."""
        for lst in self.common.values():
            for item in lst:
                for f in item.fields:
                    self.nspaces_seen.add(_FIELD_NAMES[f][1])
        return [
            (_NS_PREFIX[n], _NS_URI[n])
            for n in sorted(self.nspaces_seen)
            if _NS_PREFIX.get(n) and _NS_URI.get(n)
        ]

    def run(self, data) -> None:
        if isinstance(data, str):
            try:
                try:
                    # surrogateescape FIRST (same contract as the
                    # rdfxml/rdfa kernels): inverts the string-column
                    # transport so declared-encoding non-UTF-8 feeds
                    # reach expat as their original bytes
                    data = data.encode("utf-8", "surrogateescape")
                except UnicodeEncodeError:
                    data = data.encode("utf-8")
            except UnicodeEncodeError as e:
                # lone surrogates: input error record, never a crash
                self.errors.append({"line": 0, "message": str(e)})
                return
        try:
            self.p.Parse(data, True)
        except xml.parsers.expat.ExpatError as e:
            self.errors.append(
                {"line": getattr(e, "lineno", 0), "message": str(e)}
            )
            return
        self._insert_identifiers()
        self._uplift()
        self._emit_all()


def parse_document(
    data, base_uri: Optional[str] = None
) -> Tuple[List[Triple], List[dict]]:
    """Parse one RSS/Atom feed document -> (triples, errors)."""
    p = RssParser(base_uri)
    p.run(data)
    return p.triples, p.errors
