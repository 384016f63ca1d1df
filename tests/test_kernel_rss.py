"""rss-tag-soup kernel conformance vs the reference's feeds suite.

Drives the same inputs the reference's tests/feeds/Makefile.am uses:
- check-atom-to-turtle: test04/test05.atom through the rss-tag-soup
  parser must produce graphs isomorphic to the committed -result.ttl
  goldens (base http://www.example.org/blog/, Makefile.am:131-147);
- check-rdfxml-to-turtle: test01-03.rdf through the rdfxml parser vs
  their -result.ttl goldens (cross-kernel check; Makefile.am:84-100).
Plus unit checks for the RSS 2.0 path the suite does not cover
(pubDate -> ISO dc:date uplift, enclosure blocks, guid quirks).
"""

from pathlib import Path

from raptor_spark.kernel import rdfxml as RX
from raptor_spark.kernel import rss as RSS
from raptor_spark.kernel import turtle as TTL
from raptor_spark.kernel.compare import graphs_isomorphic
from raptor_spark.kernel.suites import REF_TESTS

SUITE = REF_TESTS / "feeds"
ATOM_BASE = "http://www.example.org/blog/"
RDF_BASES = {
    "test01": "http://example.org/whatsnew",
    "test02": "http://example.org/news/",
    "test03": "http://example.org",
}


def _golden(name: str, base: str):
    with open(SUITE / (name + "-result.ttl"), encoding="utf-8",
              newline="") as fh:
        gold, gerrs = TTL.parse_document(fh.read(), base_uri=base)
    assert not gerrs, (name, gerrs)
    return gold


def test_feeds_atom_suite():
    fails = []
    for name in ("test04", "test05"):
        data = (SUITE / (name + ".atom")).read_bytes()
        triples, errs = RSS.parse_document(data, base_uri=ATOM_BASE)
        if errs:
            fails.append((name, errs[0]["message"]))
        elif not graphs_isomorphic(triples, _golden(name, ATOM_BASE)):
            fails.append((name, "not isomorphic (%d)" % len(triples)))
    assert not fails, fails


def test_feeds_rdfxml_suite():
    fails = []
    for name, base in RDF_BASES.items():
        data = (SUITE / (name + ".rdf")).read_bytes()
        triples, errs, _w = RX.parse_document_full(data, base_uri=base)
        if errs:
            fails.append((name, errs[0]["message"]))
        elif not graphs_isomorphic(triples, _golden(name, base)):
            fails.append((name, "not isomorphic (%d)" % len(triples)))
    assert not fails, fails


RSS2 = """<?xml version="1.0"?>
<rss version="2.0">
<channel>
 <title>My Feed</title>
 <link>http://ex.org/feed</link>
 <description>Demo</description>
 <pubDate>Tue, 10 Jun 2003 04:00:00 +0000</pubDate>
 <item>
  <title>Item one</title>
  <link>http://ex.org/1</link>
  <description>First &amp; best</description>
  <pubDate>10 Jun 2003 09:41:01 -0500</pubDate>
  <enclosure url="1.mp3" length="1024" type="audio/mpeg"/>
 </item>
</channel>
</rss>"""


def _index(triples):
    return {(t.subj, t.pred): t for t in triples}


def test_rss2_model():
    triples, errs = RSS.parse_document(RSS2, base_uri="http://ex.org/f.rss")
    assert not errs
    ix = _index(triples)
    rss = "http://purl.org/rss/1.0/"
    dc = "http://purl.org/dc/elements/1.1/"
    enc = "http://purl.oclc.org/net/rss_2.0/enc#"
    # channel identified by rss:link, pubDate uplifted to ISO dc:date
    assert ix[("http://ex.org/feed", dc + "date")].obj_lex == (
        "2003-06-10T04:00:00Z"
    )
    # item pubDate honors the RFC822 zone offset
    assert ix[("http://ex.org/1", dc + "date")].obj_lex == (
        "2003-06-10T14:41:01Z"
    )
    # description cloned to content:encoded, entities decoded
    cont = "http://purl.org/rss/1.0/modules/content/"
    assert ix[("http://ex.org/1", cont + "encoded")].obj_lex == (
        "First & best"
    )
    # enclosure block: bnode subject, url resolved against base
    bl = ix[("http://ex.org/1", enc + "enclosure")]
    assert bl.obj_kind == 4
    b = "_:" + bl.obj_lex
    assert ix[(b, enc + "url")].obj_lex == "http://ex.org/1.mp3"
    assert ix[(b, enc + "length")].obj_lex == "1024"
    # rdf:Seq ordinal for the single item
    seq = ix[("http://ex.org/feed", rss + "items")]
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert ix[("_:" + seq.obj_lex, rdf + "_1")].obj_lex == "http://ex.org/1"


def test_parse_dispatch():
    from raptor_spark.operators.parse import parse_one

    triples, errs = parse_one(
        RSS2, "rss-tag-soup", base_uri="http://ex.org/f.rss"
    )
    assert not errs and len(triples) > 10


def test_parse_date_formats():
    assert RSS.parse_date("Tue, 10 Jun 2003 04:00:00 GMT") == 1055217600
    assert RSS.parse_date("2003-06-10T04:00:00Z") == 1055217600
    assert RSS.parse_date("2003-06-10T04:00:00+02:00") == 1055210400
    assert RSS.parse_date("not a date") is None


def test_identifierless_item_errors_not_crashes():
    """An RSS 2.0 item with no link/guid/atom:id has no identifier: the
    reference records 'RSS node has no identifier' and ABORTS the emit,
    keeping the triples already produced (raptor_rss.c:1397-1402,
    raptor_rss_emit_type_triple NULL check) — never a crash."""
    from raptor_spark.kernel.rss import parse_document

    t, e = parse_document(
        '<rss version="2.0"><channel><title>c</title>'
        "<link>http://x/</link><item><title>t</title></item>"
        "</channel></rss>"
    )
    assert any("no identifier" in x["message"] for x in e)
    # the channel's triples survive (emit aborts, it does not rollback)
    assert any(x.subj == "http://x/" for x in t)


def test_malformed_date_offset_returns_none():
    """A date whose tail merely SHAPES like an ISO offset must fall
    through to None (the reference's parsedate grammar fails to match),
    not raise ValueError out of the kernel."""
    from raptor_spark.kernel.rss import parse_date

    assert parse_date("foo-ab:cd") is None
    assert parse_date("2024-01-02T03:04:05+02:00") is not None


def test_first_channel_wins_on_multichannel_soup():
    """Two <channel> elements: connections attach to the FIRST channel
    with fields, like the reference's model.common[CHANNEL] list head
    (raptor_rss.c:1374)."""
    from raptor_spark.kernel.rss import parse_document

    t, e = parse_document(
        '<rss version="2.0">'
        "<channel><title>one</title><link>http://one/</link>"
        "<item><title>i</title><link>http://one/i</link></item></channel>"
        "<channel><title>two</title><link>http://two/</link></channel>"
        "</rss>"
    )
    items_pred = "http://purl.org/rss/1.0/items"
    seq_owners = [x.subj for x in t if x.pred == items_pred]
    assert seq_owners == ["http://one/"]
