"""RSS 1.0 serializer (kernel/atom.py Rss10Serializer — the is_atom==0
mode of the reference's src/raptor_serialize_rss.c).

The reference ships no committed rss-1.0 serializer goldens (the feeds
Makefile.am only byte-checks the atom mode), so the gates here are the
strongest available without running the C:

1. **Lossless subset**: a model produced by the rss-tag-soup parser
   itself (fields + items rdf:Seq + typed nodes, no foreign bnode
   subtrees) roundtrips serialize->reparse exactly isomorphic.
2. **Idempotence**: for arbitrary graphs (all five feeds-suite golden
   models), one serialize->reparse application reaches a fixed point —
   the second application is isomorphic to the first. The C pair is
   lossy on exactly the same classes (atom:author literals are skipped
   by the `!is_atom` continue at raptor_serialize_rss.c:2300, and
   rdfxml-abbrev property blocks are opaque to the tag-soup reparse),
   so convergence-after-one-pass is the faithful contract.
3. **Structure**: rdf:RDF root with the rss-1.0 default namespace
   (raptor_rss10_build_xml_names:1058-1069), channel with rdf:about,
   <items><rdf:Seq><rdf:li/> ordering per the input ordinals
   (raptor_rss10_emit_rss_items:1376-1458).
"""

from __future__ import annotations

import glob
import os

import pytest

from raptor_spark.kernel import rss as R
from raptor_spark.kernel import turtle as T
from raptor_spark.kernel.atom import to_rss10
from raptor_spark.kernel.compare import graphs_isomorphic

FEEDS = "/root/reference/tests/feeds"
BASE = "http://example.org/base"

RSS2_DOC = """<?xml version="1.0"?>
<rss version="2.0">
<channel>
 <title>ALGERIA wire</title>
 <link>http://ex.org/feed/0</link>
 <description>ALGERIA wire</description>
 <pubDate>10 Jun 2003 04:00:00 +0000</pubDate>
 <item>
  <title>Supplier#1 &amp; co</title>
  <link>http://ex.org/supp/1</link>
  <description>update from Supplier#1</description>
  <pubDate>02 Jun 2003 01:01:00 +0000</pubDate>
 </item>
 <item>
  <title>Supplier#2</title>
  <link>http://ex.org/supp/2</link>
  <description>update &lt;b&gt;bold&lt;/b&gt; from 2</description>
  <pubDate>03 Jun 2003 02:02:00 +0000</pubDate>
 </item>
 <item>
  <title>Supplier#3</title>
  <link>http://ex.org/supp/3</link>
  <description>third</description>
  <pubDate>04 Jun 2003 03:03:00 +0000</pubDate>
 </item>
</channel>
</rss>"""


def _parse_golden(name: str):
    src = open(os.path.join(FEEDS, name), newline="").read()
    triples, errs = T.parse_document(src, base_uri=BASE)
    assert not errs
    return triples


def test_rss2_model_roundtrips_lossless():
    model, errs = R.parse_document(RSS2_DOC, base_uri="http://ex.org/f.rss")
    assert not errs and model
    xml = to_rss10(model)
    back, errs2 = R.parse_document(xml, base_uri="http://ex.org/f.rss")
    assert not errs2
    assert graphs_isomorphic(model, back)
    assert len(set(back)) == len(set(model))


def test_structure_root_and_items_seq():
    model, _ = R.parse_document(RSS2_DOC, base_uri="http://ex.org/f.rss")
    xml = to_rss10(model)
    assert xml.startswith('<?xml version="1.0" encoding="utf-8"?>\n<rdf:RDF')
    assert 'xmlns="http://purl.org/rss/1.0/"' in xml
    assert 'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"' in xml
    # channel typed node with rdf:about, then the Seq with in-order items
    assert '<channel rdf:about="http://ex.org/feed/0">' in xml
    pos = [xml.index('rdf:resource="http://ex.org/supp/%d"' % i)
           for i in (1, 2, 3)]
    assert pos == sorted(pos)
    assert xml.index("<items>") < xml.index("<rdf:Seq>") < pos[0]
    assert xml.rstrip().endswith("</rdf:RDF>")


def test_relative_about_under_base():
    # base relativization mirrors the C's raptor_uri_to_relative_uri_string
    model, _ = R.parse_document(RSS2_DOC, base_uri="http://ex.org/f.rss")
    xml = to_rss10(model, base_uri="http://ex.org/feed/x")
    assert '<channel rdf:about="0">' in xml


def test_no_channel_raises():
    with pytest.raises(ValueError):
        to_rss10([])


@pytest.mark.parametrize(
    "golden",
    sorted(os.path.basename(p)
           for p in glob.glob(os.path.join(FEEDS, "*-result.ttl"))),
)
def test_feeds_goldens_reach_fixed_point(golden):
    triples = _parse_golden(golden)
    x1 = to_rss10(triples)
    m1, e1 = R.parse_document(x1, base_uri=BASE)
    assert not e1 and m1
    x2 = to_rss10(m1)
    m2, e2 = R.parse_document(x2, base_uri=BASE)
    assert not e2
    assert graphs_isomorphic(m1, m2)


def test_content_encoded_prefers_cdata():
    # prefer_cdata branch: !is_atom && f == CONTENT_ENCODED
    # (raptor_serialize_rss.c:2067-2100)
    model, _ = R.parse_document(
        RSS2_DOC.replace(
            "<description>update from Supplier#1</description>",
            "<description>a</description>"
            "<content:encoded xmlns:content="
            '"http://purl.org/rss/1.0/modules/content/">'
            "&lt;p&gt;html&lt;/p&gt;</content:encoded>",
        ),
        base_uri="http://ex.org/f.rss",
    )
    xml = to_rss10(model)
    assert "<content:encoded><![CDATA[<p>html</p>]]></content:encoded>" in xml
