"""Content sniffing (reference: raptor_guess.c + per-parser
recognise_syntax scorers): every fixture of each syntax family must be
routed to a kernel that parses it cleanly — the property the reference's
guess parser guarantees (it delegates to the highest-scoring parser)."""

from raptor_spark.kernel.suites import REF_TESTS, makefile_vars
from raptor_spark.operators.parse import guess_format, parse_one


def _read(path):
    with open(path, encoding="utf-8", errors="surrogateescape", newline="") as fh:
        return fh.read()


def test_guess_routes_fixtures_to_a_working_parser():
    cases = []
    v = makefile_vars("turtle-2013")
    for f in v["TEST_EVAL_FILES"][:40]:
        cases.append((REF_TESTS / "turtle-2013" / f,
                      "http://www.w3.org/2013/TurtleTests/" + f))
    v = makefile_vars("ntriples-2013")
    for f in v["TEST_GOOD_FILES"][:20]:
        cases.append((REF_TESTS / "ntriples-2013" / f, None))
    v = makefile_vars("rdfxml")
    for f in v["RDF_TEST_FILES"][:20]:
        if f.endswith(".rdf") and f not in {"ex-64.rdf", "ex-65.rdf",
                                            "bug-650.rdf"}:
            cases.append((REF_TESTS / "rdfxml" / f,
                          "http://librdf.org/raptor/tests/" + f))
    v = makefile_vars("json")
    for f in v["TEST_FILES"]:
        cases.append((REF_TESTS / "json" / f, "http://example.librdf.org/"))

    fails = []
    for path, base in cases:
        text = _read(path)
        fmt = guess_format(text)
        triples, errs = parse_one(text, fmt, base)
        if errs:
            fails.append((path.name, fmt, errs[0]["message"]))
    assert not fails, fails[:10]


def test_guess_parser_name_scoring():
    """raptor_world_guess_parser_name semantics
    (src/raptor_parse.c:1315-1466): MIME and suffix score ahead of
    content; high-Q media types end the scan; suffix refusal rules;
    failure below RAPTOR_MIN_GUESS_SCORE."""
    from raptor_spark.kernel.guess import _suffix_of, guess_parser_name

    nt = '<http://a/s> <http://a/p> <http://a/o> .\n<http://a/s> <http://a/p> "v" .'
    ttl = "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n<http://a/s> rdf:value 1 ."

    # exact high-Q media type ends the scan, even against foreign content
    assert guess_parser_name(ttl, mime_type="application/rdf+xml") == "rdfxml"
    # ...with media-type parameters stripped (raptor_guess.c:94-105)
    assert guess_parser_name(nt, mime_type="text/turtle; charset=utf-8") == "turtle"
    assert guess_parser_name(nt, mime_type="text/x-nquads") == "nquads"
    # suffix scoring; nquads explicitly refuses .nt-named content
    # (src/ntriples_parse.c:741-745)
    assert guess_parser_name(nt, identifier="part-0.nt") == "ntriples"
    assert guess_parser_name(nt, identifier="dump.nq") == "nquads"
    # suffix alone carries an unrecognizable body
    assert guess_parser_name("plain text", identifier="m.ttl") == "turtle"
    assert guess_parser_name("plain text", identifier="g.trig") == "trig"
    assert guess_parser_name("plain", identifier="x.rdf") == "rdfxml"
    # identifier substrings (librdfa scores 'RDFa' at 10,
    # src/raptor_librdfa.c:334-338)
    assert guess_parser_name("<html/>", identifier="my-RDFa.html") == "rdfa"
    assert (
        guess_parser_name("<?xml?>", identifier="posts/feed-rss2.xml")
        == "rss-tag-soup"
    )
    # content-only: the reference prefers nquads over ntriples (subset
    # rule, src/ntriples_parse.c:752-757) and turtle via @prefix
    assert guess_parser_name(nt) == "nquads"
    assert guess_parser_name(ttl) == "turtle"
    # syntax-URI exact match ends the scan
    assert (
        guess_parser_name(None, uri="http://www.w3.org/ns/formats/Turtle")
        == "turtle"
    )
    # no signal clears MIN_GUESS_SCORE -> None (reference returns NULL
    # and the guess parser errors)
    assert guess_parser_name("hello world") is None
    # suffix extraction: '\\.[a-zA-Z0-9]+$' only, lowercased
    assert _suffix_of("A/B.TTL") == "ttl"
    assert _suffix_of("a.tar.gz") == "gz"
    assert _suffix_of("noext") is None
    assert _suffix_of("weird.t-t") is None
    assert _suffix_of(None) is None


def test_parser_name_aliases():
    """The reference registers 'ntriples-plus' and 'n3' as turtle-family
    names (src/turtle_parser.y:1860) and 'raptor' as an rdfxml name
    (src/raptor_rdfxml.c:3181); parse_one must dispatch them."""
    ttl = "@prefix ex: <http://e/> .\nex:a ex:b ex:c ."
    for alias in ("n3", "ntriples-plus"):
        triples, errs = parse_one(ttl, alias, "http://e/")
        assert not errs and len(triples) == 1, (alias, errs)
    rdf = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        '<rdf:Description rdf:about="http://e/x" rdf:value="v"/></rdf:RDF>'
    )
    triples, errs = parse_one(rdf, "raptor", "http://e/")
    assert not errs and len(triples) == 1, errs


def test_parse_one_guess_uses_mime_and_identifier():
    """MIME/suffix signals must win over content sniffing when present
    (the reference scores them first)."""
    nt = "<http://a/s> <http://a/p> <http://a/o> ."
    # content alone sniffs ntriples; a turtle mime must reroute
    t, e = parse_one(nt, "guess", "http://e/", mime_type="text/turtle")
    assert not e and len(t) == 1
    t, e = parse_one(nt, "guess", "http://e/", identifier="data.nq")
    assert not e and len(t) == 1
    # unguessable signals fall back to content sniffing, never failing
    t, e = parse_one(nt, "guess", "http://e/", identifier="noext")
    assert not e and len(t) == 1


def test_parse_documents_guess_with_mime_and_identifier(spark):
    """The distributed parse operator threads per-row MIME/identifier
    signals into the guess path: the same NT-shaped content routes to
    turtle by media type, nquads by suffix, and the content sniffer
    when no signal exists — all inside one Arrow batch."""
    from raptor_spark.operators.parse import parse_documents, triples_of

    nt = "<http://a/s> <http://a/p> <http://a/o> ."
    rows = [
        ("c1", nt, "guess", "text/turtle", None),
        ("c2", nt, "guess", None, "dump.nq"),
        ("c3", nt, "guess", None, None),
    ]
    docs = spark.createDataFrame(
        rows,
        "conv_id string, doc_text string, tool string, "
        "mime string, ident string",
    )
    parsed = parse_documents(docs, mime_col="mime", identifier_col="ident")
    out = {r.conv_id: r for r in triples_of(parsed).collect()}
    assert set(out) == {"c1", "c2", "c3"}
    assert all(r.subj == "http://a/s" for r in out.values())
    errs = parsed.filter("rec = 'e'").count()
    assert errs == 0


def test_guess_parser_name_total():
    """The scorer is a total function: any (text, mime, identifier)
    combination returns a registered parser name or None, never raises
    — at corpus scale a single pathological row must not kill an Arrow
    batch."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fuzzbudget import budget

    from raptor_spark.kernel.guess import FACTORIES, guess_parser_name

    names = {n for f in FACTORIES for n in f[0]}

    @settings(max_examples=budget(200), deadline=None)
    @given(
        st.text(max_size=300),
        st.one_of(st.none(), st.text(max_size=60)),
        st.one_of(st.none(), st.text(max_size=60)),
    )
    def run(text, mime, ident):
        got = guess_parser_name(text, mime_type=mime, identifier=ident)
        assert got is None or got in names

    run()


def test_guess_basic_shapes():
    assert guess_format('<?xml version="1.0"?><rdf:RDF/>') == "rdfxml"
    assert guess_format('{"triples": []}') == "json"
    assert guess_format("<http://a/> <http://b/> <http://c/> .") == "ntriples"
    assert (
        guess_format("<http://a/> <http://b/> <http://c/> <http://g/> .")
        == "nquads"
    )
    assert guess_format("@prefix ex: <http://e/> .\nex:a ex:b ex:c .") == "turtle"
    assert guess_format("<http://g/> { <http://a/> <http://b/> <http://c/> . }") == "trig"


def test_guess_mime_sentinel_scores_zero():
    """An UNMATCHED mime_type scores a factory 0, not -1: the
    reference's type loop lands on the table's {NULL,0,0} sentinel and
    `if(type_q) score = type_q->q` assigns its q
    (src/raptor_parse.c:1389-1400). Content whose recogniser scores
    exactly MIN_GUESS_SCORE must therefore still win alongside a
    non-matching Content-Type."""
    from raptor_spark.kernel.guess import guess_parser_name

    # json content scores 2 ('{' first non-ws); 0 + 2 clears the bar
    assert (
        guess_parser_name('{ "k": 1 }', mime_type="application/octet-stream")
        == "json"
    )
    # without a mime_type the same factory starts at -1: -1 + 2 fails
    assert guess_parser_name('{ "k": 1 }') is None


def test_guess_trailing_dot_suffix_is_empty_not_none():
    """identifier='x.' yields an empty-but-non-NULL suffix in the
    reference (malloc'd before validation, raptor_parse.c:1355-1380):
    it truthily enters every if(suffix) branch, matches nothing, and
    BLOCKS the !suffix identifier-substring arms."""
    from raptor_spark.kernel.guess import _suffix_of, guess_parser_name

    assert _suffix_of("data.json.") == ""
    # json's 'json-in-identifier' +4 arm is an ELSE of if(suffix):
    # blocked by the empty suffix -> no factory clears the bar
    assert guess_parser_name("plain", identifier="data.json.") is None
    # the rdfxml/rss !suffix 'rss'-substring arms are blocked the same
    # way (the un-gated 'feed' arm would still score, so no 'feed' here)
    assert guess_parser_name("plain", identifier="my-rss.") is None
    # ...while the same identifier without the trailing dot takes the
    # !suffix arm: rss +4
    assert guess_parser_name("plain", identifier="my-rss") == "rss-tag-soup"


def test_guess_firstn_is_a_byte_window():
    """FIRSTN truncates at 1024 BYTES (buffer[FIRSTN]='\\0',
    raptor_parse.c:1428-1436), not characters: markers past the byte
    window must be invisible even when they sit inside the first 1024
    characters of multibyte content."""
    from raptor_spark.kernel.guess import guess_parser_name

    ttl = "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> ."
    # 700 two-byte chars push '@prefix ' to byte ~1400, char ~700
    assert guess_parser_name("é" * 700 + ttl) is None
    # inside the byte window it still scores
    assert guess_parser_name("é" * 400 + ttl) == "turtle"


def test_guess_invalid_bytes_do_not_splice_markers():
    """An invalid byte between two fragments must stay a separator in
    the scored window (the reference scans the raw buffer, where
    '@pre<bad>fix ' can never match '@prefix '): decoding the FIRSTN
    window with errors='ignore' used to DROP the bad byte and splice
    the fragments into a marker that was never contiguous (round-6
    ADVICE fix -> errors='replace')."""
    from raptor_spark.kernel.guess import guess_parser_name

    # a lone surrogate encodes (surrogatepass) to bytes no UTF-8 decode
    # accepts — the in-window stand-in for a raw invalid byte; padding
    # pushes the total past FIRSTN so the byte-window decode path runs
    spliceable = "@pre\ud800fix rdf: <http://x> .\n" + "a " * 600
    assert guess_parser_name(spliceable) != "turtle"
    # the same content with the marker genuinely contiguous still scores
    clean = "@prefix rdf: <http://x> .\n" + "a " * 600
    assert guess_parser_name(clean) == "turtle"
