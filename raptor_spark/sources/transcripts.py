"""Deterministic synthetic transcript tables.

The engine's input shape (per BASELINE.json ``input_hint``) is an
Iceberg-style table
``transcripts(conv_id, turn_idx, role, text, tool, ts)`` — multi-turn
conversations whose concatenated ``text`` (in ``turn_idx`` order) is an RDF
document. Two generators:

- :func:`tpch_transcripts` — RDF-izes the driver's TPC-H-ish parquet into
  per-order conversations, in a deterministic mix of N-Triples / RDF/XML /
  RDF/JSON / Turtle / N-Quads / TriG keyed on ``o_orderkey % 10``
  (SQL-reproducible so
  a DuckDB oracle can reconstruct the expected triples). Built entirely
  from native column expressions — no Python row loop, no driver collect —
  so synthesis itself scales to the full cluster.

- :func:`fixture_transcripts` — embeds the reference's W3C conformance
  fixtures, one document per conversation, chunked at line boundaries
  (used by the pytest conformance harness).

Per-turn text equality invariant: concatenating ``text`` over ``turn_idx``
order reproduces the document byte-for-byte.
"""

from __future__ import annotations

import pathlib
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EX_NS = "http://ex.org/ns#"
ORDER_NS = "http://ex.org/order/"
CUST_NS = "http://ex.org/customer/"
PART_NS = "http://ex.org/part/"
GRAPH_NS = "http://ex.org/graph/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

# o_orderkey % 10 -> document syntax (deterministic and SQL-reproducible)
FORMAT_BUCKETS = {
    "ntriples": (0, 1, 2, 3),
    "rdfxml": (4,),
    "json": (5,),
    "turtle": (6, 7),
    "nquads": (8,),
    "trig": (9,),
}

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# bump when the synthesis logic changes: versions the materialized
# /tmp table path so stale caches can never be read
GEN_VERSION = 4


def _format_col(orderkey):
    """Derived from FORMAT_BUCKETS (the single mapping source). The
    per-syntax lineitem gates in tpch_transcripts hand-code the same
    buckets inside column expressions; they are oracle-pinned, so any
    re-bucketing must change both plus every oracle's CASE."""
    b = F.pmod(orderkey, F.lit(10))
    cond = None
    for fmt, buckets in FORMAT_BUCKETS.items():
        test = b.isin(*buckets)
        cond = (
            F.when(test, F.lit(fmt))
            if cond is None
            else cond.when(test, F.lit(fmt))
        )
    return cond


def _json_term(type_: str, value_col, datatype: str = None):
    parts = [F.lit('{"type":"%s","value":"' % type_), value_col, F.lit('"')]
    if datatype:
        parts += [F.lit(',"datatype":"%s"' % datatype)]
    parts += [F.lit("}")]
    return F.concat(*parts)


def _json_triple(subj_term, pred: str, obj_term):
    return F.concat(
        F.lit('{"subject":'),
        subj_term,
        F.lit(',"predicate":{"type":"uri","value":"%s%s"},"object":' % (EX_NS, pred)),
        obj_term,
        F.lit("}"),
    )


def tpch_transcripts(
    spark: SparkSession, sf_dir: str, max_orders: Optional[int] = None
) -> DataFrame:
    """Synthesize transcripts(conv_id, turn_idx, role, text, tool, ts).

    One conversation per order; the document encodes the order header and
    its lineitems as RDF statements (3 header triples + 3 per lineitem).
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    if max_orders is not None:
        # push the key threshold onto BOTH sides: without the lineitem
        # filter the full table flows through the gate projection and
        # the groupBy shuffle only to be dropped at the join
        orders = orders.filter(F.col("o_orderkey") <= max_orders)
        lineitem = lineitem.filter(F.col("l_orderkey") <= max_orders)

    k = F.col("o_orderkey")
    graph_uri = F.concat(F.lit("<" + GRAPH_NS), k, F.lit(">"))

    subj = F.concat(F.lit("<" + ORDER_NS), k, F.lit(">"))
    cust = F.concat(F.lit("<" + CUST_NS), F.col("o_custkey"), F.lit(">"))

    def nt(pred: str, obj):
        return F.concat(subj, F.lit(" <" + EX_NS + pred + "> "), obj)

    # header lines in each syntax family
    hdr_nt = F.array(
        nt("status", F.concat(F.lit('"'), F.col("o_orderstatus"), F.lit('"'))),
        nt("priority", F.concat(F.lit('"'), F.col("o_orderpriority"), F.lit('"'))),
        nt("customer", cust),
    )
    hdr_ttl = F.array(
        F.concat(
            F.lit("ord:"),
            k,
            F.lit(' ex:status "'),
            F.col("o_orderstatus"),
            F.lit('" ;'),
        ),
        F.concat(F.lit('  ex:priority "'), F.col("o_orderpriority"), F.lit('" ;')),
        F.concat(F.lit("  ex:customer "), cust, F.lit(" .")),
    )

    # lineitem lines (grouped per order, order stable by linenumber).
    # The narrow (k, ln, pk, qty) scan is rebalanced to session
    # parallelism BEFORE the five per-syntax renderings: parquet plans
    # splits by bytes, so the byte-small lineitem table yields ~3 splits
    # and the whole codegen string-build stage — by far the heaviest part
    # of synthesis — would run on 3 cores (measured: turns noop 2.5s ->
    # 1.3s at sf0.1 local[32] when fixed). The rebalance shuffles only
    # the four narrow source columns; rendered strings stay in the same
    # stage as the aggregation's map side, exactly as before.
    from raptor_spark.operators.parse import rebalance_for_parse

    li = rebalance_for_parse(
        lineitem.select(
            F.col("l_orderkey").alias("k"),
            F.col("l_linenumber").alias("ln"),
            F.col("l_partkey").alias("pk"),
            F.col("l_quantity").cast("int").alias("qty"),
        )
    )
    li_subj = F.concat(F.lit("<" + ORDER_NS), F.col("k"), F.lit(">"))
    # linenumber alone is NOT unique per order in the synthetic data; the
    # (ln, partkey, qty) triplet is — and stays SQL-reproducible for oracles
    bn = F.concat(
        F.lit("_:li"), F.col("ln"), F.lit("p"), F.col("pk"), F.lit("q"), F.col("qty")
    )
    li_nt = F.array(
        F.concat(li_subj, F.lit(" <" + EX_NS + "item> "), bn, F.lit(" .")),
        F.concat(
            bn, F.lit(" <" + EX_NS + "part> <" + PART_NS), F.col("pk"), F.lit("> .")
        ),
        F.concat(
            bn,
            F.lit(" <" + EX_NS + 'qty> "'),
            F.col("qty"),
            F.lit('"^^<' + XSD_INT + "> ."),
        ),
    )
    li_ttl = F.array(
        F.concat(F.lit("ord:"), F.col("k"), F.lit(" ex:item "), bn, F.lit(" .")),
        F.concat(
            bn,
            F.lit(" ex:part <" + PART_NS),
            F.col("pk"),
            F.lit("> ; ex:qty "),
            F.col("qty"),
            F.lit(" ."),
        ),
    )
    # bnode label without the "_:" encoding (RDF/XML rdf:nodeID form)
    bnl = F.concat(
        F.lit("li"), F.col("ln"), F.lit("p"), F.col("pk"), F.lit("q"), F.col("qty")
    )
    li_xml_item = F.array(
        F.concat(F.lit('<ex:item rdf:nodeID="'), bnl, F.lit('"/>'))
    )
    li_xml_node = F.array(
        F.concat(
            F.lit('<rdf:Description rdf:nodeID="'),
            bnl,
            F.lit('"><ex:part rdf:resource="' + PART_NS),
            F.col("pk"),
            F.lit('"/><ex:qty rdf:datatype="' + XSD_INT + '">'),
            F.col("qty"),
            F.lit("</ex:qty></rdf:Description>"),
        )
    )
    li_subj_uri = F.concat(F.lit(ORDER_NS), F.col("k"))
    bn_term = _json_term("bnode", F.concat(F.lit("_:"), bnl))
    li_json = F.array(
        _json_triple(_json_term("uri", li_subj_uri), "item", bn_term),
        _json_triple(
            bn_term, "part",
            _json_term("uri", F.concat(F.lit(PART_NS), F.col("pk"))),
        ),
        _json_triple(
            bn_term, "qty", _json_term("literal", F.col("qty"), XSD_INT)
        ),
    )
    # one collect_list + one array_sort for all five syntax renderings
    # (five separate collect_list(struct(ln, X)) aggs would keep five
    # copies of the group in the aggregation buffers and sort five
    # times); ties on ln break deterministically on the line arrays,
    # which only affects in-document order, never the triple set.
    # Each rendering is gated by the order's format bucket — an order
    # uses exactly ONE syntax, so building all five line sets for every
    # lineitem would put ~4x dead string payload through the aggregation
    # shuffle (empty arrays for the unused syntaxes ride for free).
    b = F.pmod(F.col("k"), F.lit(10))
    gate = lambda cond, arr: F.when(cond, arr).otherwise(
        F.array().cast("array<string>")
    )
    li_grouped = (
        li.select(
            "k",
            "ln",
            gate((b <= 3) | (b == 8), li_nt).alias("nt_lines"),
            gate((b >= 6) & (b != 8), li_ttl).alias("ttl_lines"),
            gate(b == 4, li_xml_item).alias("xml_item_lines"),
            gate(b == 4, li_xml_node).alias("xml_node_lines"),
            gate(b == 5, li_json).alias("json_lines"),
        )
        .groupBy("k")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(ln, nt_lines, ttl_lines,"
                " xml_item_lines, xml_node_lines, json_lines)))"
            ).alias("_sorted")
        )
        .select(
            "k",
            *[
                F.flatten(
                    F.expr("transform(_sorted, s -> s.%s)" % c)
                ).alias(a)
                for c, a in [
                    ("nt_lines", "li_nt"),
                    ("ttl_lines", "li_ttl"),
                    ("xml_item_lines", "li_xml_item"),
                    ("xml_node_lines", "li_xml_node"),
                    ("json_lines", "li_json"),
                ]
            ],
        )
    )

    docs = orders.join(li_grouped, orders.o_orderkey == li_grouped.k, "left")

    # strip the ' .' terminator from NT lineitem lines to rebuild NQ lines
    docs = docs.withColumn(
        "li_nt_stripped",
        F.transform(
            F.coalesce(F.col("li_nt"), F.array().cast("array<string>")),
            # every NT line ends in " ." — a fixed-width strip, no regex
            lambda x: x.substr(F.lit(1), F.length(x) - 2),
        ),
    )
    empty = F.array().cast("array<string>")

    nt_lines = F.concat(
        F.transform(hdr_nt, lambda x: F.concat(x, F.lit(" ."))),
        F.coalesce(F.col("li_nt"), empty),
    )
    nq_lines = F.transform(
        F.concat(hdr_nt, F.col("li_nt_stripped")),
        lambda x: F.concat(x, F.lit(" "), graph_uri, F.lit(" .")),
    )
    ttl_body = F.concat(
        F.array(
            F.lit("@prefix ex: <" + EX_NS + "> ."),
            F.lit("@prefix ord: <" + ORDER_NS + "> ."),
        ),
        hdr_ttl,
        F.coalesce(F.col("li_ttl"), empty),
    )
    trig_lines = F.concat(
        F.array(
            F.lit("@prefix ex: <" + EX_NS + "> ."),
            F.lit("@prefix ord: <" + ORDER_NS + "> ."),
            F.concat(graph_uri, F.lit(" {")),
        ),
        hdr_ttl,
        F.coalesce(F.col("li_ttl"), empty),
        F.array(F.lit("}")),
    )
    xml_lines = F.concat(
        F.array(
            F.lit('<?xml version="1.0"?>'),
            F.lit(
                '<rdf:RDF xmlns:rdf="' + RDF_NS + '" xmlns:ex="' + EX_NS + '">'
            ),
            F.concat(
                F.lit('<rdf:Description rdf:about="' + ORDER_NS), k, F.lit('">')
            ),
            F.concat(
                F.lit("<ex:status>"), F.col("o_orderstatus"), F.lit("</ex:status>")
            ),
            F.concat(
                F.lit("<ex:priority>"),
                F.col("o_orderpriority"),
                F.lit("</ex:priority>"),
            ),
            F.concat(
                F.lit('<ex:customer rdf:resource="' + CUST_NS),
                F.col("o_custkey"),
                F.lit('"/>'),
            ),
        ),
        F.coalesce(F.col("li_xml_item"), empty),
        F.array(F.lit("</rdf:Description>")),
        F.coalesce(F.col("li_xml_node"), empty),
        F.array(F.lit("</rdf:RDF>")),
    )
    order_term = _json_term("uri", F.concat(F.lit(ORDER_NS), k))
    json_all = F.concat(
        F.array(
            _json_triple(
                order_term, "status", _json_term("literal", F.col("o_orderstatus"))
            ),
            _json_triple(
                order_term,
                "priority",
                _json_term("literal", F.col("o_orderpriority")),
            ),
            _json_triple(
                order_term,
                "customer",
                _json_term("uri", F.concat(F.lit(CUST_NS), F.col("o_custkey"))),
            ),
        ),
        F.coalesce(F.col("li_json"), empty),
    )
    json_lines = F.array(
        F.lit('{"triples":['), F.array_join(json_all, ","), F.lit("]}")
    )

    fmt = _format_col(F.col("o_orderkey"))
    lines = (
        F.when(fmt == "ntriples", nt_lines)
        .when(fmt == "rdfxml", xml_lines)
        .when(fmt == "json", json_lines)
        .when(fmt == "turtle", ttl_body)
        .when(fmt == "nquads", nq_lines)
        .otherwise(trig_lines)
    )

    docs = docs.select(
        F.concat(F.lit("ord-"), F.col("o_orderkey")).alias("conv_id"),
        F.col("o_orderkey").alias("orderkey"),
        fmt.alias("tool"),
        F.col("o_orderdate").alias("base_ts"),
        lines.alias("lines"),
    )

    # chunk lines into turns: chunk size 1..5 keyed on the order key.
    # The turn texts are sliced straight out of the per-document line
    # array (transform over a sequence of turn indexes) — a
    # posexplode-then-regroup would shuffle every line row only to
    # reassemble groups that already sit adjacent in one array.
    chunk = (F.pmod(F.col("orderkey"), F.lit(5)) + F.lit(1)).alias("chunk")
    docs = docs.withColumn("chunk", chunk)
    n_turns = F.ceil(F.size("lines") / F.col("chunk")).cast("int")
    turn_texts = F.transform(
        F.sequence(F.lit(0), n_turns - F.lit(1)),
        lambda i: F.concat(
            F.array_join(
                F.slice(
                    F.col("lines"), i * F.col("chunk") + 1, F.col("chunk")
                ),
                "\n",
            ),
            F.lit("\n"),
        ),
    )
    turns = docs.select(
        "conv_id",
        "tool",
        "base_ts",
        F.posexplode(turn_texts).alias("turn_idx", "text"),
    )
    roles = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        F.pmod(F.col("turn_idx"), F.lit(3)) + 1,
    )
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        roles.alias("role"),
        "text",
        "tool",
        (F.col("base_ts") + F.make_interval(secs=F.col("turn_idx"))).alias("ts"),
    )


def _sf_cache_key(sf_dir: str) -> str:
    """Cache-directory key for a scale-factor dir: basename plus a short
    digest of the ABSOLUTE path and the source parquet mtimes, so two
    datasets at different paths with the same basename don't collide and
    regenerated testdata under an unchanged path invalidates the cache."""
    import glob
    import hashlib
    import os

    ap = os.path.abspath(sf_dir.rstrip("/"))
    sig = [ap]
    for f in sorted(glob.glob(os.path.join(ap, "*.parquet"))):
        try:
            sig.append("%s:%d" % (os.path.basename(f), int(os.stat(f).st_mtime)))
        except OSError:
            pass
    digest = hashlib.sha1("|".join(sig).encode()).hexdigest()[:10]
    return "%s_%s" % (os.path.basename(ap), digest)


def materialize_transcripts(
    spark: SparkSession,
    sf_dir: str,
    out_dir: Optional[str] = None,
    replicate: int = 1,
) -> str:
    """Write the synthetic transcripts as a parquet table and return its
    path — the stand-in for the north rule's Iceberg transcript table
    (real deployments READ transcripts; they don't synthesize them inside
    the job). Turns are hash-clustered by conv_id so a scan parallelizes
    by file splits and conversations stay file-local. Idempotent: skipped
    when the table already exists (deterministic input, seeded driver
    data)."""
    import os
    from functools import reduce

    name = _sf_cache_key(sf_dir)
    suffix = f"_x{replicate}" if replicate > 1 else ""
    out = out_dir or (
        f"/tmp/raptor_spark_transcripts_v{GEN_VERSION}_{name}{suffix}"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        base = tpch_transcripts(spark, sf_dir)
        if replicate > 1:
            # bench-only corpus growth: N copies under distinct conv_ids
            # (per-document work identical; conv_id only prefixes bnode
            # relabeling downstream). One synthesis pass + an exploded
            # suffix array — an N-way union of the plan would re-run the
            # whole orders/lineitem join and aggregation per replica for
            # byte-identical output
            base = (
                base.withColumn(
                    "_rep",
                    F.explode(
                        F.array(
                            *[F.lit("#%d" % i) for i in range(replicate)]
                        )
                    ),
                )
                .withColumn(
                    "conv_id", F.concat(F.col("conv_id"), F.col("_rep"))
                )
                .drop("_rep")
            )
        base.repartition(32, F.col("conv_id")).write.mode("overwrite").parquet(out)
    return out


#: bump when PIPELINE semantics change (parse kernels, canonicalize,
#: relabel, dedup): the cached graph table depends on the whole
#: transcripts->triples path, not just the synthesis GEN_VERSION
GRAPH_VERSION = 1


def materialize_graph(spark: SparkSession, sf_dir: str) -> str:
    """Build the KG once and cache it as a parquet graph table (keyed by
    GEN_VERSION + GRAPH_VERSION + sf). Sink-side operators
    (serialize_*) read THIS table: a deployment serializes a stored
    graph, it does not re-run the parse stage per export — and a bench
    of a sink should time the sink, not the upstream parse."""
    import os

    name = _sf_cache_key(sf_dir)
    out = f"/tmp/raptor_spark_graph_v{GEN_VERSION}.{GRAPH_VERSION}_{name}"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        from raptor_spark.pipeline import build_graph

        triples, _ = build_graph(tpch_transcripts(spark, sf_dir))
        triples.select(
            "conv_id", "subj", "pred", "obj_kind", "obj_lex",
            "obj_datatype", "obj_lang", "graph",
        ).write.mode("overwrite").parquet(out)
    return out


def fixture_transcripts(
    spark: SparkSession,
    files: List[pathlib.Path],
    formats: List[str],
    base_uris: List[str],
    lines_per_turn: int = 3,
) -> DataFrame:
    """Embed conformance fixture documents into a transcripts DataFrame.

    One conversation per fixture file; text chunked at line boundaries.
    Returns transcripts plus a ``base_uri`` column carried per turn (the
    pipeline's conv_meta equivalent).
    """
    rows = []
    for path, fmt, base_uri in zip(files, formats, base_uris):
        # surrogateescape + newline='' keeps the document byte-exact
        # through the string column: the rdfxml kernel re-encodes with
        # surrogateescape first (kernel/rdfxml.py run()), which inverts
        # this read, so non-UTF-8 fixture bytes reach expat in their
        # original form (the CLAUDE.md read-rdfxml-as-bytes rule,
        # satisfied through the text-column transport)
        with open(path, encoding="utf-8", errors="surrogateescape", newline="") as fh:
            text = fh.read()
        conv_id = f"{path.parent.name}/{path.name}"
        parts = text.splitlines(keepends=True)
        if not parts:
            parts = [""]
        for t in range(0, len(parts), lines_per_turn):
            rows.append(
                (
                    conv_id,
                    t // lines_per_turn,
                    ("user", "assistant", "tool")[(t // lines_per_turn) % 3],
                    "".join(parts[t : t + lines_per_turn]),
                    fmt,
                    base_uri,
                )
            )
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, base_uri string"
    )
