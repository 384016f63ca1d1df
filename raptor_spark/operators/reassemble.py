"""Turn reassembly: transcripts -> one document row per conversation.

The reference consumes documents as a byte stream
(raptor_parser_parse_chunk, src/raptor_parse.c:479-487); our documents
arrive as shuffled turns, so the equivalent operator is an aggregation that
restores ``turn_idx`` order and concatenates ``text``. All JVM-native (one
shuffle on conv_id, map-side partial aggregation, no Python): the sort
happens inside each group via ``array_sort`` over (turn_idx, text) structs,
never a global orderBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SORTED_TEXTS = (
    "transform(array_sort(collect_list(struct(turn_idx, text))), s -> s.text)"
)


def reassemble(transcripts: DataFrame, extra_cols=("tool",)) -> DataFrame:
    """transcripts -> (conv_id, doc_text, n_turns, *extra_cols).

    ``extra_cols`` are per-conversation constants (format tag, base_uri)
    carried through with ``min`` (their value is identical on every turn).
    """
    aggs = [
        F.concat_ws("", F.expr(_SORTED_TEXTS)).alias("doc_text"),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
    ]
    for c in extra_cols:
        aggs.append(F.min(c).alias(c))
    return transcripts.groupBy("conv_id").agg(*aggs)
