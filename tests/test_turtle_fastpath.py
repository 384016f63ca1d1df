"""Differential gate for the turtle statement fast path.

The fast path (kernel/turtle._FAST_STMT_RE + _fast_statement) must be a
strict subset of the grammar: on ANY input, parsing with the fast path
enabled and with it force-disabled must produce identical triples and
identical error records. Hypothesis composes documents biased toward
the fast shape (safe qnames, simple IRIs, ';' lists, bare integers)
and its boundary mutations (dots in locals, escapes, lang tags,
comments mid-statement, undeclared prefixes, trailing-dot decimals)."""

from hypothesis import given, settings

from fuzzbudget import budget
from hypothesis import strategies as st

import raptor_spark.kernel.turtle as T


class _NeverMatch:
    __slots__ = ()

    def match(self, *args):
        return None


def _both_paths(text: str, trig: bool):
    fast = T.parse_document(text, "http://ex.org/base/doc", trig=trig)
    saved = T._FAST_STMT_RE
    T._FAST_STMT_RE = _NeverMatch()
    try:
        slow = T.parse_document(text, "http://ex.org/base/doc", trig=trig)
    finally:
        T._FAST_STMT_RE = saved
    return fast, slow


_subjects = st.sampled_from(
    ["ex:s", "ex:s1", "<http://ex.org/s>", "<s>", "<>", "_:b0", "_:b-1",
     "und:s", "ex:s.mid", "p-x:s", "[]", "<ä>", "<a b>"]
)
_verbs = st.sampled_from(
    ["ex:p", "a", "<http://ex.org/p>", "<p>", "und:p", "ex:p.q"]
)
_objects = st.sampled_from(
    ['"v"', '"v w"', '""', '"v"@en', '"v"^^ex:dt', "ex:o", "<o>", "_:o",
     "7", "42 ", "10.", "1.5", "-3", "true", "( ex:a ex:b )", "[ ex:p 1 ]",
     '"es\\"c"', '"""long"""', "'sq'"]
)
_seps = st.sampled_from([" ", "  ", "\n", "\t", " # c\n", " ;\n ", " ; "])


@st.composite
def _docs(draw):
    parts = ["@prefix ex: <http://ex.org/ns#> .\n",
             "@prefix p-x: <http://ex.org/px#> .\n"]
    for _ in range(draw(st.integers(0, 4))):
        parts.append(draw(_subjects))
        parts.append(draw(_seps))
        for j in range(draw(st.integers(1, 5))):
            if j:
                parts.append(" ;")
                parts.append(draw(_seps))
            parts.append(draw(_verbs))
            parts.append(draw(_seps))
            parts.append(draw(_objects))
        parts.append(draw(st.sampled_from([" .\n", ".\n", " . ", " .",
                                           "\n.\n", " ;.\n"])))
    return "".join(parts)


@settings(max_examples=budget(300), deadline=None)
@given(_docs(), st.booleans())
def test_fast_path_matches_grammar(doc, trig):
    if trig:
        doc += "ex:g { ex:s ex:p 1 .\nex:s ex:q <o> }\n"
    fast, slow = _both_paths(doc, trig)
    assert fast[0] == slow[0]
    assert fast[1] == slow[1]


@settings(max_examples=budget(200), deadline=None)
@given(st.text(
    alphabet=st.sampled_from(list(
        "ex:sp<>\"_. ;\n\t@a1-\\u#{}[]()^'%é\U0001F600")),
    max_size=120,
), st.booleans())
def test_fast_path_matches_grammar_on_soup(text, trig):
    fast, slow = _both_paths(text, trig)
    assert fast[0] == slow[0]
    assert fast[1] == slow[1]
