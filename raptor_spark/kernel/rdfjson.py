"""RDF/JSON parser kernel (pure Python).

Re-expresses the reference's YAJL-based RDF/JSON parser
(dajobe/raptor: src/raptor_json.c — state machine at :50-60) over
``json.loads``. Both document shapes are supported:

- resource-centric: ``{subject: {predicate: [termobject, ...]}}``
  (tests/json/example1.json)
- triples array: ``{"triples": [{"subject": t, "predicate": t,
  "object": t}, ...]}`` (tests/json/example2.json)

Term objects are ``{"value": str, "type": "uri"|"literal"|"bnode",
"lang"?: str, "datatype"?: str}``. The reference enables YAJL comment
support, so /* */ and // comments are stripped before JSON parsing
(tests/json/example3.json). Validation mirrors the bad-00..bad-13
fixtures: missing/unknown triple keys, non-string values, missing term
types and non-RDF/JSON documents are errors.
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

from raptor_spark.kernel.terms import (
    KIND_BLANK,
    KIND_LITERAL,
    KIND_URI,
    Triple,
    make_literal,
)


import re

# one linear scan: strings (kept, so '//' inside URLs is never a
# comment), /* */ blocks (dropped; unterminated runs to EOF), // line
# comments (dropped up to but not including the newline). The string
# branch tolerates an unterminated string / lone trailing backslash the
# same way the char-loop did (kept verbatim to EOF).
_STRIP_RE = re.compile(
    r'"(?:\\.|[^"\\])*(?:"|\\?\Z)'
    r"|/\*.*?(?:\*/|\Z)"
    r"|//[^\n]*",
    re.S,
)


def _strip_comments(text: str) -> str:
    """Remove /* */ and // comments outside JSON strings."""
    out = []
    last = 0
    for m in _STRIP_RE.finditer(text):
        start = m.start()
        if text[start] == '"':
            continue  # string literal — keep (no .group() copy)
        out.append(text[last:start])
        last = m.end()
    if not out:
        return text
    out.append(text[last:])
    return "".join(out)


class _Bad(Exception):
    pass


def _term(obj, position: str) -> Tuple[int, str, Optional[str], Optional[str]]:
    """Validate a term object -> (kind, lex, datatype, lang)."""
    if not isinstance(obj, dict):
        raise _Bad("%s term is not an object" % position)
    for k in obj:
        if k not in ("value", "type", "lang", "datatype"):
            raise _Bad("unknown key %r in %s term" % (k, position))
    if "type" not in obj:
        raise _Bad("missing 'type' in %s term" % position)
    if "value" not in obj:
        raise _Bad("missing 'value' in %s term" % position)
    t, v = obj["type"], obj["value"]
    if not isinstance(t, str) or not isinstance(v, str):
        raise _Bad("%s term type/value must be strings" % position)
    lang = obj.get("lang")
    datatype = obj.get("datatype")
    if lang is not None and not isinstance(lang, str):
        raise _Bad("%s term lang must be a string" % position)
    if datatype is not None and not isinstance(datatype, str):
        raise _Bad("%s term datatype must be a string" % position)
    if t == "uri":
        return KIND_URI, v, None, None
    if t == "bnode":
        return KIND_BLANK, v[2:] if v.startswith("_:") else v, None, None
    if t == "literal":
        try:
            lex, dt, lg = make_literal(v, datatype, lang)
        except ValueError as e:
            # e.g. both datatype and language: an input error record
            # like every other malformed-term shape, not an exception
            # out of the kernel
            raise _Bad(str(e))
        return KIND_LITERAL, lex, dt, lg
    raise _Bad("unknown %s term type %r" % (position, t))


def _subject_like(kind: int, lex: str, position: str) -> str:
    if kind == KIND_BLANK:
        return "_:" + lex
    if kind == KIND_URI:
        return lex
    raise _Bad("%s cannot be a literal" % position)


def parse_document(text: str) -> Tuple[List[Triple], List[dict]]:
    """Parse one RDF/JSON document -> (triples, errors)."""
    triples: List[Triple] = []
    try:
        try:
            # fast path: strict JSON cannot contain comments (a bare '/'
            # outside a string is invalid), so a successful raw parse
            # proves _strip_comments would have been a no-op — the
            # stripper cost dominated comment-free documents (~47% of
            # kernel time measured on the synthesized corpus)
            data = json.loads(text)
        except ValueError:
            data = json.loads(_strip_comments(text))
    except (ValueError, RecursionError) as e:
        return [], [{"line": getattr(e, "lineno", 0), "message": str(e)}]
    try:
        if not isinstance(data, dict):
            raise _Bad("RDF/JSON document root must be an object")
        if "triples" in data:
            items = data["triples"]
            if not isinstance(items, list):
                raise _Bad("'triples' must be an array")
            for item in items:
                if not isinstance(item, dict):
                    raise _Bad("triple entry is not an object")
                for k in item:
                    if k not in ("subject", "predicate", "object"):
                        raise _Bad("unknown key %r in triple" % k)
                for k in ("subject", "predicate", "object"):
                    if k not in item:
                        raise _Bad("triple is missing %r" % k)
                sk, sl, _, _ = _term(item["subject"], "subject")
                pk, pl, _, _ = _term(item["predicate"], "predicate")
                if pk != KIND_URI:
                    raise _Bad("predicate must be a URI")
                ok, olex, odt, olang = _term(item["object"], "object")
                triples.append(
                    Triple(_subject_like(sk, sl, "subject"), pl,
                           ok, olex, odt, olang, None)
                )
        else:
            for subj, preds in data.items():
                if not isinstance(preds, dict):
                    raise _Bad("subject %r value is not an object" % subj)
                s = subj  # '_:' labels pass through verbatim
                for pred, objs in preds.items():
                    if not isinstance(objs, list):
                        raise _Bad(
                            "predicate %r value is not an array" % pred
                        )
                    for obj in objs:
                        ok, olex, odt, olang = _term(obj, "object")
                        triples.append(
                            Triple(s, pred, ok, olex, odt, olang, None)
                        )
    except _Bad as e:
        return triples, [{"line": 0, "message": str(e)}]
    return triples, []
