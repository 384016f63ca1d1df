"""file <-> URI mapping and the full reference resolve-vector sweep.

Vectors transcribed from the reference's STANDALONE tests:
- resolve: src/raptor_rfc2396.c main() check_resolve calls (all 43,
  including the RFC 3986 abnormal examples ../../../gpath).
- file <-> URI: src/raptor_uri.c main() POSIX branch (:2371-2384).
"""

from __future__ import annotations

import re

import pytest

from raptor_spark.kernel.uri import (
    filename_to_uri,
    normalize_path,
    resolve_uri,
    uri_to_filename,
    uri_to_filename_fragment,
)


def _reference_resolve_vectors():
    src = open("/root/reference/src/raptor_rfc2396.c").read()
    base = None
    out = []
    for line in src.splitlines():
        m = re.search(r'base_uri\s*=\s*"([^"]*)"', line)
        if m:
            base = m.group(1)
            continue
        m = re.search(
            r'check_resolve\(base_uri,\s*"([^"]*)",\s*"([^"]*)"\)', line
        )
        if m:
            out.append((base, m.group(1), m.group(2)))
    assert len(out) >= 40
    return out


@pytest.mark.parametrize("base,ref,expected", _reference_resolve_vectors())
def test_reference_resolve_vector(base, ref, expected):
    assert resolve_uri(base, ref) == expected


F2U = [
    ("/path/to/file", "file:///path/to/file"),
    ("/path/to/file with spaces", "file:///path/to/file%20with%20spaces"),
    ("/path/to/a#b?c", "file:///path/to/a%23b%3Fc"),
    ("/path/to/a\\b", "file:///path/to/a%5Cb"),
    # Issue#0000268: %-escapes in the filename are themselves escaped
    (
        "/path/to/http%3A%2F%2Fwww.example.org%2Fa%2Fb%2Fc",
        "file:///path/to/http%253A%252F%252Fwww.example.org%252Fa%252Fb%252Fc",
    ),
]


@pytest.mark.parametrize("filename,uri", F2U)
def test_filename_to_uri(filename, uri):
    assert filename_to_uri(filename) == uri


U2F = [
    ("file:///path/to/file", "/path/to/file"),
    ("file:///path/to/file%20with%20spaces", "/path/to/file with spaces"),
    (
        "file:///path/to/http%253A%252F%252Fwww.example.org%252Fa%252Fb%252Fc",
        "/path/to/http%3A%2F%2Fwww.example.org%2Fa%2Fb%2Fc",
    ),
    # security: traversal is normalized away
    ("file:///tmp/foo/../../../etc/hosts", "/etc/hosts"),
    # rejections
    ("http://example.org/x", None),
    ("file://remote.example/etc/hosts", None),  # POSIX: local only
    ("file:///bad%zzescape", None),
    ("file:///nul%00byte", None),
    ("FILE:///case/insensitive", "/case/insensitive"),
    ("file://localhost/path", "/path"),
    ("file://", None),  # no path
]


@pytest.mark.parametrize("uri,filename", U2F)
def test_uri_to_filename(uri, filename):
    assert uri_to_filename(uri) == filename


def test_fragment_split():
    assert uri_to_filename_fragment("file:///p/q#frag") == ("/p/q", "frag")
    assert uri_to_filename_fragment("file:///p/q") == ("/p/q", None)


def test_relative_filename_joins_cwd():
    assert (
        filename_to_uri("rel/file", cwd="/base/dir")
        == "file:///base/dir/rel/file"
    )


def test_roundtrip_utf8():
    # non-ASCII escapes byte-wise and decodes back
    f = "/data/café/résumé.txt"
    u = filename_to_uri(f)
    assert "%C3%A9" in u
    assert uri_to_filename(u) == f


def test_normalize_leading_dotdot():
    assert normalize_path("/tmp/foo/../../../etc/hosts") == "/etc/hosts"
    assert normalize_path("/foo/../..") == "/.."  # bare trailing survives


def test_issue70_regressions():
    """The reference's committed bug-regression tests
    (tests/bugs/issue70a.c, issue70b.c — integer underflow in
    raptor_uri_normalize_path): the pathological base/reference pair
    must resolve to the documented expected string, and the companion
    N-Triples fragment must error cleanly, never crash."""
    from raptor_spark.kernel import ntriples as NT
    from raptor_spark.kernel.uri import resolve_uri

    assert (
        resolve_uri(
            "http:o/www.w3.org/2001/sw/DataA#cess/df1.ttl",
            ".&/../?D/../../1999/02/22-rdf-syntax-ns#",
        )
        == "http:?D/../../1999/02/22-rdf-syntax-ns#"
    )
    triples, errs = NT.parse_document("_:/exaple/o\n")
    assert triples == [] and errs and errs[0]["line"] == 1
