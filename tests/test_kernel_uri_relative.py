"""URI -> relative-reference tests: exactly the reference's STANDALONE
assert_uri_to_relative vectors (src/raptor_uri.c, #ifdef STANDALONE)."""

import pytest

from raptor_spark.kernel.uri import resolve_uri, uri_to_relative

CASES = [
    (None, "http://example.com/foo/bar", "http://example.com/foo/bar"),
    ("", "http://example.com/foo/bar", "http://example.com/foo/bar"),
    ("foo:", "http://example.com/foo/bar", "http://example.com/foo/bar"),
    ("http://example.com/base/foo?foo#foo",
     "http://example.com/base/bar?bar#bar", "bar?bar#bar"),
    ("http://example.com/base/foo", "http://example.com/base/foo/", "foo/"),
    ("http://example.com/base/foo", "http://example.com/base/foo/.foo",
     "foo/.foo"),
    ("http://example.com/base/foo", "http://example.com/base/foo/.foo#bar",
     "foo/.foo#bar"),
    ("http://example.com/base/foo", "http://example.com/base/foo/bar",
     "foo/bar"),
    ("http://example.com/base/foo", "http://example.com/base/foo#bar",
     "#bar"),
    ("http://example.com/base/foo", "http://example.com/base/bar#foo",
     "bar#foo"),
    ("http://example.com/base/foo", "http://example.com/otherbase/foo",
     "../otherbase/foo"),
    ("http://example.com/base/foo", "http://example.com/otherbase/bar",
     "../otherbase/bar"),
    ("http://example.com/base/foo", "http://example.com/base/#foo", ".#foo"),
    ("http://example.com/base/foo", "http://example2.com/base/bar",
     "http://example2.com/base/bar"),
    ("http://example.com/base/one?path=/should/be/ignored",
     "http://example.com/base/two?path=/should/be/ignored",
     "two?path=/should/be/ignored"),
    ("http://example.org/base#", "http://www.foo.org", "http://www.foo.org"),
    ("http://example.org", "http://a.example.org/", "http://a.example.org/"),
    ("http://example.org", "http://a.example.org", "http://a.example.org"),
    ("http://abcdefgh.example.org/foo/bar/", "http://ijklmnop.example.org/",
     "http://ijklmnop.example.org/"),
    ("http://example.org", "http://example.org/a/b/c/d/efgh",
     "/a/b/c/d/efgh"),
]


@pytest.mark.parametrize("base,uri,expected", CASES)
def test_uri_to_relative_reference_vectors(base, uri, expected):
    assert uri_to_relative(base, uri) == expected


@pytest.mark.parametrize("base,uri,expected", CASES)
def test_relative_resolves_back(base, uri, expected):
    """Round trip: resolving the relative form against the base must give
    back the reference URI (when a base exists and the form is non-empty)."""
    if not base or ":" not in (base or "") or expected == "":
        return
    if base == "foo:":
        return
    assert resolve_uri(base, expected) == uri


def test_reference_quirks_pinned():
    """Three behaviors a reviewer flagged as RFC-divergent are the
    REFERENCE's own, verified in its C source, and deliberately ported:

    - resolve against an authority-only base (NULL path): the base is
      non-hierarchical (rfc2396.c:199 is_hierarchical = path[0]=='/'),
      so the ref path is copied verbatim (rfc2396.c:633) and _unsplit
      concatenates it onto the authority; the '/'-substitution branch
      is unreachable for this input.
    - uri_to_relative drops the reference's empty relative form even
      when the BASE carries a query the empty reference would resolve
      back to (raptor_uri.c path-equal branch appends only the
      REFERENCE's query/fragment).
    """
    from raptor_spark.kernel.uri import resolve_uri, uri_to_relative

    assert resolve_uri("http://host", "a/b") == "http://hosta/b"
    assert uri_to_relative("http://a/b?q", "http://a/b") == ""
    assert uri_to_relative("http://a/b?q", "http://a/b#f") == "#f"
