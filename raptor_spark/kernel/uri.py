"""URI parsing and relative-reference resolution.

Re-expresses the reference's RFC2396/3986 handling
(dajobe/raptor: src/raptor_rfc2396.c:70-199 component split, :316-470
path normalization, :495-800 resolution) — which differs from a strict
RFC 3986 ``remove_dot_segments`` in corner cases (e.g. paths that climb
above root keep their ``..`` components), so we match it rather than the
RFC.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional, Tuple

# scheme "://" exactly as uri_parse would split it
_ABS_HIER_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


class UriDetail(NamedTuple):
    scheme: Optional[str]
    authority: Optional[str]
    path: Optional[str]
    query: Optional[str]
    fragment: Optional[str]

    @property
    def is_hierarchical(self) -> bool:
        return self.path is not None and self.path.startswith("/")


def _scheme_start(c: str) -> bool:
    return ("A" <= c <= "Z") or ("a" <= c <= "z")


def _scheme_char(c: str) -> bool:
    return _scheme_start(c) or ("0" <= c <= "9") or c in "+-."


def uri_parse(s: str) -> UriDetail:
    """Split a URI string into components (reference: raptor_new_uri_detail)."""
    scheme = authority = path = query = fragment = None
    i = 0
    n = len(s)
    if n and _scheme_start(s[0]):
        j = 1
        while j < n and _scheme_char(s[j]):
            j += 1
        if j < n and s[j] == ":":
            scheme = s[:j]
            i = j + 1
    if i + 1 < n and s[i] == "/" and s[i + 1] == "/":
        j = i + 2
        while j < n and s[j] not in "/?#":
            j += 1
        authority = s[i + 2 : j]
        i = j
    if i < n and s[i] not in "?#":
        j = i
        while j < n and s[j] not in "?#":
            j += 1
        path = s[i:j]
        i = j
    if i < n and s[i] == "?":
        j = i + 1
        while j < n and s[j] != "#":
            j += 1
        query = s[i + 1 : j]
        i = j
    if i < n and s[i] == "#":
        fragment = s[i + 1 :]
    return UriDetail(scheme, authority, path, query, fragment)


def normalize_path(path: str) -> str:
    """Dot-segment removal (reference: raptor_uri_normalize_path).

    Removes "./" components and "<component>/../" pairs, then strips
    leading "/../" and "/./" runs (RFC3986 5.4.2 abnormal examples,
    reference raptor_rfc2396.c:472-485). A bare trailing "/.." with no
    component to consume survives (e.g. "/foo/../.." -> "/..").
    """
    # remove all "./" components and a trailing "."
    comps = path.split("/")
    comps = [c for i, c in enumerate(comps) if not (c == "." and i < len(comps) - 1)]
    if comps and comps[-1] == ".":
        comps[-1] = ""
    path = "/".join(comps)

    # remove "<component>/../" (slash-terminated) where <component> is not
    # ".."; iterate to fixpoint like the reference's restart-scan
    changed = True
    while changed:
        changed = False
        comps = path.split("/")
        for k in range(len(comps) - 2):
            if comps[k + 1] == ".." and comps[k] not in ("..", ""):
                del comps[k : k + 2]
                path = "/".join(comps)
                changed = True
                break

    # remove "<component>/.." at the very end of the path (the reference
    # applies this even when <component> is itself "..", truncating after
    # the preceding slash)
    comps = path.split("/")
    if len(comps) >= 2 and comps[-1] == ".." and comps[-2] != "":
        comps[-2:] = [""]
        path = "/".join(comps)

    # RFC3986 Appendix C.2 / 5.4.2 abnormal examples: remove leading
    # "/../" and "/./" (raptor_rfc2396.c:472-485)
    while True:
        if path.startswith("/../"):
            path = path[3:]
        elif path.startswith("/./"):
            path = path[2:]
        else:
            break
    return path


def resolve_uri(base_uri: Optional[str], reference_uri: str) -> str:
    """Resolve @reference_uri against @base_uri.

    Mirrors raptor_uri_resolve_uri_reference; returns '' on failure
    (e.g. relative reference with no base).
    """
    # fast path (strict subset): an absolute hierarchical reference with
    # no "/." anywhere resolves to itself — its path normalization is the
    # identity and recomposition is lossless. "/." catches every dot
    # segment a path with an authority can contain ("/./", "/../",
    # trailing "/." and "/..").
    if _ABS_HIER_RE.match(reference_uri) and "/." not in reference_uri:
        return reference_uri

    ref = uri_parse(reference_uri)

    # "" or "#frag" same-document reference
    if (
        ref.scheme is None
        and ref.authority is None
        and ref.path is None
        and ref.query is None
    ):
        if base_uri is None:
            return ""
        base_nofrag = base_uri.split("#", 1)[0]
        if ref.fragment is not None:
            return base_nofrag + "#" + ref.fragment
        return base_nofrag

    if ref.scheme is not None:
        scheme: Optional[str] = ref.scheme
        authority = ref.authority
        path = normalize_path(ref.path or "")
        query = ref.query
        fragment = ref.fragment
        return _unsplit(scheme, authority, path, query, fragment)

    if base_uri is None:
        return ""
    base = uri_parse(base_uri)
    scheme = base.scheme

    if ref.authority is not None:
        return _unsplit(scheme, ref.authority, ref.path or "", ref.query, ref.fragment)

    authority = base.authority

    if (ref.path is not None and ref.path.startswith("/")) or not base.is_hierarchical:
        path = normalize_path(ref.path or "")
        return _unsplit(scheme, authority, path, ref.query, ref.fragment)

    # relative path merge
    base_path = base.path if base.path is not None else "/"
    if ref.path is None:
        merged = base_path
    else:
        slash = base_path.rfind("/")
        merged = (base_path[: slash + 1] if slash >= 0 else "") + ref.path
    path = normalize_path(merged)
    return _unsplit(scheme, authority, path, ref.query, ref.fragment)


def _common_base_length(first: str, second: str) -> int:
    """Common whole-segment prefix length of two paths (reference:
    raptor_uri_path_common_base_length)."""
    common = 0
    i = first.find("/")
    while i >= 0:
        seg_end = i + 1
        if seg_end > len(second) or first[common:seg_end] != second[common:seg_end]:
            break
        common = seg_end
        i = first.find("/", seg_end)
    return common


def _make_relative_path(from_path: str, to_path: str, suffix: str) -> str:
    """'../'-climbing relative path + suffix (reference:
    raptor_uri_path_make_relative_path, src/raptor_uri.c)."""
    common = _common_base_length(from_path, to_path)
    up_dirs = from_path.count("/", common)
    last_slash = to_path.rfind("/")
    to_dir = to_path[common : last_slash + 1] if last_slash >= common else ""
    out = "../" * up_dirs + to_dir
    if suffix:
        # leading "." representing a directory is dropped when something
        # precedes it (reference special case)
        if out and suffix[0] == "." and (
            len(suffix) == 1 or suffix[1] in "#?"
        ):
            suffix = suffix[1:]
    return out + suffix


def uri_to_relative(base_uri: Optional[str], reference_uri: str) -> str:
    """Relative form of @reference_uri against @base_uri — the inverse of
    resolution, used by the abbreviating serializers' @base output
    (reference: raptor_uri_to_relative_counted_uri_string,
    src/raptor_uri.c:1644-1846; unit vectors from its STANDALONE tests).
    Falls back to the absolute URI when no relative form exists."""
    if base_uri is None or not base_uri:
        return reference_uri
    if base_uri == reference_uri:
        return ""
    base = uri_parse(base_uri)
    ref = uri_parse(reference_uri)
    if base.scheme != ref.scheme or base.authority != ref.authority:
        return reference_uri

    suffix_parts = []
    if ref.query is not None:
        suffix_parts.append("?" + ref.query)
    if ref.fragment is not None:
        suffix_parts.append("#" + ref.fragment)
    qf = "".join(suffix_parts)

    if base.path is None:
        if ref.path is not None:
            return (ref.path or "") + qf
        return reference_uri
    slash = base.path.rfind("/")
    if slash < 0 or ref.path is None or "/" not in ref.path:
        return reference_uri
    base_file = base.path[slash + 1 :]
    ref_file = ref.path[ref.path.rfind("/") + 1 :]
    if base.path == ref.path:
        file = ""
    elif base_file and not ref_file:
        file = "."
    else:
        file = ref_file
    return _make_relative_path(base.path, ref.path, file + qf)


def _unsplit(
    scheme: Optional[str],
    authority: Optional[str],
    path: Optional[str],
    query: Optional[str],
    fragment: Optional[str],
) -> str:
    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if authority is not None:
        out.append("//" + authority)
    if path:
        out.append(path)
    if query is not None:
        out.append("?" + query)
    if fragment is not None:
        out.append("#" + fragment)
    return "".join(out)


# -- file <-> URI mapping (POSIX) ------------------------------------------

# characters escaped when turning a filename into a file: URI
# (reference: raptor_uri_filename_char_needs_escape, raptor_uri.c:145-170)
_FILENAME_ESCAPE_SET = set('%#?<>"{}|^`[]\\')


def _filename_char_needs_escape(c: str) -> bool:
    o = ord(c)
    return o <= 0x20 or 0x7F <= o <= 0xFF or c in _FILENAME_ESCAPE_SET


def filename_to_uri(filename: Optional[str],
                    cwd: Optional[str] = None) -> Optional[str]:
    """Convert a POSIX filename to a file: URI.

    Unsafe URI characters become %XX escapes and the resulting path is
    dot-segment normalized (reference:
    raptor_uri_counted_filename_to_uri_string, raptor_uri.c:832-1060,
    POSIX branch). Relative filenames are joined to @cwd; pass cwd
    explicitly in distributed code — the implicit getcwd of the C is
    driver-state a cluster job must not depend on. Non-ASCII characters
    are escaped as the %XX sequence of each UTF-8 byte.
    """
    if not filename:
        return None
    if not filename.startswith("/"):
        if cwd is None:
            import os

            cwd = os.getcwd()
        filename = cwd.rstrip("/") + "/" + filename
    out = []
    for b in filename.encode("utf-8"):
        c = chr(b)
        if _filename_char_needs_escape(c):
            out.append("%%%02X" % b)
        else:
            out.append(c)
    return "file://" + normalize_path("".join(out))


def uri_to_filename_fragment(
    uri_string: Optional[str],
) -> Tuple[Optional[str], Optional[str]]:
    """Convert a file: URI to a (filename, fragment) pair, POSIX rules.

    Reference: raptor_uri_uri_string_to_counted_filename_fragment
    (raptor_uri.c:1100-1260). Rejections return (None, None): non-file
    schemes, non-local authorities (anything but "" / "localhost"),
    empty paths, malformed %-escapes and %00. The decoded path is
    dot-segment normalized so crafted file URIs cannot traverse above
    the root (the reference's Issue security fix).
    """
    if not uri_string:
        return None, None
    ud = uri_parse(uri_string)
    if ud.scheme is None or ud.scheme.lower() != "file":
        return None, None
    authority = ud.authority
    if authority is not None:
        if authority == "" or authority.lower() == "localhost":
            authority = None
        else:
            return None, None  # POSIX: no remote authorities
    if not ud.path:
        return None, None
    # percent-decode bytes; reject malformed escapes and decoded NULs
    raw = ud.path.encode("utf-8")
    out = bytearray()
    i = 0
    hexdigits = b"0123456789ABCDEFabcdef"
    while i < len(raw):
        b = raw[i]
        if b == 0x25:  # '%'
            if (
                i + 2 >= len(raw)
                or raw[i + 1] not in hexdigits
                or raw[i + 2] not in hexdigits
            ):
                return None, None
            v = int(raw[i + 1 : i + 3].decode("ascii"), 16)
            if v == 0:
                return None, None
            out.append(v)
            i += 3
        else:
            out.append(b)
            i += 1
    try:
        filename = out.decode("utf-8")
    except UnicodeDecodeError:
        return None, None
    filename = normalize_path(filename)
    return filename, ud.fragment


def uri_to_filename(uri_string: Optional[str]) -> Optional[str]:
    """file: URI -> filename (reference:
    raptor_uri_uri_string_to_filename)."""
    return uri_to_filename_fragment(uri_string)[0]
