"""RFC 3986 URI parsing and reference resolution (pure functions).

Clean-room implementation of the public algorithms in RFC 3986 §5.2
(resolution, path merge, remove_dot_segments).  Behavioral parity
target: the reference's resolver (/root/reference/src/uri.c:118-343),
which passes all "normal examples" from RFC 3986 §5.4 — our unit
tests encode the full §5.4.1 + §5.4.2 matrices.

These are plain string functions so they can be applied over a
``pandas.Series`` via ``Series.map`` inside an Arrow-batched pandas
UDF; no Spark imports here.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

_URI_RE = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.S,
)

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*$")


class URIParts(NamedTuple):
    scheme: Optional[str]
    authority: Optional[str]
    path: str
    query: Optional[str]
    fragment: Optional[str]


def uri_parse(uri: str) -> URIParts:
    """Split a URI reference into its five RFC 3986 components."""
    m = _URI_RE.match(uri)
    assert m is not None  # the regex matches any string
    scheme, authority, path, query, fragment = m.groups()
    if scheme is not None and not _SCHEME_RE.match(scheme):
        # Not a valid scheme: the ':' belongs to the path (rare; RDF
        # IRIs are pre-validated so this mostly guards junk input).
        return URIParts(None, authority, uri.split("#", 1)[0], query, fragment)
    return URIParts(scheme, authority, path, query, fragment)


def uri_is_absolute(uri: str) -> bool:
    """True iff the reference has a scheme (cf. uri_utils scheme check)."""
    i = uri.find(":")
    if i <= 0:
        return False
    return _SCHEME_RE.match(uri[:i]) is not None


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            if path.startswith("/"):
                i = path.find("/", 1)
            else:
                i = path.find("/")
            if i == -1:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _merge(base: URIParts, ref_path: str) -> str:
    """RFC 3986 §5.2.3."""
    if base.authority is not None and base.path == "":
        return "/" + ref_path
    i = base.path.rfind("/")
    if i == -1:
        return ref_path
    return base.path[: i + 1] + ref_path


def uri_unparse(p: URIParts) -> str:
    """RFC 3986 §5.3 component recomposition."""
    out = []
    if p.scheme is not None:
        out.append(p.scheme)
        out.append(":")
    if p.authority is not None:
        out.append("//")
        out.append(p.authority)
    out.append(p.path)
    if p.query is not None:
        out.append("?")
        out.append(p.query)
    if p.fragment is not None:
        out.append("#")
        out.append(p.fragment)
    return "".join(out)


def uri_resolve(ref: str, base: str) -> str:
    """Resolve ``ref`` against ``base`` per RFC 3986 §5.2.2.

    Matches the reference resolver's observable behavior
    (/root/reference/src/uri.c:299-343): absolute references pass
    through verbatim (RDF IRIs are not normalized), relative ones get
    the full merge + remove_dot_segments treatment.
    """
    if not base:
        return ref
    r = uri_parse(ref)
    if r.scheme is not None:
        # Absolute: emit verbatim (no dot-segment normalization of
        # already-absolute IRIs — RDF semantics, and serd parity).
        return ref
    b = uri_parse(base)
    if r.authority is not None:
        t = URIParts(b.scheme, r.authority, remove_dot_segments(r.path),
                     r.query, r.fragment)
    elif r.path == "":
        t = URIParts(b.scheme, b.authority, b.path,
                     r.query if r.query is not None else b.query, r.fragment)
    elif r.path.startswith("/"):
        t = URIParts(b.scheme, b.authority, remove_dot_segments(r.path),
                     r.query, r.fragment)
    else:
        t = URIParts(b.scheme, b.authority,
                     remove_dot_segments(_merge(b, r.path)),
                     r.query, r.fragment)
    return uri_unparse(t)


# --- file URI <-> path (O-23; cf. /root/reference/src/uri.c:45-95) ---

_HEX = "0123456789ABCDEF"


def node_new_file_uri(path: str, hostname: str = "") -> str:
    """Build a file:// URI from a filesystem path with %-escaping."""
    is_abs = path.startswith("/") or (
        len(path) >= 2 and path[0].isalpha() and path[1] == ":")
    out = []
    if is_abs or hostname:
        out.append("file://")
        if hostname:
            out.append(hostname)
        if not path.startswith("/"):
            out.append("/")
    for ch in path:
        b = ch.encode("utf-8")
        if ch in " \"<>[]\\^`{|}%" or any(x <= 0x20 or x >= 0x7F for x in b):
            for x in b:
                out.append("%" + _HEX[x >> 4] + _HEX[x & 15])
        else:
            out.append(ch)
    return "".join(out)


def file_uri_parse(uri: str) -> tuple[str, str]:
    """Parse a file URI into (hostname, path); junk escapes dropped."""
    rest = uri
    host = ""
    if rest.startswith("file://"):
        rest = rest[len("file://"):]
        i = rest.find("/")
        if i > 0:
            host, rest = rest[:i], rest[i:]
        elif i == -1:
            host, rest = rest, ""
    elif rest.startswith("file:"):
        rest = rest[len("file:"):]
    out = bytearray()
    i = 0
    while i < len(rest):
        c = rest[i]
        if c == "%" and i + 2 < len(rest) + 1:
            hx = rest[i + 1 : i + 3]
            if len(hx) == 2 and all(h in "0123456789abcdefABCDEF" for h in hx):
                out.append(int(hx, 16))
                i += 3
                continue
            i += 3  # junk escape: skip it entirely (reference parity)
            continue
        out.extend(c.encode("utf-8"))
        i += 1
    return host, out.decode("utf-8", errors="replace")
