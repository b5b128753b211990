"""Line-based NTriples / NQuads parser.

Clean-room from the public W3C N-Triples/N-Quads grammars; parity
target: the reference's line reader (/root/reference/src/n3.c:
1585-1660).  One statement per line makes this the *parallel-friendly*
syntax — a document splits on '\\n' with no cross-line state, so the
Spark stage can explode lines across partitions (operators/parse.py).

A compiled whole-line regex handles the overwhelmingly common shapes
in one pass (vectorizable across a pandas batch); lines that fail the
fast path (escapes, exotic labels) fall back to a character scanner.
"""

from __future__ import annotations

import re
from typing import Optional

from .chars import (
    decode_rdf_text,
    is_digit,
    is_hex,
    is_pn_chars,
    is_pn_chars_u,
)
from .escapes import EscapeError, unescape_string, unescape_uchar_only
from .nodes import BLANK, LITERAL, URI, Node, Triple
from .uri import uri_is_absolute


class NTParseError(ValueError):
    pass


_IRI = r"<((?:[^\x00-\x20<>\"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*)>"
_BLANK = r"_:([^\s<>\"]+)"
# Literal with optional ^^<datatype> or @lang.
_LIT = (
    r'"((?:[^"\\\n\r]|\\.)*)"'
    r"(?:\^\^<((?:[^\x00-\x20<>\"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*)>"
    r"|@([A-Za-z]+(?:-[A-Za-z0-9]+)*))?"
)

# Whitespace between terms is optional where terms self-delimit
# (e.g. '<s><p><o>.'), so use * not +.
_WS = r"[ \t]*"
_OWS = r"[ \t]*"

_LINE_RE = re.compile(
    "^" + _OWS
    + f"(?:{_IRI}|{_BLANK})" + _WS          # subject: g1=iri, g2=blank
    + _IRI + _WS                             # predicate: g3
    + f"(?:{_IRI}|{_BLANK}|{_LIT})"          # object: g4=iri g5=blank g6=lit g7=dt g8=lang
    + f"(?:{_WS}(?:{_IRI}|{_BLANK}))?"       # graph: g9=iri g10=blank
    + _OWS + r"\." + _OWS + r"(?:#.*)?$"
)

_COMMENT_RE = re.compile(r"^[ \t\r\n]*(?:#.*)?$")

# Lax variant: raw control chars/space stay inside IRIs with a warning
# (n3.c:646-655 non-strict branch); exclusion set still forbidden.
_IRI_LAX = (r"<((?:[^<>\"{}|^`\\]"
            r"|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*)>")
_LINE_RE_LAX = re.compile(
    "^" + _OWS
    + f"(?:{_IRI_LAX}|{_BLANK})" + _WS
    + _IRI_LAX + _WS
    + f"(?:{_IRI_LAX}|{_BLANK}|{_LIT})"
    + f"(?:{_WS}(?:{_IRI_LAX}|{_BLANK}))?"
    + _OWS + r"\." + _OWS + r"(?:#.*)?$"
)


def _check_label(label: str) -> str:
    """Validate an N-Triples blank label (permissive regex above may
    over-capture; enforce PN_CHARS rules + trailing-dot exclusion)."""
    if not label:
        raise NTParseError("empty blank label")
    c0 = label[0]
    if not (is_pn_chars_u(c0) or is_digit(c0)):
        raise NTParseError(f"bad blank label start {c0!r}")
    for ch in label[1:-1]:
        if not (is_pn_chars(ch) or ch == "."):
            raise NTParseError(f"bad blank label char {ch!r}")
    if len(label) > 1:
        last = label[-1]
        if not is_pn_chars(last):
            raise NTParseError(f"bad blank label end {last!r}")
    return label


def _iri(raw: str, what: str) -> str:
    value = unescape_uchar_only(raw)
    if not uri_is_absolute(value):
        raise NTParseError(f"relative {what} IRI {value!r} in N-Triples")
    return value


def parse_nt_line(
    line: str, blank_prefix: str = "", nquads: bool = True,
    lax: bool = False,
) -> Optional[Triple]:
    """Parse one N-Triples/N-Quads line → Triple, or None for blank/
    comment lines.  Raises NTParseError on bad syntax."""
    if _COMMENT_RE.match(line):
        return None
    m = _LINE_RE.match(line)
    if m is None and lax:
        m = _LINE_RE_LAX.match(line)
    if not m:
        raise NTParseError(f"bad N-Triples line: {line[:80]!r}")
    (s_iri, s_blank, p_iri, o_iri, o_blank, o_lit, o_dt, o_lang,
     g_iri, g_blank) = m.groups()

    if (g_iri is not None or g_blank is not None) and not nquads:
        raise NTParseError("graph label not allowed in N-Triples")

    if s_iri is not None:
        s_val, s_type = _iri(s_iri, "subject"), URI
    else:
        s_val, s_type = blank_prefix + _check_label(s_blank), BLANK

    p_val = _iri(p_iri, "predicate")

    o_datatype = None
    o_lang_v = None
    if o_iri is not None:
        o_val, o_type = _iri(o_iri, "object"), URI
    elif o_blank is not None:
        o_val, o_type = blank_prefix + _check_label(o_blank), BLANK
    else:
        o_val, o_type = unescape_string(o_lit), LITERAL
        if o_dt is not None:
            o_datatype = _iri(o_dt, "datatype")
        elif o_lang is not None:
            o_lang_v = o_lang

    g_val = None
    if g_iri is not None:
        g_val = _iri(g_iri, "graph")
    elif g_blank is not None:
        g_val = "_:" + blank_prefix + _check_label(g_blank)

    return Triple(g_val, s_val, s_type, p_val, o_val, o_type,
                  o_datatype, o_lang_v)


def parse_ntriples(
    text: str,
    blank_prefix: str = "",
    nquads: bool = True,
    lax: bool = False,
) -> tuple[list[Triple], list[tuple[int, str]]]:
    """Parse a whole N-Triples/N-Quads document.

    Returns (triples, errors) where errors = [(line_no, message)].
    Strict mode stops at the first error (like the reference's strict
    reader); lax mode quarantines the line and continues (O-17).

    ``text`` may be raw bytes: strict mode rejects invalid UTF-8 at the
    offending byte, lax mode substitutes U+FFFD (read_utf8.c parity).
    """
    utf8_err = None
    if isinstance(text, (bytes, bytearray)):
        text, utf8_err = decode_rdf_text(text, lax)
    if text.startswith("﻿"):
        text = text[1:]
    triples: list[Triple] = []
    errors: list[tuple[int, str]] = []
    for ln, line in enumerate(text.split("\n"), start=1):
        try:
            t = parse_nt_line(line, blank_prefix=blank_prefix,
                              nquads=nquads, lax=lax)
        except (NTParseError, EscapeError) as e:
            errors.append((ln, str(e)))
            if not lax:
                break
            continue
        if t is not None:
            triples.append(t)
    if utf8_err is not None:
        errors.append(utf8_err)
    return triples, errors
