"""String escape handling: UCHAR/ECHAR unescaping + canonical writer
escaping.

Reader-side parity targets: ECHAR table /root/reference/src/n3.c:133-158,
UCHAR \\uXXXX/\\UXXXXXXXX with surrogate rejection src/n3.c:55-130.
Writer-side parity: the canonical NTriples escape set
(/root/reference/src/writer.c:488-544).

Pure functions; vectorized use is via ``pandas.Series.map`` inside an
Arrow-batched UDF, and the writer path additionally has a regex fast
path (scan-to-next-escape — same idea as the reference's
``next_text_index`` bulk copy, src/writer.c:352-363).
"""

from __future__ import annotations

import re

ECHAR_MAP = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    "\\": "\\", '"': '"', "'": "'",
}


class EscapeError(ValueError):
    pass


def decode_uchar(hex_str: str, lax: bool = False) -> str:
    """Decode the hex payload of a \\u or \\U escape; reject surrogates
    and out-of-range code points (cf. src/n3.c:82-101).  Lax mode
    substitutes U+FFFD for both (the reference's non-strict read_UCHAR
    branches repair rather than emit invalid scalars; a lone surrogate
    in a Python str would crash any later plain-UTF-8 encode)."""
    code = int(hex_str, 16)
    if 0xD800 <= code <= 0xDFFF:
        if lax:
            return "�"
        raise EscapeError(f"escape U+{code:04X} is a surrogate")
    if code > 0x10FFFF:
        if lax:
            return "�"
        raise EscapeError(f"escape U+{code:X} out of range")
    return chr(code)


_UNESCAPE_RE = re.compile(
    r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))", re.S
)


def unescape_string(s: str) -> str:
    """Unescape ECHAR + UCHAR sequences in a quoted-literal body."""
    if "\\" not in s:
        return s

    def sub(m: re.Match) -> str:
        u4, u8, e = m.groups()
        if u4 is not None:
            return decode_uchar(u4)
        if u8 is not None:
            return decode_uchar(u8)
        if e in ECHAR_MAP:
            return ECHAR_MAP[e]
        raise EscapeError(f"invalid escape '\\{e}'")

    return _UNESCAPE_RE.sub(sub, s)


def unescape_uchar_only(s: str) -> str:
    """Unescape only \\u/\\U (for IRIREF bodies, where ECHAR is illegal)."""
    if "\\" not in s:
        return s

    def sub(m: re.Match) -> str:
        u4, u8, e = m.groups()
        if u4 is not None:
            return decode_uchar(u4)
        if u8 is not None:
            return decode_uchar(u8)
        raise EscapeError(f"invalid IRI escape '\\{e}'")

    return _UNESCAPE_RE.sub(sub, s)


# --- writer side (canonical NTriples/NQuads spelling, O-25) ---

_LITERAL_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}
_LITERAL_ESC_RE = re.compile(r'[\\"\n\r\t]')


def escape_literal(s: str) -> str:
    """Canonical NTriples literal escaping: \\\\ \\\" \\n \\r \\t are
    escaped; everything else (incl. non-ASCII) passes through as UTF-8
    — matching the reference's non-ASCII-permitting default.
    """
    if _LITERAL_ESC_RE.search(s) is None:
        return s
    return _LITERAL_ESC_RE.sub(lambda m: _LITERAL_ESCAPES[m.group()], s)


_IRI_ESC_RE = re.compile(r'[\x00-\x20<>"{}|^`\\]')


def escape_iri(s: str) -> str:
    """Escape characters that may not appear raw in a written IRIREF
    as \\uXXXX (cf. uri_must_escape, src/writer.c:345-350)."""
    if _IRI_ESC_RE.search(s) is None:
        return s
    return _IRI_ESC_RE.sub(lambda m: "\\u%04X" % ord(m.group()), s)


def escape_literal_ascii(s: str) -> str:
    """Full ASCII mode (serdi -a): additionally escape all non-ASCII
    and remaining C0 controls as \\uXXXX / \\UXXXXXXXX."""
    out = []
    for ch in escape_literal(s):
        c = ord(ch)
        if c < 0x20 and ch not in ("\t",):
            out.append("\\u%04X" % c)
        elif ch == "\t":
            out.append("\\t")
        elif c > 0x7E:
            out.append("\\u%04X" % c if c <= 0xFFFF else "\\U%08X" % c)
        else:
            out.append(ch)
    return "".join(out)


def escape_iri_ascii(s: str) -> str:
    """IRIREF escaping in full ASCII mode (serdi's NTriples/NQuads
    output style): uri_must_escape chars plus every non-ASCII char as
    \\uXXXX / \\UXXXXXXXX (write_uri_character, src/writer.c:325-343)."""
    out = []
    for ch in s:
        c = ord(ch)
        if c <= 0x20 or c == 0x7F or ch in '<>"{}|^`\\' or c > 0x7E:
            out.append("\\u%04X" % c if c <= 0xFFFF else "\\U%08X" % c)
        else:
            out.append(ch)
    return "".join(out)
