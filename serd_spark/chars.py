"""Character classes from the W3C Turtle/NTriples grammars.

Clean-room from the public W3C Turtle 1.1 EBNF (§6.5 "Grammar").
Behavioral parity target: the reference's classification tables
(/root/reference/src/turtle.h, src/ntriples.h, src/string_utils.h) —
which implement the same public grammar.
"""

from __future__ import annotations

_PN_CHARS_BASE_RANGES = (
    (0x41, 0x5A), (0x61, 0x7A), (0xC0, 0xD6), (0xD8, 0xF6),
    (0xF8, 0x2FF), (0x370, 0x37D), (0x37F, 0x1FFF), (0x200C, 0x200D),
    (0x2070, 0x218F), (0x2C00, 0x2FEF), (0x3001, 0xD7FF),
    (0xF900, 0xFDCF), (0xFDF0, 0xFFFD), (0x10000, 0xEFFFF),
)

_PN_CHARS_EXTRA_RANGES = ((0x300, 0x36F), (0x203F, 0x2040))


def is_pn_chars_base(ch: str) -> bool:
    c = ord(ch)
    return any(lo <= c <= hi for lo, hi in _PN_CHARS_BASE_RANGES)


def is_pn_chars_u(ch: str) -> bool:
    return ch == "_" or is_pn_chars_base(ch)


def is_pn_chars(ch: str) -> bool:
    if is_pn_chars_u(ch) or ch == "-" or ch.isdigit() and ch.isascii():
        return True
    c = ord(ch)
    return c == 0xB7 or any(lo <= c <= hi for lo, hi in _PN_CHARS_EXTRA_RANGES)


def is_digit(ch: str) -> bool:
    return "0" <= ch <= "9"


def is_hex(ch: str) -> bool:
    return ("0" <= ch <= "9") or ("A" <= ch <= "F") or ("a" <= ch <= "f")


def is_ws(ch: str) -> bool:
    return ch in " \t\r\n"


# Characters that may not appear raw inside an IRIREF (<...>):
# control chars and the explicit exclusion set from IRIREF production.
IRI_FORBIDDEN = set('<>"{}|^`\\ ')


def iri_char_ok(ch: str) -> bool:
    return ord(ch) > 0x20 and ch not in IRI_FORBIDDEN


# PN_LOCAL_ESC set (Turtle §6.5, production 172s).
PN_LOCAL_ESC = set("_~.-!$&'()*+,;=/?#@%")
