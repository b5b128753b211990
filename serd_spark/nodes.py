"""RDF node type tags and the triple row schema.

Mirrors the reference's 5-valued node-type domain
(/root/reference/include/serd/serd.h:323-364): NOTHING/LITERAL/URI/
CURIE/BLANK.  CURIE is a syntactic type erased by expansion — our
parser expands CURIEs inline (it owns the Env fold), so emitted rows
only ever carry URI/BLANK/LITERAL.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

# Node type tags (stable byte values used in the triples DataFrame).
NOTHING = 0
LITERAL = 1
URI = 2
CURIE = 3  # transient, never emitted
BLANK = 4

TYPE_NAMES = {NOTHING: "nothing", LITERAL: "literal", URI: "uri",
              CURIE: "curie", BLANK: "blank"}

# Well-known namespaces (public RDF/XSD constants; cf.
# /root/reference/src/serd_internal.h:10-12).
NS_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
NS_XSD = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = NS_RDF + "type"
RDF_FIRST = NS_RDF + "first"
RDF_REST = NS_RDF + "rest"
RDF_NIL = NS_RDF + "nil"

XSD_INTEGER = NS_XSD + "integer"
XSD_DECIMAL = NS_XSD + "decimal"
XSD_DOUBLE = NS_XSD + "double"
XSD_BOOLEAN = NS_XSD + "boolean"
XSD_BASE64 = NS_XSD + "base64Binary"


class Node(NamedTuple):
    """One RDF term: value + type tag + optional datatype/lang."""

    value: str
    type: int
    datatype: Optional[str] = None
    lang: Optional[str] = None


class Triple(NamedTuple):
    """One emitted statement (quad).  ``g`` is None in the default graph.

    Mirrors the statement-sink signature
    (/root/reference/include/serd/serd.h:576-584) flattened to a row.
    """

    g: Optional[str]
    s: str
    s_type: int
    p: str
    o: str
    o_type: int
    o_datatype: Optional[str] = None
    o_lang: Optional[str] = None


# Spark-side schema string for a triples DataFrame (adds lineage cols).
TRIPLES_SCHEMA = (
    "conv_id string, stmt_idx long, g string, s string, s_type int, "
    "p string, o string, o_type int, o_datatype string, o_lang string"
)

# Error-ledger schema for lax-mode quarantine (O-17).
ERRORS_SCHEMA = "conv_id string, err_idx long, message string, fragment string"


# ---- node value constructors (O-30; parity: src/node.c:271-367,
# src/base64.c:51-125) ----

import base64 as _b64
import math as _math
import re as _re
import sys as _sys


def node_new_integer(i: int) -> Node:
    """xsd:integer literal from a value (serd_node_new_integer,
    src/node.c:326-348): plain decimal digits, '-' for negatives,
    never scientific."""
    return Node(str(int(i)), LITERAL, datatype=XSD_INTEGER)


def node_new_decimal(d: float, frac_digits: int) -> Optional[Node]:
    """xsd:decimal literal from a double (serd_node_new_decimal,
    src/node.c:271-324): always a '.', at least one fractional digit,
    trailing zeros trimmed, never scientific notation.  NaN/Inf have
    no decimal form -> None (the reference returns SERD_NODE_NULL).

    One deliberate divergence: when the fraction rounds up to 1.0
    (e.g. 0.999999999 at 8 digits) we carry into the integer part;
    the reference's digit loop drops the carry.
    """
    if _math.isnan(d) or _math.isinf(d):
        return None
    neg = d < 0.0
    abs_d = abs(d)
    int_part = int(_math.floor(abs_d))
    frac_part = abs_d - int_part
    sign = "-" if neg else ""
    if frac_part < _sys.float_info.epsilon:
        return Node(f"{sign}{int_part}.0", LITERAL, datatype=XSD_DECIMAL)
    # llround semantics: half away from zero (frac_part >= 0 here)
    frac = int(_math.floor(frac_part * 10.0 ** frac_digits + 0.5))
    if frac >= 10 ** frac_digits:  # carry (see docstring)
        int_part += 1
        frac = 0
    if frac == 0:
        return Node(f"{sign}{int_part}.0", LITERAL, datatype=XSD_DECIMAL)
    fs = str(frac).rjust(frac_digits, "0").rstrip("0") or "0"
    return Node(f"{sign}{int_part}.{fs}", LITERAL, datatype=XSD_DECIMAL)


def base64_encode(data: bytes, wrap_lines: bool = False) -> str:
    """RFC-3548 base64 (serd_base64_encode, src/base64.c:57-81):
    '=' padding; with ``wrap_lines``, a newline after every 57 input
    bytes (76 encoded chars — the RFC-2045 line limit)."""
    if not wrap_lines or len(data) <= 57:
        return _b64.b64encode(data).decode("ascii")
    return "\n".join(
        _b64.b64encode(data[i:i + 57]).decode("ascii")
        for i in range(0, len(data), 57))


_B64_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/")
_B64_VAL = {c: i for i, c in enumerate(_B64_ALPHABET)}


def base64_decode(s: str) -> bytes:
    """Decode base64, skipping junk characters (serd_base64_decode,
    src/base64.c:96-125, tolerant mode): anything outside the alphabet
    is ignored; '=' IS part of the alphabet and terminates output
    within its 4-char chunk, so an interior '=' (e.g. ``'TW=Fu'``)
    decodes the chunk prefix and decoding continues with the next
    chunk — never an exception.  A chunk holding fewer than two real
    characters is dropped (the reference's ``n_in > 1`` gate).

    Deliberate divergence: a degenerate '=' in chunk position 0/1
    contributes 0 bits here, where the reference emits an
    uninitialized-table garbage byte — both are garbage-in paths."""
    chars = [c for c in s if c in _B64_VAL or c == "="]
    out = bytearray()
    for i in range(0, len(chars), 4):
        chunk = chars[i:i + 4]
        if len(chunk) < 2:
            break  # lone trailing character: dropped
        chunk += ["="] * (4 - len(chunk))
        v = [_B64_VAL.get(c, 0) for c in chunk]
        out.append(((v[0] << 2) | (v[1] >> 4)) & 0xFF)
        if chunk[2] != "=":
            out.append(((v[1] << 4) | (v[2] >> 2)) & 0xFF)
            if chunk[3] != "=":
                out.append(((v[2] << 6) | v[3]) & 0xFF)
    return bytes(out)


def node_new_blob(data: bytes, wrap_lines: bool = False) -> Node:
    """xsd:base64Binary literal from raw bytes (serd_node_new_blob,
    src/node.c:350-367)."""
    return Node(base64_encode(data, wrap_lines), LITERAL,
                datatype=XSD_BASE64)
