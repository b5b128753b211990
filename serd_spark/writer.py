"""Canonical NTriples/NQuads line formatting (O-24/O-25) and triple
sorting keys.

Parity target: the reference's NTriples fast path
(/root/reference/src/writer.c:1072-1085) and escape tables
(writer.c:488-544).  The Spark-side sorted materialization lives in
``operators/materialize.py``; these pure functions format one term /
one statement and are applied vectorized over pandas columns.
"""

from __future__ import annotations

from typing import Optional

from .escapes import escape_iri, escape_literal
from .nodes import BLANK, LITERAL, URI, Triple


def format_term(value: str, type_: int,
                datatype: Optional[str] = None,
                lang: Optional[str] = None) -> str:
    if type_ == URI:
        return f"<{escape_iri(value)}>"
    if type_ == BLANK:
        return f"_:{value}"
    if type_ == LITERAL:
        body = f'"{escape_literal(value)}"'
        if lang:
            return f"{body}@{lang}"
        if datatype:
            return f"{body}^^<{escape_iri(datatype)}>"
        return body
    raise ValueError(f"cannot write node type {type_}")


def format_statement(t: Triple) -> str:
    """One canonical NQuads line (graph omitted when None)."""
    parts = [
        format_term(t.s, t.s_type),
        format_term(t.p, URI),
        format_term(t.o, t.o_type, t.o_datatype, t.o_lang),
    ]
    if t.g is not None:
        parts.append(f"<{escape_iri(t.g)}>" if not t.g.startswith("_:")
                     else t.g)
    return " ".join(parts) + " ."


def statement_sort_key(t: Triple) -> tuple:
    """Total order for deterministic output (g,s,p,o,...)."""
    return (t.g or "", t.s, t.p, t.o, t.o_type,
            t.o_datatype or "", t.o_lang or "")
