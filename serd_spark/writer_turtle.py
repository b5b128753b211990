"""Turtle/TriG abbreviating writer (O-26/O-27/O-28).

Re-expresses the reference's abbreviation state machine
(/root/reference/src/writer.c:1036-1228) as a *structural* pretty
printer over a completed triple set (we have the whole group, so no
streaming flag protocol is needed):

- subject/predicate elision via ';' and ','
- 'a' for rdf:type in the predicate position
- CURIE qualification against a prefix map (first match, O-21)
- bare integer/decimal/double/boolean literals when lexically valid
- '[ ... ]' inlining for blanks referenced exactly once as an object
- '( ... )' reconstruction of rdf:first/rdf:rest lists, '()' for nil
- '@prefix' header block (O-28), TriG '{}' graph sections (O-27)

Round-trip property (the 'perfect' suite analogue): parse(write(T))
is isomorphic to T — enforced by tests over the whole W3C corpus.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Optional, Sequence

from .escapes import escape_iri
from .nodes import (
    BLANK,
    LITERAL,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    URI,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    Triple,
)

_INTEGER_RE = re.compile(r"^[+-]?[0-9]+$")
_DECIMAL_RE = re.compile(r"^[+-]?[0-9]*\.[0-9]+$")
_DOUBLE_RE = re.compile(
    r"^[+-]?(?:[0-9]+\.[0-9]*|\.[0-9]+|[0-9]+)[eE][+-]?[0-9]+$")

_PN_LOCAL_OK = re.compile(r"^[A-Za-z0-9_\-.:]*$")


class TurtleWriter:
    def __init__(self, prefixes: Optional[dict[str, str]] = None,
                 indent: str = "\t"):
        self.prefixes = dict(prefixes or {})
        self.indent = indent

    # ---- term formatting ----

    def _qualify(self, iri: str) -> Optional[str]:
        for name, ns in self.prefixes.items():
            if ns and iri.startswith(ns):
                local = iri[len(ns):]
                if _PN_LOCAL_OK.match(local) and not local.endswith("."):
                    return f"{name}:{local}"
        return None

    def fmt_iri(self, iri: str) -> str:
        q = self._qualify(iri)
        if q is not None:
            return q
        return f"<{escape_iri(iri)}>"

    def fmt_literal(self, value: str, datatype: Optional[str],
                    lang: Optional[str]) -> str:
        # Bare spellings when the lexical form is valid (writer.c
        # inline-literal rule + get_xsd_name).
        if lang is None:
            if datatype == XSD_BOOLEAN and value in ("true", "false"):
                return value
            if datatype == XSD_INTEGER and _INTEGER_RE.match(value):
                return value
            if datatype == XSD_DECIMAL and _DECIMAL_RE.match(value):
                return value
            if datatype == XSD_DOUBLE and _DOUBLE_RE.match(value):
                return value
        if "\n" in value or "\r" in value or '"' in value:
            body = value.replace("\\", "\\\\")
            # close-quote safety inside long strings
            body = body.replace('"""', '\\"\\"\\"')
            if body.endswith('"'):
                body = body[:-1] + '\\"'
            s = f'"""{body}"""'
        else:
            esc = (value.replace("\\", "\\\\").replace('"', '\\"')
                   .replace("\t", "\\t"))
            s = f'"{esc}"'
        if lang:
            return f"{s}@{lang}"
        if datatype:
            return f"{s}^^{self.fmt_iri(datatype)}"
        return s

    # ---- document writing ----

    def write(self, triples: Sequence[Triple], trig: bool = False) -> str:
        out: list[str] = []
        for name in sorted(self.prefixes):
            out.append(f"@prefix {name}: <{self.prefixes[name]}> .")
        if out:
            out.append("")

        by_graph: dict[Optional[str], list[Triple]] = defaultdict(list)
        for t in triples:
            by_graph[t.g].append(t)

        for g in sorted(by_graph, key=lambda x: (x is not None, x or "")):
            body = self._write_graph(by_graph[g])
            if g is None:
                out.extend(body)
            else:
                label = g if g.startswith("_:") else self.fmt_iri(g)
                out.append(f"{label} {{")
                out.extend(self.indent + ln for ln in body)
                out.append("}")
        return "\n".join(out) + "\n"

    def _write_graph(self, triples: list[Triple]) -> list[str]:
        # Structural analysis of blanks within this graph.
        subj_of: dict[str, list[Triple]] = defaultdict(list)
        obj_refs: dict[str, int] = defaultdict(int)
        for t in triples:
            if t.s_type == BLANK:
                subj_of[t.s].append(t)
            if t.o_type == BLANK:
                obj_refs[t.o] += 1

        def is_list_node(b: str, seen: set[str]) -> bool:
            if b in seen:
                return False
            ts = subj_of.get(b, [])
            preds = sorted(t.p for t in ts)
            if preds != [RDF_FIRST, RDF_REST]:
                return False
            rest = next(t for t in ts if t.p == RDF_REST)
            if rest.o_type == URI and rest.o == RDF_NIL:
                return True
            if rest.o_type == BLANK and obj_refs[rest.o] == 1:
                return is_list_node(rest.o, seen | {b})
            return False

        consumed: set[int] = set()
        inlining: set[str] = set()  # cycle guard during recursion

        def inlinable(b: str) -> bool:
            return (obj_refs[b] == 1 and b in subj_of
                    and b not in inlining
                    and any(id(t) not in consumed for t in subj_of[b]))

        def consume(b: str) -> list[Triple]:
            group = [t for t in subj_of[b] if id(t) not in consumed]
            for t in group:
                consumed.add(id(t))
            return group

        def fmt_obj(t: Triple, depth: int) -> str:
            if t.o_type == URI:
                return self.fmt_iri(t.o)
            if t.o_type == BLANK:
                b = t.o
                if inlinable(b):
                    inlining.add(b)
                    try:
                        if is_list_node(b, set()):
                            return self._fmt_list(
                                b, subj_of, consume, fmt_obj, depth)
                        group = consume(b)
                        return ("[ " + self._fmt_pol(group, fmt_obj,
                                                     depth + 1) + " ]")
                    finally:
                        pass  # keep b in `inlining`: it is used up
                if b in subj_of or obj_refs[b] > 1:
                    return f"_:{b}"
                return "[]"
            return self.fmt_literal(t.o, t.o_datatype, t.o_lang)

        lines: list[str] = []
        by_subject: dict[tuple, list[Triple]] = defaultdict(list)
        for t in triples:
            by_subject[(t.s, t.s_type)].append(t)

        # First emit IRI-subject groups (inlining happens inside),
        # then any blank-subject groups left unconsumed (incl. cycles).
        ordered = sorted(by_subject, key=lambda k: (k[1] == BLANK, k[0]))
        for (s, s_type) in ordered:
            if s_type == BLANK and inlinable(s):
                # will be (or was) inlined under its single referrer —
                # unless that referrer never gets emitted (cycle); the
                # leftover pass below catches that case.
                continue
            group = [t for t in by_subject[(s, s_type)]
                     if id(t) not in consumed]
            if not group:
                continue
            for t in group:
                consumed.add(id(t))
            subj = self.fmt_iri(s) if s_type == URI else f"_:{s}"
            lines.append(f"{subj} {self._fmt_pol(group, fmt_obj, 1)} .")

        # Leftovers: blank-subject groups not reached by inlining
        # (reference cycles, dangling structures) — labeled form.
        for (s, s_type) in ordered:
            group = [t for t in by_subject[(s, s_type)]
                     if id(t) not in consumed]
            if not group:
                continue
            for t in group:
                consumed.add(id(t))
            subj = self.fmt_iri(s) if s_type == URI else f"_:{s}"
            lines.append(f"{subj} {self._fmt_pol(group, fmt_obj, 1)} .")
        return lines

    def _fmt_pol(self, group: list[Triple], fmt_obj, depth: int) -> str:
        by_pred: dict[tuple, list[Triple]] = defaultdict(list)
        order: list[tuple] = []
        for t in group:
            k = (t.p,)
            if k not in by_pred:
                order.append(k)
            by_pred[k].append(t)
        parts = []
        for k in sorted(order):
            p = k[0]
            pred = "a" if p == RDF_TYPE else self.fmt_iri(p)
            objs = ", ".join(
                fmt_obj(t, depth) for t in sorted(
                    by_pred[k], key=lambda x: (x.o_type, x.o)))
            parts.append(f"{pred} {objs}")
        return " ;\n\t".join(parts)

    def _fmt_list(self, b: str, subj_of, consume, fmt_obj,
                  depth: int) -> str:
        items = []
        node = b
        while True:
            ts = consume(node)
            first = next(t for t in ts if t.p == RDF_FIRST)
            rest = next(t for t in ts if t.p == RDF_REST)
            items.append(fmt_obj(first, depth + 1))
            if rest.o_type == URI and rest.o == RDF_NIL:
                break
            node = rest.o
        return "( " + " ".join(items) + " )"


def write_turtle(triples: Sequence[Triple],
                 prefixes: Optional[dict[str, str]] = None,
                 trig: bool = False) -> str:
    return TurtleWriter(prefixes).write(triples, trig=trig)
