"""Triple-multiset comparison, insensitive to blank-node labels.

Eval-test semantics mirror the reference's golden diff
(/root/reference/test/run_suite.py): the emitted statement multiset
must equal the golden one — except blank labels, where only structure
is meaningful, so we compare under a label bijection (FIXTURES.md F2).

Algorithm: shared-palette color refinement over both graphs (colors
interned to ints each round so they are comparable across graphs),
then pair blanks within each color class.  For interchangeable blanks
(one color class of identical structure — e.g. the reference's
10000-objects stress test) any within-class pairing is correct, so
this is linear; a bounded backtracking fallback covers the rare
refinement-too-coarse automorphism cases in small graphs.

Blank graph labels are carried as '_:label' in ``Triple.g`` so quads
participate in the bijection.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Optional, Sequence

from .nodes import BLANK, Triple


def _g_blank(g) -> Optional[str]:
    if g is not None and g.startswith("_:"):
        return g[2:]
    return None


def _skeleton(t: Triple) -> tuple:
    g = "_" if _g_blank(t.g) is not None else t.g
    s = "_" if t.s_type == BLANK else t.s
    o = "_" if t.o_type == BLANK else t.o
    return (g, s, t.s_type, t.p, o, t.o_type, t.o_datatype, t.o_lang)


def _blanks_of(t: Triple) -> list[str]:
    out = []
    if t.s_type == BLANK:
        out.append(t.s)
    if t.o_type == BLANK:
        out.append(t.o)
    gb = _g_blank(t.g)
    if gb is not None:
        out.append(gb)
    return out


def _apply(t: Triple, mapping: dict[str, str]) -> tuple:
    s = mapping.get(t.s, t.s) if t.s_type == BLANK else t.s
    o = mapping.get(t.o, t.o) if t.o_type == BLANK else t.o
    g = t.g
    gb = _g_blank(t.g)
    if gb is not None:
        g = "_:" + mapping.get(gb, gb)
    return (g, s, t.s_type, t.p, o, t.o_type, t.o_datatype, t.o_lang)


def _all_blanks(triples: Sequence[Triple]) -> list[str]:
    return sorted({b for t in triples for b in _blanks_of(t)})


def _refine(
    sides: list[tuple[Sequence[Triple], list[str]]], rounds: int = 8
) -> list[dict[str, int]]:
    """Color refinement with a palette shared across sides: equal
    structure → equal int color, comparable between graphs."""
    colors = [{b: 0 for b in blanks} for _, blanks in sides]
    for _ in range(rounds):
        table: dict = {}
        new: list[dict[str, int]] = []
        for (triples, blanks), color in zip(sides, colors):
            ctx: dict[str, list] = defaultdict(list)
            for t in triples:
                sk = None
                sb = t.s if t.s_type == BLANK else None
                ob = t.o if t.o_type == BLANK else None
                gb = _g_blank(t.g)
                if sb is not None or ob is not None or gb is not None:
                    sk = _skeleton(t)
                if sb is not None:
                    ctx[sb].append(
                        ("S", sk,
                         color[ob] if ob is not None else -1,
                         color[gb] if gb is not None else -1))
                if ob is not None:
                    ctx[ob].append(
                        ("O", sk,
                         color[sb] if sb is not None else -1,
                         color[gb] if gb is not None else -1))
                if gb is not None:
                    ctx[gb].append(
                        ("G", sk,
                         color[sb] if sb is not None else -1,
                         color[ob] if ob is not None else -1))
            nc = {}
            for b in blanks:
                # sort by repr: context tuples mix str/None fields
                key = (color[b],
                       tuple(sorted(Counter(ctx[b]).items(), key=repr)))
                nc[b] = table.setdefault(key, len(table))
            new.append(nc)
        if new == colors:
            break
        colors = new
    return colors


def find_bijection(
    got: Sequence[Triple], want: Sequence[Triple], max_steps: int = 100_000
) -> Optional[dict[str, str]]:
    """Find a blank-label bijection making the multisets equal, or None."""
    if len(got) != len(want):
        return None
    if Counter(map(_skeleton, got)) != Counter(map(_skeleton, want)):
        return None
    g_blanks = _all_blanks(got)
    w_blanks = _all_blanks(want)
    if len(g_blanks) != len(w_blanks):
        return None
    if not g_blanks:
        return {} if Counter(got) == Counter(want) else None

    gc, wc = _refine([(got, g_blanks), (want, w_blanks)])

    g_by = defaultdict(list)
    w_by = defaultdict(list)
    for b in g_blanks:
        g_by[gc[b]].append(b)
    for b in w_blanks:
        w_by[wc[b]].append(b)
    if set(g_by) != set(w_by):
        return None
    if any(len(g_by[c]) != len(w_by[c]) for c in g_by):
        return None

    # Linear pairing within color classes; exact when classes are
    # interchangeable (the common case).  Verify, then fall back.
    mapping = {}
    for c, gs in g_by.items():
        for gb, wb in zip(sorted(gs), sorted(w_by[c])):
            mapping[gb] = wb
    if _verify(got, want, mapping):
        return mapping

    # Bounded backtracking fallback for small automorphic graphs.
    if len(g_blanks) > 24:
        return None
    want_counter = Counter(_apply(t, {}) for t in want)
    order = sorted(g_blanks, key=lambda b: len(g_by[gc[b]]))
    m: dict[str, str] = {}
    used: set[str] = set()
    steps = 0

    def consistent() -> bool:
        c: Counter = Counter()
        for t in got:
            bs = _blanks_of(t)
            if all(b in m for b in bs):
                c[_apply(t, m)] += 1
        return all(want_counter[k] >= v for k, v in c.items())

    def backtrack(idx: int) -> bool:
        nonlocal steps
        if idx == len(order):
            return True
        b = order[idx]
        for cand in w_by[gc[b]]:
            if cand in used:
                continue
            steps += 1
            if steps > max_steps:
                return False
            m[b] = cand
            used.add(cand)
            if consistent() and backtrack(idx + 1):
                return True
            del m[b]
            used.discard(cand)
        return False

    if backtrack(0) and _verify(got, want, m):
        return dict(m)
    return None


def _verify(got: Sequence[Triple], want: Sequence[Triple],
            mapping: dict[str, str]) -> bool:
    return (Counter(_apply(t, mapping) for t in got)
            == Counter(_apply(t, {}) for t in want))


def match_counts(got: Sequence[Triple], want: Sequence[Triple],
                 max_steps: int = 100_000) -> tuple[int, int, int]:
    """(matched, n_got, n_want) under the best blank bijection found."""
    bij = find_bijection(got, want, max_steps=max_steps)
    if bij is not None:
        return len(got), len(got), len(want)
    # Partial credit: skeleton-level overlap (used for P/R scoring of
    # near-miss suites; exact tests require a full bijection).
    inter = sum((Counter(map(_skeleton, got))
                 & Counter(map(_skeleton, want))).values())
    return inter, len(got), len(want)


def isomorphic(got: Sequence[Triple], want: Sequence[Triple]) -> bool:
    m, a, b = match_counts(got, want)
    return m == a == b and a == b
