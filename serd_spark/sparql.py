"""SPARQL SELECT text front-end: parse a query STRING and translate
it onto the BGP composer (:mod:`serd_spark.operators.kg`) — so a user
of any engine built over the reference's statement stream
(include/serd/serd.h:576-584 is the tuple every such engine indexes)
can paste the query they run today instead of hand-composing
``bgp(...)`` calls.

Scoped, documented grammar (everything else raises
:class:`SparqlUnsupported` with the offending construct named — no
silent misreads):

- prologue: ``PREFIX p: <iri>`` (``BASE`` unsupported)
- ``SELECT [DISTINCT] (?v… | * | aggregate projections)``
- ``WHERE { … }`` group with: triple patterns (``;`` predicate and
  ``,`` object lists, ``a`` for rdf:type), property paths in the
  predicate position (``^``, ``/`` sequences, ``|`` alternation of
  single hops, ``!(…)`` negated sets, ``+ * ? {n} {n,m} {n,}``
  modifiers on a single hop or alternation), ``FILTER(expr)``,
  ``FILTER [NOT] EXISTS { … }``, ``OPTIONAL { … }``,
  ``BIND(expr AS ?v)``, top-level ``{ … } UNION { … }``, and a
  ``GRAPH <iri>|?g { … }`` wrapper around the whole pattern
- ``GROUP BY ?v…`` + ``HAVING(expr)`` with SELECT aggregates
  ``COUNT(*)``, ``COUNT([DISTINCT] ?v)``, ``SUM/AVG/MIN/MAX(?v)``,
  ``GROUP_CONCAT(?v [; SEPARATOR "s"])``, ``SAMPLE(?v)``
- ``ORDER BY [ASC|DESC](?v)…``, ``LIMIT n``, ``OFFSET n``

Semantics notes (documented divergences, same as the composer's):
solutions are DISTINCT bindings (set semantics engine-wide);
``SUM/AVG`` skip non-numeric lexical forms; FILTER comparisons
against a NUMERIC literal cast the other side with ``try_cast`` (so
``?qty > 30`` is numeric, not lexicographic), everything else
compares lexically.  Terms are matched on the engine's lexical
columns: IRIs without angle brackets, literals by lexical form.

Scale shape: this module is pure query-text translation — the plan
it produces IS the composer's (scan-pushed constants, greedy join
tree, semi/anti existence joins, seeded closures); nothing here
touches data.
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["sparql", "SparqlUnsupported"]


class SparqlUnsupported(ValueError):
    """A construct outside the documented grammar subset."""


_TOKEN = re.compile(r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<var>[?$][A-Za-z_][A-Za-z_0-9]*)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<pname>[A-Za-z_][A-Za-z_0-9.-]*?:[A-Za-z_0-9.-]*)
  | (?P<kw>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<punct>&&|\|\||!=|<=|>=|\{|\}|\(|\)|\.|;|,|\*|\+|\?|\||\^|/|!|=|<|>|-)
""", re.VERBOSE)


def _tokenize(q: str) -> list:
    toks, i = [], 0
    while i < len(q):
        m = _TOKEN.match(q, i)
        if not m:
            raise SparqlUnsupported(
                f"cannot tokenize query at: {q[i:i + 20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
    return toks


class _P:
    """Token-stream cursor with the small helpers a recursive-descent
    parser needs."""

    def __init__(self, toks):
        self.toks, self.i = toks, 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def kw(self, word) -> bool:
        kind, val = self.peek()
        return kind == "kw" and val.upper() == word

    def take_kw(self, word):
        if not self.kw(word):
            raise SparqlUnsupported(
                f"expected {word}, got {self.peek()[1]!r}")
        self.i += 1

    def take(self, kind=None, val=None):
        k, v = self.peek()
        if k is None or (kind and k != kind) or (val and v != val):
            raise SparqlUnsupported(
                f"expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def opt(self, kind, val=None) -> bool:
        k, v = self.peek()
        if k == kind and (val is None or v == val):
            self.i += 1
            return True
        return False


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _term(p: _P, prefixes: dict) -> str:
    """One RDF term in subject/object position → the engine's
    lexical constant, or the ``?var`` marker string."""
    kind, val = p.peek()
    if kind == "var":
        p.i += 1
        return "?" + val[1:]
    if kind == "iri":
        p.i += 1
        return val[1:-1]
    if kind == "pname":
        p.i += 1
        pfx, local = val.split(":", 1)
        if pfx not in prefixes:
            raise SparqlUnsupported(f"undeclared prefix {pfx}:")
        return prefixes[pfx] + local
    if kind == "string":
        p.i += 1
        body = val[1:-1]
        if p.opt("punct", "^") or (p.peek()[0] == "kw"
                                   and p.peek()[1] == "^^"):
            raise SparqlUnsupported("typed literals in patterns")
        return re.sub(r"\\(.)", r"\1", body)
    if kind == "number":
        p.i += 1
        return val
    raise SparqlUnsupported(f"term expected, got {val!r}")


def _path_hop(p: _P, prefixes: dict) -> str:
    """One path step: ``^?iri`` → the composer's hop-string form."""
    inv = p.opt("punct", "^")
    kind, val = p.peek()
    if kind == "kw" and val == "a":
        p.i += 1
        iri = _RDF_TYPE
    elif kind in ("iri", "pname"):
        iri = _term(p, prefixes)
    else:
        raise SparqlUnsupported(f"path step expected, got {val!r}")
    return ("^" + iri) if inv else iri


def _path_modifier(p: _P):
    """Trailing ``+ * ? {n} {n,m} {n,}`` → (min, max) or None."""
    kind, val = p.peek()
    if kind == "punct" and val in "+*?":
        p.i += 1
        return {"+": (1, None), "*": (0, None), "?": (0, 1)}[val]
    if kind == "punct" and val == "{":
        p.i += 1
        lo = int(p.take("number"))
        hi = lo
        if p.opt("punct", ","):
            hi = (int(p.take("number"))
                  if p.peek()[0] == "number" else None)
        p.take("punct", "}")
        return (lo, hi)
    return None


def _predicate(p: _P, prefixes: dict):
    """Predicate position: a variable, a plain term, or a property
    path translated to the composer's dict spec."""
    kind, val = p.peek()
    if kind == "var":
        p.i += 1
        return "?" + val[1:]
    if kind == "punct" and val == "!":
        p.i += 1
        paren = p.opt("punct", "(")
        items = [_path_hop(p, prefixes)]
        while p.opt("punct", "|"):
            items.append(_path_hop(p, prefixes))
        if paren:
            p.take("punct", ")")
        spec = "!" + "|".join(items)
        mod = _path_modifier(p)
        if mod:
            return {"path": spec, "min": mod[0], "max": mod[1]}
        return {"path": spec}

    paren = p.opt("punct", "(")
    first = _path_hop(p, prefixes)
    if p.peek() == ("punct", "|"):
        alts = [first]
        while p.opt("punct", "|"):
            alts.append(_path_hop(p, prefixes))
        if paren:
            p.take("punct", ")")
        mod = _path_modifier(p)
        if mod:
            return {"alt": alts, "min": mod[0], "max": mod[1]}
        return {"alt": alts}
    seq = [first]
    while p.peek() == ("punct", "/"):
        p.i += 1
        seq.append(_path_hop(p, prefixes))
    if paren:
        p.take("punct", ")")
    mod = _path_modifier(p)
    if mod:
        if len(seq) > 1:
            raise SparqlUnsupported(
                "quantified SEQUENCE paths ((p/q){n,m}) — compose a"
                " fixed path arm with a quantified one")
        return {"path": seq[0], "min": mod[0], "max": mod[1]}
    if len(seq) == 1 and first == seq[0] and not first.startswith("^"):
        return first  # plain predicate constant
    return {"path": seq}


_FUNC_KWS = {"BOUND", "REGEX", "STR", "CONCAT", "UPPER", "LOWER",
             "STRLEN", "ABS", "COALESCE", "IF"}
_FUNC_SQL = {"BOUND": None, "REGEX": None, "STR": "", "IF": "if",
             "CONCAT": "concat", "UPPER": "upper", "LOWER": "lower",
             "STRLEN": "length", "ABS": "abs", "COALESCE": "coalesce"}


def _expr(p: _P, prefixes: dict, stop: tuple) -> str:
    """Translate a SPARQL expression token stream into a Spark SQL
    expression string, until an unbalanced token in ``stop``.
    Comparisons against a NUMERIC literal try_cast the other side to
    double (SPARQL's numeric comparison on lexical columns);
    ``&&``/``||``/``!`` map to AND/OR/NOT, BOUND to IS NOT NULL,
    REGEX to RLIKE, STR to the identity."""
    out: list = []
    depth = 0
    while True:
        kind, val = p.peek()
        if kind is None:
            break
        if depth == 0 and (kind, val) in stop:
            break
        if kind == "punct":
            if val == "(":
                depth += 1; out.append("("); p.i += 1; continue
            if val == ")":
                if depth == 0:
                    break
                depth -= 1; out.append(")"); p.i += 1; continue
            if val == "&&":
                out.append("AND"); p.i += 1; continue
            if val == "||":
                out.append("OR"); p.i += 1; continue
            if val == "!":
                out.append("NOT"); p.i += 1; continue
            if val in ("=", "!=", "<", "<=", ">", ">=", "+", "-",
                       "*", "/", ","):
                out.append(val); p.i += 1; continue
            raise SparqlUnsupported(f"operator {val!r} in expression")
        if kind == "var":
            p.i += 1
            out.append(val[1:])
            continue
        if kind == "number":
            p.i += 1
            # numeric comparison: cast the variable side
            if (len(out) >= 2 and out[-1] in
                    ("=", "!=", "<", "<=", ">", ">=")
                    and re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*",
                                     out[-2])):
                out[-2] = f"try_cast({out[-2]} as double)"
            out.append(val)
            continue
        if kind == "string":
            p.i += 1
            out.append("'" + val[1:-1].replace("'", "''") + "'")
            continue
        if kind == "kw":
            up = val.upper()
            if up in _FUNC_KWS:
                p.i += 1
                p.take("punct", "(")
                if up == "BOUND":
                    v = p.take("var")
                    p.take("punct", ")")
                    out.append(f"({v[1:]} IS NOT NULL)")
                    continue
                if up == "REGEX":
                    arg = _expr(p, prefixes, (("punct", ","),))
                    p.take("punct", ",")
                    pat = _expr(p, prefixes, (("punct", ","),))
                    if p.peek() == ("punct", ","):
                        raise SparqlUnsupported("REGEX flags")
                    p.take("punct", ")")
                    out.append(f"({arg} RLIKE {pat})")
                    continue
                if up == "STR":
                    inner = _expr(p, prefixes, ())
                    p.take("punct", ")")
                    out.append(f"({inner})")
                    continue
                args = _expr(p, prefixes, ())
                p.take("punct", ")")
                out.append(f"{_FUNC_SQL[up]}({args})")
                continue
            if up in ("TRUE", "FALSE"):
                p.i += 1
                out.append(up)
                continue
            if up in ("AND", "OR", "NOT", "IS", "NULL", "IN",
                      "LIKE", "RLIKE"):
                p.i += 1
                out.append(up)
                continue
            raise SparqlUnsupported(f"function {val}() in expression")
        if kind in ("iri", "pname"):
            t = _term(p, prefixes)
            out.append("'" + t.replace("'", "''") + "'")
            continue
        raise SparqlUnsupported(f"expression token {val!r}")
    if not out:
        raise SparqlUnsupported("empty expression")
    return " ".join(out)


def _triples_block(p: _P, prefixes: dict) -> list:
    """One subject's ``s p o (; p o)* (, o)*`` run → pattern list."""
    pats = []
    subj = _term(p, prefixes)
    while True:
        pred = _predicate(p, prefixes)
        while True:
            obj = _term(p, prefixes)
            pats.append((subj, pred, obj))
            if not p.opt("punct", ","):
                break
        if not p.opt("punct", ";"):
            break
        if p.peek()[0] in (None,) or p.peek() == ("punct", "}") \
                or p.peek() == ("punct", "."):
            break  # trailing ';'
    return pats


def _group(p: _P, prefixes: dict) -> dict:
    """Parse ``{ … }`` → {'patterns', 'optional', 'filters',
    'exists', 'not_exists', 'bind', 'union'} (union: list of
    sub-groups when the group is a pure UNION of groups)."""
    p.take("punct", "{")
    g = {"patterns": [], "optional": [], "filters": [],
         "exists": [], "not_exists": [], "bind": {}, "union": None}
    # pure-UNION form: { {…} UNION {…} (UNION {…})* }
    if p.peek() == ("punct", "{"):
        first = _group(p, prefixes)
        if p.kw("UNION"):
            branches = [first]
            while p.kw("UNION"):
                p.i += 1
                branches.append(_group(p, prefixes))
            p.take("punct", "}")
            for b in branches:
                if (b["optional"] or b["filters"] or b["exists"]
                        or b["not_exists"] or b["bind"] or b["union"]):
                    raise SparqlUnsupported(
                        "UNION branches with clauses beyond triple"
                        " patterns")
            g["union"] = [b["patterns"] for b in branches]
            return g
        raise SparqlUnsupported(
            "nested group that is not a UNION alternative")
    while not p.opt("punct", "}"):
        if p.kw("FILTER"):
            p.i += 1
            neg = False
            if p.kw("NOT"):
                p.i += 1
                p.take_kw("EXISTS")
                neg = True
                sub = _group(p, prefixes)
            elif p.kw("EXISTS"):
                p.i += 1
                sub = _group(p, prefixes)
            else:
                p.take("punct", "(")
                g["filters"].append(
                    _expr(p, prefixes, ()))
                p.take("punct", ")")
                p.opt("punct", ".")
                continue
            if (sub["optional"] or sub["filters"] or sub["exists"]
                    or sub["not_exists"] or sub["bind"]
                    or sub["union"]):
                raise SparqlUnsupported(
                    "EXISTS group with clauses beyond triple"
                    " patterns")
            (g["not_exists"] if neg else g["exists"]).append(
                sub["patterns"])
            p.opt("punct", ".")
            continue
        if p.kw("OPTIONAL"):
            p.i += 1
            sub = _group(p, prefixes)
            if (sub["optional"] or sub["filters"] or sub["exists"]
                    or sub["not_exists"] or sub["bind"]
                    or sub["union"]):
                raise SparqlUnsupported(
                    "OPTIONAL group with clauses beyond triple"
                    " patterns")
            g["optional"].append(sub["patterns"])
            p.opt("punct", ".")
            continue
        if p.kw("BIND"):
            p.i += 1
            p.take("punct", "(")
            e = _expr(p, prefixes, (("kw", "AS"), ("kw", "as"),
                                    ("kw", "As")))
            p.take_kw("AS")
            v = p.take("var")
            p.take("punct", ")")
            g["bind"][v[1:]] = e
            p.opt("punct", ".")
            continue
        if p.kw("MINUS") or p.kw("VALUES") or p.kw("SERVICE"):
            raise SparqlUnsupported(
                f"{p.peek()[1].upper()} — use the composer API"
                f" (bgp_minus / broadcast VALUES) directly")
        g["patterns"].extend(_triples_block(p, prefixes))
        p.opt("punct", ".")
    return g


_AGG_FNS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT",
            "SAMPLE"}


def sparql(triples: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL SELECT query STRING over a triple/quad
    DataFrame.  See the module docstring for the supported grammar;
    anything outside it raises :class:`SparqlUnsupported` naming the
    construct.  The translation targets :func:`bgp`,
    :func:`bgp_union` and :func:`bgp_agg`, so the executed plan is
    exactly the composer's."""
    from serd_spark.operators.kg import bgp, bgp_agg, bgp_union

    p = _P(_tokenize(query))
    prefixes: dict = {}
    while p.kw("PREFIX"):
        p.i += 1
        pname = p.take("pname")
        if not pname.endswith(":"):
            pfx = pname.split(":", 1)[0]
        else:
            pfx = pname[:-1]
        iri = p.take("iri")[1:-1]
        prefixes[pfx] = iri
    if p.kw("BASE"):
        raise SparqlUnsupported("BASE")
    p.take_kw("SELECT")
    if p.kw("DISTINCT") or p.kw("REDUCED"):
        p.i += 1  # set semantics engine-wide either way

    select_vars: list = []
    star = False
    aggs: dict = {}
    while not p.kw("WHERE") and p.peek() != ("punct", "{"):
        kind, val = p.peek()
        if kind == "punct" and val == "*":
            p.i += 1
            star = True
            continue
        if kind == "var":
            p.i += 1
            select_vars.append(val[1:])
            continue
        if kind == "punct" and val == "(":
            p.i += 1
            fn = p.take("kw").upper()
            if fn not in _AGG_FNS:
                raise SparqlUnsupported(
                    f"non-aggregate projection ({fn} … AS ?v) — use"
                    f" BIND inside WHERE")
            p.take("punct", "(")
            distinct = False
            if p.kw("DISTINCT"):
                p.i += 1
                distinct = True
            if p.peek() == ("punct", "*"):
                p.i += 1
                spec: tuple = ("count",)
            else:
                v = p.take("var")
                if fn == "COUNT":
                    spec = (("count_distinct" if distinct
                             else "count"), "?" + v[1:])
                elif fn == "GROUP_CONCAT":
                    sep = " "
                    if p.opt("punct", ";"):
                        kw = p.take("kw")
                        if kw.upper() != "SEPARATOR":
                            raise SparqlUnsupported(
                                f"GROUP_CONCAT option {kw}")
                        p.take("punct", "=")
                        sep = p.take("string")[1:-1]
                    spec = ("group_concat", "?" + v[1:], sep)
                elif fn == "SAMPLE":
                    spec = ("sample", "?" + v[1:])
                elif fn in ("MIN", "MAX"):
                    spec = (fn.lower(), "?" + v[1:])
                else:
                    spec = (fn.lower(), "?" + v[1:])
            p.take("punct", ")")
            p.take_kw("AS")
            out = p.take("var")[1:]
            p.take("punct", ")")
            aggs[out] = spec
            continue
        raise SparqlUnsupported(f"SELECT item {val!r}")
    if p.kw("WHERE"):
        p.i += 1

    graph = None
    carry_graph = False
    p_save = p.i
    p.take("punct", "{")
    if p.kw("GRAPH"):
        p.i += 1
        kind, val = p.peek()
        if kind == "var":
            p.i += 1
            if val[1:] != "g":
                raise SparqlUnsupported(
                    "GRAPH variable must be ?g (the engine's quad"
                    " column name)")
            carry_graph = True
        else:
            graph = _term(p, prefixes)
        g = _group(p, prefixes)
        p.take("punct", "}")
    else:
        p.i = p_save
        g = _group(p, prefixes)

    order_by: list = []
    limit = offset = None
    group_by: list = []
    having = None
    while p.peek()[0] is not None:
        if p.kw("GROUP"):
            p.i += 1
            p.take_kw("BY")
            while p.peek()[0] == "var":
                group_by.append("?" + p.take("var")[1:])
            continue
        if p.kw("HAVING"):
            p.i += 1
            p.take("punct", "(")
            having = _expr(p, prefixes, ())
            p.take("punct", ")")
            continue
        if p.kw("ORDER"):
            p.i += 1
            p.take_kw("BY")
            while True:
                kind, val = p.peek()
                if kind == "kw" and val.upper() in ("ASC", "DESC"):
                    p.i += 1
                    desc = val.upper() == "DESC"
                    p.take("punct", "(")
                    v = p.take("var")[1:]
                    p.take("punct", ")")
                    order_by.append((v, desc))
                elif kind == "var":
                    p.i += 1
                    order_by.append((val[1:], False))
                else:
                    break
            continue
        if p.kw("LIMIT"):
            p.i += 1
            limit = int(p.take("number"))
            continue
        if p.kw("OFFSET"):
            p.i += 1
            offset = int(p.take("number"))
            continue
        raise SparqlUnsupported(
            f"trailing token {p.peek()[1]!r}")

    kw = dict(graph=graph, carry_graph=carry_graph)
    if aggs:
        if g["union"] is not None:
            raise SparqlUnsupported("aggregates over UNION")
        df = bgp_agg(triples, g["patterns"], group_by, aggs,
                     having=having,
                     optional=g["optional"] or None,
                     filters=g["filters"] or None,
                     exists=g["exists"] or None,
                     not_exists=g["not_exists"] or None, **kw)
        if g["bind"]:
            raise SparqlUnsupported("BIND together with aggregates")
        if select_vars:
            want = ((["g"] if carry_graph else [])
                    + [v.lstrip("?") for v in group_by])
            extra = [v for v in select_vars
                     if v not in want and v not in aggs]
            if extra:
                raise SparqlUnsupported(
                    f"SELECT of non-grouped variables {extra}")
    elif g["union"] is not None:
        if (g["patterns"] or g["optional"] or g["filters"]
                or g["exists"] or g["not_exists"] or g["bind"]):
            raise SparqlUnsupported(
                "UNION mixed with other clauses in one group")
        if group_by or having:
            raise SparqlUnsupported("GROUP BY over UNION")
        df = bgp_union(triples, g["union"],
                       select=select_vars or None, **kw)
    else:
        if group_by or having:
            raise SparqlUnsupported(
                "GROUP BY without aggregates in SELECT")
        df = bgp(triples, g["patterns"],
                 select=select_vars or None,
                 optional=g["optional"] or None,
                 filters=g["filters"] or None,
                 exists=g["exists"] or None,
                 not_exists=g["not_exists"] or None,
                 bind=g["bind"] or None, **kw)
        if star and select_vars:
            raise SparqlUnsupported("SELECT * mixed with variables")

    if order_by:
        from pyspark.sql import functions as F

        df = df.orderBy(*[(F.col(v).desc() if d else F.col(v).asc())
                          for v, d in order_by])
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df
