"""Per-document lexical environment: prefix map + base-URI chain.

Parity target: /root/reference/src/env.c — prefix upsert (last write
wins, env.c:114-165), CURIE expansion (env.c:212-274), chained base
resolution (env.c:68-95), qualification (env.c:182-210).

The Env is folded *in document order* inside the per-conversation
parse (a later ``@prefix`` overrides an earlier one mid-document), so
it is plain per-document Python state — never a global join.  The
cross-corpus canonicalization variant of expansion lives in
``operators/expand.py`` as a broadcast join.
"""

from __future__ import annotations

from typing import Optional

from .uri import uri_is_absolute, uri_resolve


class CurieError(KeyError):
    """Undefined prefix (SERD_ERR_BAD_CURIE analogue)."""


class Env:
    __slots__ = ("prefixes", "base_uri")

    def __init__(self, base_uri: str = ""):
        self.prefixes: dict[str, str] = {}
        self.base_uri = base_uri

    def set_base_uri(self, uri: str) -> None:
        """Set base; a relative new base resolves against the old one
        (chained bases, cf. env.c:68-95)."""
        if self.base_uri and not uri_is_absolute(uri):
            uri = uri_resolve(uri, self.base_uri)
        self.base_uri = uri

    def set_prefix(self, name: str, uri: str) -> None:
        """Upsert a prefix binding; relative URIs resolve against the
        current base first (env.c:150-162)."""
        if self.base_uri and not uri_is_absolute(uri):
            uri = uri_resolve(uri, self.base_uri)
        self.prefixes[name] = uri

    def expand_curie(self, curie: str) -> str:
        """prefix:local → namespace + local (env.c:212-242)."""
        i = curie.find(":")
        if i < 0:
            raise CurieError(curie)
        name, local = curie[:i], curie[i + 1 :]
        try:
            ns = self.prefixes[name]
        except KeyError:
            raise CurieError(name) from None
        return ns + local

    def expand(self, name: str, local: str) -> str:
        try:
            ns = self.prefixes[name]
        except KeyError:
            raise CurieError(name) from None
        return ns + local

    def resolve(self, iri: str) -> str:
        """Resolve a (possibly relative) IRI against the base."""
        if uri_is_absolute(iri):
            return iri
        return uri_resolve(iri, self.base_uri)

    def qualify(self, uri: str) -> Optional[str]:
        """Reverse expansion: first matching namespace that is a prefix
        of ``uri`` → CURIE, else None (env.c:182-210; *first* match in
        insertion order, not longest)."""
        for name, ns in self.prefixes.items():
            if ns and uri.startswith(ns):
                local = uri[len(ns):]
                return f"{name}:{local}"
        return None

    def copy(self) -> "Env":
        e = Env(self.base_uri)
        e.prefixes = dict(self.prefixes)
        return e
