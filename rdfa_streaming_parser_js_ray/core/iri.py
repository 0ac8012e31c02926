"""RFC 3986 relative-IRI resolution.

Reimplements (from the published RFC 3986 §5 algorithm) the behavior the
reference gets from the ``relative-to-absolute-iri`` npm package
(used at /root/reference/lib/Util.ts:3,152,257,289).  Notable semantics
verified against the reference's test expectations:

- an absolute reference (has a scheme) is returned as-is (no dot-segment
  normalization is applied to it);
- an empty reference resolves to the base as-is;
- a ``#fragment`` reference replaces the base's fragment;
- resolving a relative reference against an empty/relative base raises
  ``ValueError`` (the reference library throws).
"""

from __future__ import annotations

import re

# scheme = ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) — RFC 3986 §3.1
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
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
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in {".", ".."}:
            path = ""
        else:
            if path.startswith("/"):
                i = path.find("/", 1)
            else:
                i = path.find("/")
            if i < 0:
                output.append(path)
                path = ""
            else:
                output.append(path[:i])
                path = path[i:]
    return "".join(output)


def _split_iri(iri: str) -> tuple[str | None, str | None, str, str | None, str | None]:
    """Split into (scheme, authority, path, query, fragment); None = absent."""
    scheme = None
    m = _SCHEME_RE.match(iri)
    if m:
        scheme = iri[: m.end() - 1]
        iri = iri[m.end():]
    fragment = None
    i = iri.find("#")
    if i >= 0:
        fragment = iri[i + 1:]
        iri = iri[:i]
    query = None
    i = iri.find("?")
    if i >= 0:
        query = iri[i + 1:]
        iri = iri[:i]
    authority = None
    if iri.startswith("//"):
        i = iri.find("/", 2)
        if i < 0:
            authority = iri[2:]
            iri = ""
        else:
            authority = iri[2:i]
            iri = iri[i:]
    return scheme, authority, iri, query, fragment


def _join(scheme: str | None, authority: str | None, path: str,
          query: str | None, fragment: str | None) -> str:
    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if authority is not None:
        out.append("//" + authority)
    out.append(path)
    if query is not None:
        out.append("?" + query)
    if fragment is not None:
        out.append("#" + fragment)
    return "".join(out)


_RESOLVE_CACHE: dict[tuple[str, str], str] = {}


def resolve_iri(reference: str, base: str) -> str:
    """Resolve ``reference`` against ``base`` per RFC 3986 §5.2.2.

    Memoized: (reference, base) pairs repeat heavily within a corpus
    (same prefixes/relative paths under the same document bases).
    """
    if not reference:
        return base
    key = (reference, base)
    cached = _RESOLVE_CACHE.get(key)
    if cached is not None:
        return cached
    if len(_RESOLVE_CACHE) > 200_000:
        _RESOLVE_CACHE.clear()
    _RESOLVE_CACHE[key] = resolved = _resolve_uncached(reference, base)
    return resolved


def _resolve_uncached(reference: str, base: str) -> str:
    if _SCHEME_RE.match(reference):
        # Absolute reference: returned untouched (matches the reference
        # library's pass-through of absolute IRIs).
        return reference
    if not base:
        # No base: hand the relative reference back; downstream IRI-validity
        # gating drops it (keeps malformed docs from failing a whole batch).
        return reference
    b_scheme, b_auth, b_path, b_query, _b_frag = _split_iri(base)
    if b_scheme is None:
        raise ValueError(f"invalid (relative) base IRI {base!r}")
    r_scheme, r_auth, r_path, r_query, r_frag = _split_iri(reference)
    if r_auth is not None:
        t = (b_scheme, r_auth, _remove_dot_segments(r_path), r_query, r_frag)
    elif not r_path:
        t = (b_scheme, b_auth, b_path, r_query if r_query is not None else b_query, r_frag)
    elif r_path.startswith("/"):
        t = (b_scheme, b_auth, _remove_dot_segments(r_path), r_query, r_frag)
    else:
        if b_auth is not None and not b_path:
            merged = "/" + r_path
        else:
            i = b_path.rfind("/")
            merged = (b_path[: i + 1] + r_path) if i >= 0 else r_path
        t = (b_scheme, b_auth, _remove_dot_segments(merged), r_query, r_frag)
    return _join(*t)
