"""URL canonicalization — rule R1 (SURVEY.md §2.1), RFC 3986 §6 subset.

One algorithm, two implementations that are property-tested equal
(tests/test_urlnorm.py):

- ``canon_url(str) -> str``     — obviously-correct scalar form, used by the
  single-threaded oracle (oracle/crawler.py).
- ``canon_series(pd.Series)``   — pandas-vectorized form used inside the
  engine's pandas UDF (no per-row Python on the common path; the rare
  dot-segment / percent-escape rows fall back to the scalar form on a mask).

R1: lowercase scheme+host; strip fragment; remove default port (:80 http,
:443 https); resolve dot segments; percent-decode unreserved chars; empty
path → '/'; preserve query byte-for-byte (no param reordering); strip
trailing '/' only on non-root paths with no query.
"""

from __future__ import annotations

import re

import pandas as pd

_URL_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")


def _pct_decode_unreserved(s: str) -> str:
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1)

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    # RFC 3986 §5.2.4
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = path[2:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = path[3:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1) if path.startswith("/") else path.find("/")
            if i == -1:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _canon_parts(scheme: str, authority: str, path: str, query: str | None) -> str:
    scheme = scheme.lower()
    authority = authority.lower()
    if scheme == "http" and authority.endswith(":80"):
        authority = authority[:-3]
    elif scheme == "https" and authority.endswith(":443"):
        authority = authority[:-4]
    path = _pct_decode_unreserved(path)
    if "." in path:
        path = _remove_dot_segments(path)
    if not path:
        path = "/"
    if query is None and len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    out = f"{scheme}://{authority}{path}" if scheme or authority else path
    if query is not None:
        out += "?" + query
    return out


def canon_url(url: str) -> str:
    """Scalar R1 canonicalization (oracle path)."""
    m = _URL_RE.match(url.strip())
    if m is None:  # unmatchable is impossible: the regex accepts any string
        return url.strip()
    scheme, authority, path, query = m.groups()
    return _canon_parts(scheme or "", authority or "", path or "", query)


# --- vectorized form -------------------------------------------------------

_SIMPLE_RE = re.compile(
    # fast path: lowercase scheme://lowercase-host/plain-path, no port, no
    # query/fragment/dot-segments/escapes/trailing slash — already canonical
    # \Z (not $): $ also matches before a trailing newline, which would let
    # a whitespace-bearing URL skip the scalar path's strip()
    r"^(?:http|https)://[a-z0-9.\-]+/[A-Za-z0-9_\-./]*[A-Za-z0-9_\-]\Z"
)


def canon_series(urls: pd.Series) -> pd.Series:
    """Vectorized R1: identical output to ``urls.map(canon_url)``.

    The simweb/crawl URL universe is overwhelmingly already-canonical, so the
    common path is a single vectorized regex match; only non-matching rows
    pay the scalar cost. Property-tested equal to the scalar form.
    """
    s = urls.astype("string").fillna("")
    # "/." catches every dot-segment shape (/./, /../, trailing /., /..)
    mask = s.str.match(_SIMPLE_RE, na=False) & ~s.str.contains("/.", regex=False)
    out = s.copy()
    todo = ~mask
    if todo.any():
        out[todo] = s[todo].map(canon_url)
    return out.astype(object)


def host_of(canon: str) -> str:
    """Authority (host[:port]) of a canonical URL — oracle path."""
    m = _URL_RE.match(canon)
    return (m.group(2) or "").lower() if m else ""


def path_of(canon: str) -> str:
    """Path component of a canonical URL (for robots matching) — oracle path."""
    m = _URL_RE.match(canon)
    if not m:
        return "/"
    return m.group(3) or "/"
