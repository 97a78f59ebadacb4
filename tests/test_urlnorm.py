"""R1 canonicalization: table cases, idempotence, scalar==vectorized."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from paperchase_crawler_spark.functions.urlnorm import canon_series, canon_url

CASES = {
    "HTTP://Host0.EXAMPLE:80/a/../b/./c/": "http://host0.example/b/c",
    "https://h.example:443/%7Euser/%41%2F?q=%41&b=2#frag": "https://h.example/~user/A%2F?q=%41&b=2",
    "https://h.example": "https://h.example/",
    "https://h.example/": "https://h.example/",
    "https://h.example/a/": "https://h.example/a",
    "https://h.example/a/?": "https://h.example/a/?",
    "https://h.example/a?x=2&a=1": "https://h.example/a?x=2&a=1",  # query preserved
    "https://h.example:8080/a": "https://h.example:8080/a",  # non-default port kept
    "http://h.example:443/a": "http://h.example:443/a",  # 443 not default for http
    "https://host3.example/page/77": "https://host3.example/page/77",
}


def test_table_cases():
    for url, want in CASES.items():
        assert canon_url(url) == want, url


def test_idempotent_on_cases():
    for url in CASES:
        c = canon_url(url)
        assert canon_url(c) == c


def test_trailing_whitespace_vectorized_equals_scalar():
    """Regression: the fast-path regex must not accept 'url\\n' ($ matches
    before a trailing newline; \\Z does not) — scalar strips, so the
    vectorized form must too, or one canonical URL splits into two."""
    urls = [
        "https://h.example/page/1\n",
        "https://h.example/page/1",
        " https://h.example/page/2 ",
    ]
    got = list(canon_series(pd.Series(urls, dtype=object)))
    assert got == [canon_url(u) for u in urls]
    assert got[0] == got[1] == "https://h.example/page/1"


_url_st = st.builds(
    lambda scheme, host, port, segs, q, frag: scheme
    + "://"
    + host
    + port
    + "/"
    + "/".join(segs)
    + q
    + frag,
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=st.from_regex(r"[a-zA-Z0-9.\-]{1,20}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    segs=st.lists(
        st.sampled_from(["a", "b", "page", "9", ".", "..", "%41", "x%2Fy", ""]),
        max_size=5,
    ),
    q=st.sampled_from(["", "?a=1&b=2", "?%41"]),
    frag=st.sampled_from(["", "#f", "#a/b"]),
)


@given(st.lists(_url_st, min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_vectorized_equals_scalar(urls):
    got = canon_series(pd.Series(urls, dtype=object))
    want = [canon_url(u) for u in urls]
    assert list(got) == want


@given(_url_st)
@settings(max_examples=200, deadline=None)
def test_idempotence_property(url):
    c = canon_url(url)
    assert canon_url(c) == c
