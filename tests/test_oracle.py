"""Oracle crawler invariants (R1-R7 self-consistency)."""

from __future__ import annotations

from collections import Counter

from paperchase_crawler_spark import simweb
from oracle.crawler import crawl


def test_determinism_and_dedup():
    a = crawl(simweb.seed_urls(10), rounds=3, round_budget=100)
    b = crawl(simweb.seed_urls(10), rounds=3, round_budget=100)
    assert a.ordering == b.ordering and a.seen == b.seen
    dup = crawl(simweb.seed_urls(10) + simweb.seed_urls(10), rounds=3, round_budget=100)
    assert dup.ordering == a.ordering and dup.seen == a.seen


def test_ordering_is_r3_within_rounds():
    res = crawl(simweb.seed_urls(10), rounds=4, round_budget=50)
    by_url = {e.canon_url: e for e in res.frontier.values()}
    last = None
    for seq, rnd, url in res.ordering:
        e = by_url[url]
        key = (rnd, e.depth, e.disc_seq)
        if last is not None:
            assert key > last, "ordering must be (round, depth, disc_seq) increasing"
        last = key


def test_politeness_tokens_respected():
    res = crawl(simweb.seed_urls(10), rounds=4, round_budget=10**6)
    per_round_host = Counter()
    by_url = {e.canon_url: e for e in res.frontier.values()}
    for _, rnd, url in res.ordering:
        e = by_url[url]
        per_round_host[(rnd, e.host)] += 1
    for (rnd, host), n in per_round_host.items():
        _, tokens = simweb.politeness(simweb.host_id_of(host))
        assert n <= tokens


def test_budget_respected_and_blocked_never_fetched():
    res = crawl(simweb.seed_urls(20), rounds=5, round_budget=30)
    rounds = Counter(rnd for _, rnd, _ in res.ordering)
    assert all(n <= 30 for n in rounds.values())
    fetched = {u for _, _, u in res.ordering}
    for e in res.frontier.values():
        if e.state == "blocked":
            assert e.canon_url not in fetched
            assert e.url_hash in res.seen  # R6: blocked stays in seen


def test_crawl_delay_respected():
    res = crawl(simweb.seed_urls(10), rounds=6, round_budget=10**6)
    by_url = {e.canon_url: e for e in res.frontier.values()}
    host_rounds: dict[str, list[int]] = {}
    for _, rnd, url in res.ordering:
        host_rounds.setdefault(by_url[url].host, []).append(rnd)
    for host, rnds in host_rounds.items():
        delay, _ = simweb.politeness(simweb.host_id_of(host))
        uniq = sorted(set(rnds))
        for a, b in zip(uniq, uniq[1:]):
            assert b - a >= delay
