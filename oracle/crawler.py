"""Single-threaded reference crawler — the executable R1-R7 contract.

The reference snapshot (/root/reference, scrappergus/paperchase-crawler) is
EMPTY in this sandbox (SURVEY.md §0), so this obviously-correct, pure-Python
crawler is the comparator standing in for "the reference's crawl ordering and
URL-seen set under the same seed list + politeness budget" (BASELINE.json
north_rule). It is written so that a real crawler run could later be slotted
in: the interface is (seeds, rounds, budget) → ordering / seen / corpus.

Semantics (SURVEY.md §2.1), decisions pinned here and mirrored by the engine:

- R1  canonicalize on discovery (functions/urlnorm.canon_url).
- R2  seen-at-enqueue: a canon URL enters ``seen`` when first discovered
      (seed load or outlink extraction); later duplicates dropped.
- R3  frontier total order = (depth ASC, disc_seq ASC).
- R4  disc_seq: seeds 0..n-1 in file order; outlinks numbered in
      (parent fetch order, position-in-page) order.
- R5  per round r: host eligible iff r - last_round >= crawl_delay_rounds;
      per eligible host take top tokens_per_round queued URLs by R3; then cap
      globally at ROUND_BUDGET by R3. last_round updates only for hosts with
      >=1 URL actually fetched this round.
- R6  robots gating applies AT ENQUEUE (seeds and outlinks): a disallowed URL
      is recorded in ``seen`` and in the frontier with state='blocked' but is
      never queued/fetched.
- R7  fetch = simweb(url_hash); corpus image_id := canon_url.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from paperchase_crawler_spark import simweb
from paperchase_crawler_spark.functions.hashing import xxh64_str
from paperchase_crawler_spark.functions.urlnorm import canon_url, host_of, path_of


def robots_blocked(path: str, rules: list[dict]) -> bool:
    """RFC 9309 longest-prefix match over allow/disallow prefix rules."""
    best_len = -1
    best_allow = True
    for r in rules:
        p = r["prefix"]
        if path.startswith(p) and len(p) > best_len:
            best_len = len(p)
            best_allow = r["allow"]
    return not best_allow


@dataclass
class FrontierEntry:
    canon_url: str
    url_hash: int
    host: str
    depth: int
    disc_seq: int
    state: str  # queued|fetched|blocked
    round_disc: int
    round_done: int | None = None


@dataclass
class OracleResult:
    ordering: list[tuple[int, int, str]] = field(default_factory=list)  # (seq, round, url)
    seen: set[int] = field(default_factory=set)
    corpus: list[dict] = field(default_factory=list)
    frontier: dict[int, FrontierEntry] = field(default_factory=dict)
    round_stats: list[dict] = field(default_factory=list)


class OracleCrawler:
    def __init__(self, seeds: list[str], round_budget: int):
        self.round_budget = round_budget
        self.res = OracleResult()
        self._next_seq = 0  # disc_seq counter
        self._host_last: dict[str, int] = {}
        self._host_cache: dict[str, tuple[int, int, list[dict]]] = {}
        for url in seeds:
            self._discover(url, depth=0, round_disc=0)

    def _host_info(self, host: str) -> tuple[int, int, list[dict]]:
        if host not in self._host_cache:
            hid = simweb.host_id_of(host)
            delay, tokens = simweb.politeness(hid)
            self._host_cache[host] = (delay, tokens, simweb.robots_rules(hid))
        return self._host_cache[host]

    def _discover(self, url: str, depth: int, round_disc: int) -> None:
        cu = canon_url(url)
        h = xxh64_str(cu)
        if h in self.res.seen:
            return  # R2: duplicate discovery dropped
        self.res.seen.add(h)
        host = host_of(cu)
        _, _, rules = self._host_info(host)
        blocked = robots_blocked(path_of(cu), rules)
        self.res.frontier[h] = FrontierEntry(
            canon_url=cu,
            url_hash=h,
            host=host,
            depth=depth,
            disc_seq=self._next_seq,
            state="blocked" if blocked else "queued",
            round_disc=round_disc,
            round_done=round_disc if blocked else None,
        )
        self._next_seq += 1

    def run_round(self, r: int) -> int:
        """Execute round r (1-based); returns number fetched."""
        queued = [e for e in self.res.frontier.values() if e.state == "queued"]
        # R5: per-host eligibility + token cap
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in queued:
            by_host.setdefault(e.host, []).append(e)
        candidates: list[FrontierEntry] = []
        for host, entries in by_host.items():
            delay, tokens, _ = self._host_info(host)
            if r - self._host_last.get(host, -(10**6)) < delay:
                continue
            entries.sort(key=lambda e: (e.depth, e.disc_seq))
            candidates.extend(entries[:tokens])
        # global budget cut by R3 order
        candidates.sort(key=lambda e: (e.depth, e.disc_seq))
        selected = candidates[: self.round_budget]
        n_images = 0
        for e in selected:
            seq = len(self.res.ordering)
            self.res.ordering.append((seq, r, e.canon_url))
            e.state = "fetched"
            e.round_done = r
            self._host_last[e.host] = r
            page = simweb.fetch(e.url_hash)
            if page["image"] is not None:
                im = page["image"]
                self.res.corpus.append(
                    {
                        "image_id": e.canon_url,
                        "bytes": im["bytes"],
                        "w": im["w"],
                        "h": im["h"],
                        "fmt": im["fmt"],
                        "caption": im["caption"],
                        "phash": im["phash"],
                    }
                )
                n_images += 1
            for link in page["outlinks"]:
                self._discover(link, depth=e.depth + 1, round_disc=r)
        self.res.round_stats.append(
            {"round": r, "n_selected": len(selected), "n_images": n_images}
        )
        return len(selected)


def crawl(seeds: list[str], rounds: int, round_budget: int) -> OracleResult:
    c = OracleCrawler(seeds, round_budget)
    for r in range(1, rounds + 1):
        c.run_round(r)
    return c.res
