"""Plain-Python golden simulator of the determinized crawl model.

Re-executes the reference spider's frontier rules
(scrapy_career_spider.py:141-495) sequentially on the fixture pages —
SURVEY.md §5.3's equivalence oracle. The model determinizes the
reference's ``list(set(links))`` to first-occurrence order (documented in
operators/frontier.py); every other rule (F1 validity, O1 buckets, O2
budgets {5,3,2,2}, F2 same-domain, stop conditions :459-469, Scrapy
first-yield-wins scheduler dedup) is implemented verbatim via the same
pure-Python rule functions (functions/urlrules.py) the Spark expressions
are tested against.

The Spark crawl loop (plans/crawl_loop.py) must reproduce this
bit-for-bit: same visited set & order, same career pages, same final
URL-seen set, same discovered_seq numbering.
"""

from __future__ import annotations

import dataclasses

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions import textnorm, urlrules
from crawler_ai_spark.functions.pagerep import py_meta_robots, py_nofollow_hrefs


@dataclasses.dataclass
class Entry:
    url: str
    priority: int
    depth: int
    seq: int
    parent: str | None
    seed: str


def simulate_crawl(
    pages: dict[str, str],
    seed_urls: list[str],
    max_pages: int = K.DEFAULT_MAX_PAGES,
    max_career: int = K.DEFAULT_MAX_CAREER_PAGES,
    max_batches: int = 8,
    obey_page_rep: bool = False,
) -> dict:
    seen: dict[str, set[str]] = {s: {s} for s in seed_urls}
    counters = {s: {"crawled": 0, "career": 0, "seq": 0} for s in seed_urls}
    frontier = [Entry(s, 100, 0, 0, None, s) for s in seed_urls]
    visited_rows: list[dict] = []
    career_rows: list[dict] = []
    job_url_rows: set[tuple[str, str, str]] = set()
    frontier_rows: list[dict] = [
        dict(batch=0, seed=e.seed, url=e.url, priority=e.priority, depth=e.depth, seq=e.seq)
        for e in frontier
    ]

    for batch in range(1, max_batches + 1):
        if not frontier:
            break
        next_front: list[Entry] = []
        # per-seed processing order: (priority desc, seq asc)
        for e in sorted(frontier, key=lambda e: (e.seed, -e.priority, e.seq)):
            seed_host = urlrules.host_of(e.seed)
            html = pages.get(e.url)
            fetched = html is not None
            st = counters[e.seed]
            is_career = False
            score = 0.0
            parse = None
            rep_noindex = rep_nofollow = False
            rep_nf_hrefs: set[str] = set()
            if fetched:
                st["crawled"] += 1
                parse = textnorm.scan_html(html)
                content_lower = html.lower()
                title_lower = parse.title.lower()
                if obey_page_rep:
                    rep_noindex, rep_nofollow = py_meta_robots(html)
                    rep_nf_hrefs = py_nofollow_hrefs(html)
                score = urlrules.career_score(e.url, content_lower, title_lower)
                is_career = (
                    urlrules.is_career_listing_page(e.url, content_lower, title_lower)
                    and not rep_noindex
                    and score >= K.CAREER_SCORE_THRESHOLD
                )
                if is_career:
                    st["career"] += 1
                    career_rows.append(
                        dict(
                            batch=batch, seed=e.seed, url=e.url, title=parse.title,
                            confidence=round(score, 9), priority_found=e.priority,
                            depth=e.depth, seq=e.seq,
                        )
                    )
                    # job URLs (spider :743-826): ALL links of a career
                    # page, urljoined, F3-classified, distinct — no
                    # validity/budget/same-domain gates
                    for h, _, _ in parse.out_links:
                        if not h:
                            continue
                        ju = urlrules.canonicalize(e.url, h)
                        if urlrules.is_job_url(ju):
                            job_url_rows.add((e.seed, e.url, ju))
            visited_rows.append(
                dict(
                    batch=batch, seed=e.seed, url=e.url, priority=e.priority,
                    depth=e.depth, seq=e.seq, fetched=fetched,
                    is_career=is_career, score=round(score, 9),
                )
            )
            yields = (
                fetched
                and not rep_nofollow
                and (
                    e.depth == 0
                    or (st["crawled"] < max_pages and st["career"] < max_career)
                )
            )
            if not yields:
                continue
            hrefs = [h for h, _, _ in parse.out_links if h and h not in rep_nf_hrefs]
            valid = [h for h in hrefs if urlrules.is_valid_link(h, seed_host)]
            unique = list(dict.fromkeys(valid))  # determinized list(set(...))
            buckets: dict[int, list[str]] = {100: [], 80: [], 50: [], 10: []}
            for link in unique:
                buckets[urlrules.link_priority(link)].append(link)
            for priority in K.PRIORITY_LEVELS:
                budget = K.PRIORITY_BUDGETS[priority]
                for link in buckets[priority][:budget]:
                    child = urlrules.canonicalize(e.url, link)
                    if urlrules.host_of(child) != seed_host:
                        continue
                    st["seq"] += 1
                    child_seq = st["seq"]
                    if child in seen[e.seed]:
                        continue  # scheduler dedup: first yield wins
                    seen[e.seed].add(child)
                    ne = Entry(child, priority, e.depth + 1, child_seq, e.url, e.seed)
                    next_front.append(ne)
                    frontier_rows.append(
                        dict(
                            batch=batch, seed=e.seed, url=child,
                            priority=priority, depth=e.depth + 1, seq=child_seq,
                        )
                    )
        frontier = next_front

    return {
        "visited": visited_rows,
        "career_pages": career_rows,
        "frontier": frontier_rows,
        "seen": {s: sorted(v) for s, v in seen.items()},
        "job_urls": sorted(job_url_rows),
    }
