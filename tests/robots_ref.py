"""Pure-Python reference for the fixture robots gate — a THIRD,
engine-independent implementation of RFC 9309 most-specific-match
(regex-free prefix walk aside, it mirrors neither the Spark fold nor
the DuckDB window) used by tests that hand-recompute crawl verdicts
(test_fetch_list, crawl-cycle compositions). Kept in tests/ so the
engine can never quietly become its own oracle."""

from __future__ import annotations

import re


def fixture_rules(m: int) -> list[tuple[str, bool]]:
    """The rule list ``urls.synthesize_robots`` emits for host class
    ``m`` (site<m>), as (pattern, is_allow) in file order."""
    rules: list[tuple[str, bool]] = [("/private", False),
                                     ("/*.php$", False)]
    if m % 4 == 1:
        rules += [("/articles/item1", False),
                  ("/articles/item12", True)]
    if m % 4 == 2:
        rules += [("/*4?", False), ("/*2?", False),
                  ("/articles/item*14?*", True),
                  ("/a*6?", True), ("/*66?", False)]
    if m % 4 == 3:
        rules += [("/", False)]
    return rules


def rule_matches(pattern: str, target: str) -> bool:
    """RFC 9309 §2.2.3 match: ``*`` = any sequence, trailing ``$`` =
    end anchor, everything else literal, anchored at the start."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.match(rx + ("$" if anchored else ""), target) is not None


def robots_allowed_py(m: int, path_q: str) -> bool:
    """Verdict for the fixture host class ``m`` on match target
    ``path_q`` (path + query, §2.2.2): most-specific match wins
    (raw-pattern octet length), Allow wins a tie, no match → allow."""
    best: tuple[int, bool] | None = None
    for pattern, allow in fixture_rules(m):
        if not rule_matches(pattern, path_q):
            continue
        key = (len(pattern), allow)
        if best is None or key > best:
            best = key
    return True if best is None else best[1]


def fixture_allowed(page: int) -> bool:
    """Verdict for fixture page ``page`` (host = page % 16, canonical
    match target ``/articles/item<page>?a=1&b=2``)."""
    return robots_allowed_py(page % 16, f"/articles/item{page}?a=1&b=2")
