"""Pure-Python reference for the fixture robots gate — a THIRD,
engine-independent implementation of RFC 9309 group selection +
most-specific-match (it mirrors neither the Spark fold nor the DuckDB
window/EXISTS formulation: an explicit line-walk parser building group
objects, then a plain loop over the selected rules) used by tests that
hand-recompute crawl verdicts (test_fetch_list, crawl-cycle
compositions). Kept in tests/ so the engine can never quietly become
its own oracle. The fixture TEXT is rendered from the shared
``ROBOTS_FIXTURE_BLOCKS`` structure (one fixture, three parsers)."""

from __future__ import annotations

import re

from toymapreduce_go_spark.operators.urls import (ROBOTS_5XX_MODS,
                                                  ROBOTS_AGENT,
                                                  ROBOTS_FIXTURE_BLOCKS)


def fixture_status(m: int) -> int:
    """The robots.txt fetch's HTTP status for host class ``m`` (the
    ``urls.synthesize_robots`` transport outcome)."""
    return 503 if m in ROBOTS_5XX_MODS else 200


def fixture_robots_txt(m: int) -> str:
    """The robots.txt ``urls.synthesize_robots`` emits for host class
    ``m`` (site<m>), rendered from the shared block structure."""
    dom = f"www.site{m}.example.com"
    out = []
    for cond, text in ROBOTS_FIXTURE_BLOCKS:
        if cond not in (None, "m8_5", "m4_1", "m4_2", "m4_3"):
            raise ValueError(
                f"unknown ROBOTS_FIXTURE_BLOCKS condition {cond!r}")
        if cond is None or \
                (cond == "m8_5" and m % 8 == 5) or \
                (cond.startswith("m4_")
                 and m % 4 == int(cond.split("_")[1])):
            out.append(text.replace("{domain}", dom))
    return "".join(out)


class Group:
    def __init__(self) -> None:
        self.uas: list[str] = []
        self.rules: list[tuple[str, bool]] = []
        self.delay: int | None = None

    def score(self, agent: str) -> int:
        """Best UA-token match specificity for ``agent``: '*' → 0, a
        case-insensitive prefix of the agent token → its length, no
        token matching → -1."""
        best = -1
        for ua in self.uas:
            if ua == "*":
                best = max(best, 0)
            elif agent.lower().startswith(ua.lower()):
                best = max(best, len(ua))
        return best


def parse_groups(txt: str) -> list[Group]:
    """Line-walk parser: consecutive User-agent lines open a group;
    rule/Crawl-delay lines are its body; a User-agent line AFTER body
    opens the next group; anything else is a structural no-op."""
    groups: list[Group] = []
    cur: Group | None = None
    in_body = False
    for ln in txt.split("\n"):
        ua = re.match(r"(?i)^user-agent: *(.+?) *$", ln)
        rule = re.match(r"(?i)^(allow|disallow): (.+)$", ln)
        delay = re.match(r"(?i)^crawl-delay: *([0-9]+) *$", ln)
        if ua:
            if cur is None or in_body:
                cur = Group()
                groups.append(cur)
                in_body = False
            cur.uas.append(ua.group(1))
        elif rule and cur is not None:
            cur.rules.append((rule.group(2),
                              rule.group(1).lower() == "allow"))
            in_body = True
        elif delay and cur is not None:
            cur.delay = int(delay.group(1))
            in_body = True
    return groups


def select_groups(txt: str, agent: str = ROBOTS_AGENT) -> list[Group]:
    """RFC 9309 §2.2.1: the group(s) with the best match specificity
    for ``agent`` (ties combine); empty when nothing matches."""
    groups = parse_groups(txt)
    best = max((g.score(agent) for g in groups), default=-1)
    if best < 0:
        return []
    return [g for g in groups if g.score(agent) == best]


def rule_matches(pattern: str, target: str) -> bool:
    """RFC 9309 §2.2.3 match: ``*`` = any sequence, trailing ``$`` =
    end anchor, everything else literal, anchored at the start."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.match(rx + ("$" if anchored else ""), target) is not None


def allowed_py(txt: str, path_q: str,
               agent: str = ROBOTS_AGENT) -> bool:
    """Verdict for ``path_q`` (path + query, §2.2.2) under ``txt``:
    select the agent's group(s), then most-specific match wins
    (raw-pattern octet length), Allow wins a tie, no match → allow."""
    best: tuple[int, bool] | None = None
    for g in select_groups(txt, agent):
        for pattern, allow in g.rules:
            if not rule_matches(pattern, path_q):
                continue
            key = (len(pattern), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def crawl_delay_py(txt: str, agent: str = ROBOTS_AGENT) -> int | None:
    """The selected group(s)' Crawl-delay (max across a tie), or None."""
    ds = [g.delay for g in select_groups(txt, agent)
          if g.delay is not None]
    return max(ds) if ds else None


def robots_allowed_py(m: int, path_q: str) -> bool:
    """Verdict for the fixture host class ``m`` on match target
    ``path_q`` — transport outcome first (RFC 9309 §2.3.1.3: a 5xx
    robots fetch is full disallow, the rules never apply)."""
    if fixture_status(m) >= 500:
        return False
    return allowed_py(fixture_robots_txt(m), path_q)


def fixture_allowed(page: int) -> bool:
    """Verdict for fixture page ``page`` (host = page % 16, canonical
    match target ``/articles/item<page>?a=1&b=2``)."""
    return robots_allowed_py(page % 16, f"/articles/item{page}?a=1&b=2")


def fixture_delay(m: int) -> int | None:
    """The fixture host class's robots-declared Crawl-delay (None →
    the scheduler's rate ladder applies; a 5xx robots fetch declared
    nothing readable)."""
    if fixture_status(m) >= 500:
        return None
    return crawl_delay_py(fixture_robots_txt(m))
