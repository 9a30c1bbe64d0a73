"""URL canonicalization + domain-level hygiene — where crawl dedup
actually STARTS: before any content hash runs, the frontier/dedup
layer must recognize that ``HTTP://WWW.Site.COM:80/a?b=2&a=1#x``,
``http://www.site.com/a?a=1&b=2&utm_source=feed`` and
``http://www.site.com/a?a=1&fbclid=...&b=2`` are the same page.

Reference scope: the reference ingests local text files
(``play.sh:62-99``) and has no URL layer; this is the crawl-ingest
extension row next to ``html_extract``, built on public normalization
rules (RFC 3986 §6 syntax-based normalization + the universal
tracking-parameter strip): lowercase scheme and host, drop the
fragment, drop default ports (80/http, 443/https), empty path → '/',
remove tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
``msclkid``, ``mc_eid``), sort the surviving query parameters
byte-lexicographically.

Because the fixture tables carry no URL column, the operator follows
the ``multimodal/binary.py`` convention: a deterministic MESSY url is
synthesized per document — four raw variants (default port + reversed
params / uppercase scheme+host + fragment / utm-laden / fbclid-laden)
that all canonicalize to the same page URL, with consecutive doc_id
quads sharing a page — so canonicalization provably COLLAPSES
variants, and the DuckDB oracle replays synthesis + canonicalization
exactly.

100 TB shape: everything here is a scan-side expression chain
(regexp_extract / split / filter / array_sort / concat) in whole-stage
codegen — zero Python, zero joins; the only shuffle is the final
domain rollup (count-combinable, keyed by registrable domain — a
bounded key space in practice). URL-level exact dedup is the same
min-agg winner rule as ``exact_dedup``: no window, a viral URL is one
combinable group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.checksum import CKSUM_MOD

# tracking parameters stripped during canonicalization (shared with
# the DuckDB oracle through TRACKING_RE — one literal, two engines)
TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid)="

# the canonical-URL match-target extractor the robots machinery
# matches rules against — RFC 9309 §2.2.2 matches the PATH PLUS QUERY
# (a `Disallow: /*?sessionid=` rule must see the query) — ONE literal
# shared by robots_stats, robots_filter_docs, the link frontier, and
# the sitemap channel (r11 review: four hand-kept copies
# desynchronize verdicts)
ROBOTS_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?]*(/.*)$"

# regex metacharacters escaped when a robots rule compiles to a match
# regex (`*` deliberately absent — it becomes `.*`; a trailing `$` is
# stripped first and re-emitted as the end anchor). ONE literal shared
# with the DuckDB twin so both engines compile identical regexes.
ROBOTS_RX_META = r"([\\\[\]().^$|?+{}])"


def _sql_str(s: str) -> str:
    """A Python string as a Spark SQL single-quoted literal (backslash
    is an escape character in Spark SQL string literals, so regex
    backslashes double)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def synth_url_sql() -> str:
    """``synth_url_expr`` as SQL text — the single rendering both the
    Column form and text-composing callers (frontier, redirects,
    snapshot) parse, so a multi-use plan builds the synthesis in ONE
    ``F.expr`` parse instead of ~30 py4j round trips per use (r15,
    the r14 single-parse construction class)."""
    page = "cast(doc_id as bigint)"
    item = "cast(doc_id div 4 as bigint)"
    base = f"concat('www.site', cast(pmod({item}, 16) as string), " \
           f"'.example.com')"
    path = f"concat('/articles/item', cast({item} as string))"
    return (
        f"CASE pmod({page}, 4) "
        f"WHEN 0 THEN concat('http://', {base}, ':80', {path}, "
        f"'?b=2&a=1') "
        f"WHEN 1 THEN concat('HTTP://', upper({base}), {path}, "
        f"'?a=1&b=2#section-2') "
        f"WHEN 2 THEN concat('http://', {base}, {path}, "
        f"'?utm_source=feed&a=1&b=2&utm_campaign=spring') "
        f"ELSE concat('http://', {base}, {path}, '?a=1&fbclid=x', "
        f"cast({page} as string), '&b=2') END")


def synth_url_expr() -> "F.Column":
    """The messy-URL synthesis as a bare column expression over
    ``doc_id`` — reused by ``synthesize_urls`` and the snapshot
    builder so no join is ever needed to pair a document's URL with
    its other columns. doc_id quads (div 4) share a page — same host,
    same path — and doc_id % 4 picks the raw variant, so every page
    arrives as four DIFFERENT raw strings that canonicalize
    identically; (div 4) % 16 spreads pages over 16 hosts for the
    domain rollup."""
    return F.expr(synth_url_sql())


def synthesize_urls(documents: DataFrame) -> DataFrame:
    """(doc_id, url): a deterministic messy URL per document — the
    frame form of ``synth_url_expr`` (see there for the quad/variant
    contract)."""
    return documents.select("doc_id", synth_url_expr().alias("url"))


def canonicalize_url_sql(e: str) -> str:
    """``canonicalize_url`` as SQL text over the input expression
    ``e`` (itself SQL text). The inlined subexpressions mirror the
    former Column chain node for node — Catalyst receives the
    identical tree, whole-stage codegen de-duplicates the repeated
    subtrees exactly as before — but the driver pays ONE parse
    instead of ~40 py4j round trips per call site (r15)."""
    nofrag = f"regexp_replace({e}, '#.*$', '')"
    scheme = (f"lower(regexp_extract({nofrag}, "
              f"'^([A-Za-z][A-Za-z0-9+.-]*)://', 1))")
    rest = (f"regexp_replace({nofrag}, "
            f"'^[A-Za-z][A-Za-z0-9+.-]*://', '')")
    # RFC 3986 authority = [userinfo@]host[:port]: userinfo (split at
    # the LAST '@', greedy) is case-SENSITIVE and re-emitted verbatim;
    # only the host lowercases. Bracketed IPv6 hosts ([::1]:8080) keep
    # their brackets and still split the port correctly.
    host_rx = _sql_str(r"^(\[[^\]]*\]|[^:]*)")
    query_rx = _sql_str(r"\?(.*)$")
    authority = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    userinfo = f"regexp_extract({authority}, '^(.*)@', 1)"
    hostport = f"lower(regexp_extract({authority}, '([^@]*)$', 1))"
    host = f"regexp_extract({hostport}, {host_rx}, 1)"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    pathq = f"regexp_replace({rest}, '^[^/?]*', '')"
    path0 = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    query = f"regexp_extract({pathq}, {query_rx}, 1)"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    keep_port = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = "
        f"'80') OR ({scheme} = 'https' AND {port} = '443') THEN '' "
        f"ELSE concat(':', {port}) END")
    ui = (f"CASE WHEN {userinfo} = '' THEN '' "
          f"ELSE concat({userinfo}, '@') END")
    params = (f"array_sort(filter(split({query}, '&'), "
              f"p -> p != '' AND NOT (p rlike {_sql_str(TRACKING_RE)})))")
    qcanon = (f"CASE WHEN size({params}) > 0 "
              f"THEN concat('?', array_join({params}, '&')) "
              f"ELSE '' END")
    return (f"CASE WHEN {scheme} = '' THEN {nofrag} "
            f"ELSE concat({scheme}, '://', {ui}, {host}, {keep_port}, "
            f"{path}, {qcanon}) END")


def canonicalize_url(col: str) -> "F.Column":
    """RFC 3986 syntax normalization + tracking-param strip + sorted
    query, as one scan-side expression chain, parsed from SQL text in
    one round trip (``col`` is SQL text — a column name or composed
    expression). Unparseable inputs (no scheme) pass through
    fragment-stripped but otherwise untouched — fail-open, never
    fail-silent-to-empty."""
    return F.expr(canonicalize_url_sql(col))


def url_domain_sql(e: str) -> str:
    """``url_domain`` as SQL text over the input expression ``e``."""
    rx = r"^[a-z][a-z0-9+.-]*://(?:[^/?]*@)?(\[[^\]]*\]|[^/:?]*)"
    return f"regexp_extract(lower({e}), {_sql_str(rx)}, 1)"


def url_domain(col: str) -> "F.Column":
    """The lowercased host of a canonical URL (userinfo and port
    excluded; bracketed IPv6 kept whole). ``col`` is SQL text."""
    return F.expr(url_domain_sql(col))


def url_stats(documents: DataFrame) -> DataFrame:
    """Per-domain hygiene rollup over synthesized messy URLs:
    (domain, n_urls, n_raw_distinct, n_canonical, n_dup_urls,
    canon_checksum). ``n_dup_urls = n_urls − n_canonical`` is exactly
    how many fetches canonicalization deduplicates away;
    ``canon_checksum`` folds the portable hash of every DISTINCT
    canonical URL so the value-hash pins each normalization rule
    (a missed tracking param or unsorted query changes it)."""
    u = synthesize_urls(documents).select(
        "doc_id", "url", canonicalize_url("url").alias("canon"))
    u = u.select(
        "doc_id", "url", "canon", url_domain("canon").alias("domain"))
    per_canon = (u.groupBy("domain", "canon")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.count_distinct("url").alias("nraw")))
    h = F.pmod(F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
               .cast("long"), F.lit(CKSUM_MOD))
    return (per_canon.groupBy("domain")
            .agg(F.sum("n").alias("n_urls"),
                 F.sum("nraw").alias("n_raw_distinct"),
                 F.count(F.lit(1)).alias("n_canonical"),
                 (F.sum("n") - F.count(F.lit(1))).alias("n_dup_urls"),
                 F.sum(h).alias("canon_checksum"))
            .orderBy("domain"))


def url_dedup_docs(urls: DataFrame) -> DataFrame:
    """URL-level exact dedup: one surviving doc per canonical URL —
    the crawl-frontier "have we fetched this page" gate. Winner is
    min(doc_id) per canonical (ONE count-combinable agg, the
    exact_dedup rule — no window, a viral URL is one combinable
    group). Returns (canon, doc_id, n_occurrences)."""
    u = urls.select(
        "doc_id", canonicalize_url("url").alias("canon"))
    return (u.groupBy("canon")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy("canon"))


# ---------------------------------------------------------------------------
# Crawl snapshot diffing — the refresh-crawl operation: compare two
# crawls of the same web by canonical URL and classify every page as
# added / removed / changed / unchanged. This is how a pipeline decides
# what to re-extract, re-dedup, and re-embed after a new crawl lands —
# diff first, reprocess only `added` + `changed` (usually a few percent
# of a 100 TB snapshot).

SNAPSHOT_MOD = 9          # page-universe modulus for the two snapshots
OLD_EXCLUDE = 0           # pages missing from the OLD crawl -> "added"
NEW_EXCLUDE = 5           # pages missing from the NEW crawl -> "removed"
CHANGED_MODS = (1, 2)     # pages whose content changed between crawls


def synthesize_snapshot(documents: DataFrame,
                        exclude_page_mod: int | None = None,
                        change_mods: tuple[int, ...] = ()) -> DataFrame:
    """One crawl snapshot (canon, domain, fp) synthesized from the
    fixture: page key = the canonical URL (quads collapse), content
    fingerprint = min(md5(text)) over the page's fetched variants
    (deterministic, DuckDB-replayable). ``exclude_page_mod`` drops the
    pages that crawl never fetched; ``change_mods`` re-stamps the
    listed pages' fingerprints (md5(fp || ':recrawl')) — the
    deterministic stand-in for content that changed between crawls.
    All scan-side expressions + ONE count-combinable groupBy on canon;
    no joins (``synth_url_expr`` keeps url and text in the same row)."""
    d = documents.select(
        F.md5("text").alias("h"),
        canonicalize_url(synth_url_sql()).alias("canon"),
        F.expr("doc_id div 4").cast("long").alias("page"))
    if exclude_page_mod is not None:
        d = d.filter(F.pmod(F.col("page"), F.lit(SNAPSHOT_MOD))
                     != exclude_page_mod)
    pages = d.groupBy("canon").agg(F.min("h").alias("fp0"),
                                   F.min("page").alias("page"))
    fp = F.col("fp0")
    if change_mods:
        fp = F.when(
            F.pmod(F.col("page"), F.lit(SNAPSHOT_MOD)).isin(*change_mods),
            F.md5(F.concat(F.col("fp0"), F.lit(":recrawl")))).otherwise(fp)
    return pages.select("canon",
                        url_domain("canon").alias("domain"),
                        fp.alias("fp"))


def crawl_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Diff two snapshots (canon, domain, fp) by canonical URL: one
    FULL OUTER join on the page key — the single unavoidable shuffle
    (at 100 TB, write both snapshots bucketed by canon,
    ``sources/bucketing.py``, and the join is co-located with no
    exchange at all). Returns (canon, domain, status, fp_old, fp_new)
    with status ∈ added / removed / changed / unchanged."""
    # presence is tracked with explicit side markers, NOT fp nullness:
    # a caller-supplied snapshot row with a NULL fingerprint (e.g. NULL
    # text upstream) is still a PRESENT page and must diff as
    # changed/unchanged (null-safe equality), never as added/removed
    o = old.select("canon", F.col("domain").alias("dom_o"),
                   F.col("fp").alias("fp_old"), F.lit(1).alias("_o"))
    n = new.select("canon", F.col("domain").alias("dom_n"),
                   F.col("fp").alias("fp_new"), F.lit(1).alias("_n"))
    j = o.join(n, "canon", "full_outer")
    status = (F.when(F.col("_o").isNull(), "added")
              .when(F.col("_n").isNull(), "removed")
              .when(F.col("fp_old").eqNullSafe(F.col("fp_new")),
                    "unchanged")
              .otherwise("changed"))
    return j.select("canon",
                    F.coalesce("dom_o", "dom_n").alias("domain"),
                    status.alias("status"), "fp_old", "fp_new")


def crawl_diff_stats(documents: DataFrame) -> DataFrame:
    """The registered rollup: synthesize the OLD crawl (pages
    ``page % 9 != 0``) and the NEW crawl (``page % 9 != 5``, pages
    1,2 mod 9 re-stamped as changed), diff, and count per
    (domain, status) with a mod-prime canonical checksum — every page
    routing decision is value-hash-pinned. Output is bounded by
    domains × 4 statuses."""
    old = synthesize_snapshot(documents, exclude_page_mod=OLD_EXCLUDE)
    new = synthesize_snapshot(documents, exclude_page_mod=NEW_EXCLUDE,
                              change_mods=CHANGED_MODS)
    d = crawl_diff(old, new)
    h = F.pmod(F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
               .cast("long"), F.lit(CKSUM_MOD))
    return (d.groupBy("domain", "status")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.sum(h).alias("canon_checksum"))
            .orderBy("domain", "status"))


# ---------------------------------------------------------------------------
# Domain blocklist — the crawl-hygiene gate every public pipeline runs
# right after canonicalization (C4's blocklist recipe at domain level):
# drop documents whose canonical domain is on a deny list BEFORE any
# expensive extraction/dedup stage sees them.

# the fixture blocklist: hosts are www.site<item%16>.example.com, so
# blocking two of the 16 host classes exercises both outcomes
BLOCKED_HOST_MODS = (3, 7)


def fixture_blocklist() -> list[str]:
    """The deterministic deny list for the fixture's 16 synthesized
    hosts (production feeds a real list)."""
    return [f"www.site{m}.example.com" for m in BLOCKED_HOST_MODS]


def blocklist_filter(documents: DataFrame,
                     blocked: list[str] | DataFrame) -> DataFrame:
    """Documents surviving the domain deny list, with (url, canon,
    domain) attached. A list (the common case — deny lists are
    thousands of rows, metadata-sized) rides in as ONE plan-literal
    array and the gate is a scan-side ``array_contains`` — no join, no
    shuffle. A DataFrame blocklist (one column ``domain``) broadcasts
    into a LEFT ANTI join — still never shuffles the corpus."""
    d = documents.withColumn(
        "canon", canonicalize_url(synth_url_sql())).withColumn(
        "domain", url_domain("canon"))
    if isinstance(blocked, DataFrame):
        deny = blocked.select(F.col("domain").alias("domain"))
        return d.join(F.broadcast(deny), "domain", "left_anti")
    return d.filter(~F.array_contains(
        F.lit([str(b) for b in blocked]), F.col("domain")))


def domain_blocklist_stats(documents: DataFrame) -> DataFrame:
    """The registered rollup: per source, documents kept vs dropped by
    the fixture deny list, with an id-sum membership checksum over the
    kept set so the value-hash pins every routing decision. Scan-side
    gate + one count-combinable agg."""
    d = documents.withColumn(
        "domain", url_domain(canonicalize_url_sql(synth_url_sql())))
    blocked = F.array_contains(F.lit(fixture_blocklist()),
                               F.col("domain"))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(blocked.cast("long")).alias("n_blocked"),
                 F.sum((~blocked).cast("long")).alias("n_kept"),
                 F.sum(F.when(~blocked, F.pmod(F.col("doc_id"),
                                               F.lit(CKSUM_MOD)))
                       .otherwise(F.lit(0))).alias("kept_checksum"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# Domain reputation — the operating table a crawl team actually
# triages (verdict r10 item 9): URL hygiene × content quality, per
# registrable domain. A domain with a high duplicate-fetch rate wastes
# crawl budget; one with a high exact-text-dup rate or short/low-alpha
# docs is boilerplate-heavy and a candidate for the blocklist.

LOW_ALPHA_MILLI = 600   # alpha chars < 60.0% of text → low-alpha doc
SHORT_DOC_CHARS = 100   # docs under this length count as short


def domain_reputation(documents: DataFrame) -> DataFrame:
    """Per-domain rollup joining TWO metadata-sized aggregations: URL
    hygiene (fetches vs canonical pages — how much crawl budget
    canonicalization saves per domain) and content quality (exact-text
    dup rate in integer milli, mean length, short / low-alpha doc
    counts — the ``corpus_datasheet`` signals keyed by domain instead
    of source). Everything is integer-exact: the dup rate is
    cross-multiplied ``div``, the alpha gate compares
    ``alpha_chars·1000 < LOW_ALPHA_MILLI·len`` — no float knife-edges,
    full DuckDB value-hash parity.

    100 TB shape: both inputs are ONE count-combinable groupBy over the
    same scan-side projection (synthesis+canonicalization is pure
    codegen; domains are a bounded key space), and the stitch is a
    broadcast join of two domain-sized rollups — no corpus shuffle
    beyond the two aggs, no window, no Python."""
    d = documents.select(
        "doc_id", "text",
        canonicalize_url(synth_url_sql()).alias("canon"))
    d = d.withColumn("domain", url_domain("canon"))
    urlr = (d.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count_distinct("canon").alias("n_pages")))
    low_alpha = (F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
                 * 1000 < F.lit(LOW_ALPHA_MILLI) * F.length("text"))
    contr = (d.groupBy("domain")
             .agg(F.count_distinct(F.md5("text"))
                  .alias("n_distinct_texts"),
                  F.sum(F.length("text")).alias("total_chars"),
                  F.sum((F.length("text") < SHORT_DOC_CHARS)
                        .cast("long")).alias("n_short_docs"),
                  F.sum(low_alpha.cast("long"))
                  .alias("n_low_alpha_docs")))
    return (urlr.join(F.broadcast(contr), "domain")
            .select("domain", "n_docs", "n_pages",
                    (F.col("n_docs") - F.col("n_pages"))
                    .alias("n_dup_fetches"),
                    (F.col("n_docs") - F.col("n_distinct_texts"))
                    .alias("n_dup_texts"),
                    F.expr("(n_docs - n_distinct_texts) * 1000 "
                           "div n_docs").alias("text_dup_milli"),
                    F.expr("total_chars div n_docs").alias("mean_chars"),
                    "n_short_docs", "n_low_alpha_docs")
            .orderBy("domain"))


# ---------------------------------------------------------------------------
# robots.txt — the frontier-politeness gate (RFC 9309) between URL
# canonicalization and fetching: a crawler may only fetch a URL its
# domain's robots rules allow. Full §2.2.3 special-character support:
# `*` matches any character sequence, a trailing `$` anchors the end
# of the match target (path + query, §2.2.2); the MOST SPECIFIC
# matching rule wins — specificity = octet length of the raw rule
# pattern (the reference-parser convention, google/robotstxt), Allow
# wins a length tie, no match → allowed.
#
# GROUP SELECTION (RFC 9309 §2.2.1): rules belong to GROUPS, each
# introduced by one or more ``User-agent:`` lines; a crawler applies
# ONLY the most specific matching group for its product token —
# a group matches when one of its UA tokens is a case-insensitive
# PREFIX of the crawler's token (the google/robotstxt convention:
# group ``foo`` matches crawler ``foobot``), specificity = token
# length, ``*`` matches everything at specificity 0, and every group
# tied at the best specificity combines (§2.2.1: "the matching
# groups' rules MUST be combined"). No matching group → allow-all.
#
# Crawl-delay (the de-facto politeness extension RFC 9309 §2.2.4
# leaves to implementers) is parsed per-group and the SELECTED
# group's delay feeds ``scheduling.host_delay_us``; ``Sitemap:``
# lines (sitemaps.org discovery) are global, not group-scoped.

# the crawler's product token — group selection is relative to it
ROBOTS_AGENT = "toybot"

# line grammar — ONE literal per line kind, shared with the DuckDB
# twins (field names case-insensitive per RFC 9309 §2.1; values for
# UA/delay/sitemap are space-trimmed)
ROBOTS_UA_RE = r"(?i)^user-agent: *(.+?) *$"
ROBOTS_RULE_RE = r"(?i)^(allow|disallow): (.+)$"
ROBOTS_DELAY_RE = r"(?i)^crawl-delay: *([0-9]+) *$"
ROBOTS_SITEMAP_RE = r"(?i)^sitemap: *(.+?) *$"

# The fixture robots.txt, as (condition, text-block) pairs — the ONE
# structure all three implementations render (the Spark synthesis,
# the DuckDB ``rb`` CTE, and tests/robots_ref.py), so the fixture can
# never desynchronize across engines. Conditions: None = every host,
# "m4_K" = host class m % 4 == K, "m8_5" = m % 8 == 5. ``{domain}``
# interpolates the host. Coverage per block:
#   - a decoy group (megabot/ultrabot, multi-UA-line) that must be
#     IGNORED for our token — under pre-r13 union semantics its
#     ``Disallow: /`` would block every page on every host
#   - a global Sitemap: line between groups (discovery, not a rule)
#   - the `*` group with the r12 rule battery (prefix, wildcard,
#     anchor, tie, full-block classes) + Crawl-delay on m4_2
#   - on m%8==5 hosts: a shorter-prefix group (``toy``), a
#     non-matching longer token (``toybot-news``), and TWO exact
#     ``toybot`` groups (upper/lower case) whose rules must COMBINE
#     and REPLACE the `*` group entirely
# robots.txt FETCH-FAILURE semantics (RFC 9309 §2.3.1): what a host's
# robots.txt *transport* outcome means for the gate —
#   2xx        → parse and apply the rules (the normal path)
#   4xx/absent → "unavailable": allow-all (§2.3.1.2 — every consumer
#                LEFT-joins and coalesces to allow; exercised by frame
#                domains with no rules row, e.g. redirect-target hosts)
#   5xx        → "unreachable": assume COMPLETE DISALLOW (§2.3.1.3);
#                the text is also unreadable, so no Crawl-delay and no
#                Sitemap discovery come from it
# Fixture: hosts m ∈ ROBOTS_5XX_MODS answer 503 (site8 — its would-be
# text is the plain `*` group, so the blocked outcome is attributable
# to the STATUS, not to any rule).
ROBOTS_5XX_MODS = (8,)

ROBOTS_FIXTURE_BLOCKS: list[tuple[str | None, str]] = [
    (None, "User-agent: megabot\nUser-agent: ultrabot\n"
           "Disallow: /\nCrawl-delay: 9\n"),
    (None, "Sitemap: http://{domain}/sitemaps/index.xml\n"),
    (None, "User-agent: *\nDisallow: /private\nDisallow: /*.php$\n"),
    ("m4_1", "Disallow: /articles/item1\nAllow: /articles/item12\n"),
    ("m4_2", "Disallow: /*4?\nDisallow: /*2?\n"
             "Allow: /articles/item*14?*\nAllow: /a*6?\n"
             "Disallow: /*66?\nCrawl-delay: 3\n"),
    ("m4_3", "Disallow: /\n"),
    ("m8_5", "User-agent: toy\nDisallow: /\n"
             "User-agent: toybot-news\nDisallow: /\n"
             "USER-AGENT: TOYBOT\nAllow: /articles/item1\n"
             "Disallow: /articles/item12\nCrawl-delay: 4\n"
             "User-agent: toybot\nDisallow: /*5?\n"),
]


def _fixture_cond(cond: str | None, m) -> "F.Column":
    if cond is None:
        return F.lit(True)
    if cond == "m8_5":
        return F.pmod(m, F.lit(8)) == 5
    if cond in ("m4_1", "m4_2", "m4_3"):
        return F.pmod(m, F.lit(4)) == int(cond.split("_")[1])
    # unknown tags must fail in EVERY renderer (review r13: a silent
    # fall-through here while robots_ref skipped the block would
    # desynchronize the three fixture copies the shared structure
    # exists to keep in lockstep)
    raise ValueError(f"unknown ROBOTS_FIXTURE_BLOCKS condition {cond!r}")


def synthesize_robots(documents: DataFrame) -> DataFrame:
    """(domain, robots_txt): one deterministic robots.txt per fixture
    host class, rendered from ``ROBOTS_FIXTURE_BLOCKS`` (see there for
    the group/rule coverage map). The frame is built STRUCTURALLY from
    the 16 host classes (``range(16)``), never by scanning the corpus
    for its domains (review r13: the old corpus-distinct made every
    robots consumer — gates, delay frame, sitemap discovery — pay a
    full corpus scan for a 16-row broadcast side; production loads
    robots.txt from the domain-keyed fetch log, which is exactly this
    shape). Host classes absent from a small corpus get an unused
    rules row — harmless, every consumer LEFT-joins from the corpus
    side. Domain-class-sized — the broadcast side.

    ``status`` is the robots.txt fetch's HTTP status (the transport
    outcome a production fetch log records next to the body): 200
    except the ``ROBOTS_5XX_MODS`` classes (503). Consumers must gate
    on it per RFC 9309 §2.3.1 (see the constant's comment)."""
    d = documents.sparkSession.range(16).select(
        F.concat(F.lit("www.site"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("domain"))
    m = F.regexp_extract("domain", r"site(\d+)", 1).cast("int")
    parts = []
    for cond, text in ROBOTS_FIXTURE_BLOCKS:
        chunks = text.split("{domain}")
        body = F.lit(chunks[0]) if len(chunks) == 1 else F.concat(
            *[c for pair in
              [(F.lit(chunks[i]), F.col("domain"))
               for i in range(len(chunks) - 1)]
              for c in pair] + [F.lit(chunks[-1])])
        parts.append(F.when(_fixture_cond(cond, m), body)
                     .otherwise(F.lit("")))
    status = (F.when(m.isin(*[int(k) for k in ROBOTS_5XX_MODS]),
                     F.lit(503))
              .otherwise(F.lit(200)))
    return d.select("domain", F.concat(*parts).alias("robots_txt"),
                    status.alias("status"))


def _rule_rx(p) -> "F.Column":
    """Compile one robots rule pattern to a match regex (RFC 9309
    §2.2.3): strip a trailing ``$`` (end anchor), escape every other
    regex metacharacter (``ROBOTS_RX_META`` — shared with the DuckDB
    twin), turn ``*`` into ``.*``, re-anchor. A mid-pattern ``$`` is
    literal (the reference-parser convention)."""
    anchored = p.endswith("$")
    body = F.regexp_replace(p, r"\$$", "")
    esc = F.regexp_replace(body, ROBOTS_RX_META, "\\\\$1")
    star = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), star,
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def _ua_score_sql(agent: str) -> str:
    """SQL for one UA token's match specificity against ``agent``:
    ``*`` → 0, a case-insensitive prefix of the agent token → token
    length, otherwise −1 (no match). Shared shape with the DuckDB
    twin (queries._robots_rules_ctes) and tests/robots_ref.py."""
    if not agent or not all(c.isalnum() or c in "-_" for c in agent):
        raise ValueError(f"parse_robots: agent must be a bare product "
                         f"token, got {agent!r}")
    ua = f"regexp_extract(ln, '{ROBOTS_UA_RE}', 1)"
    return (f"CASE WHEN {ua} = '*' THEN 0 "
            f"WHEN startswith('{agent.lower()}', lower({ua})) "
            f"THEN length({ua}) ELSE -1 END")


def _group_fold_sql(col, agent: str, entry_type: str, entry_case: str,
                    finish: str) -> str:
    """The shared group-structure fold over robots.txt lines: walks
    the file once tracking the current group's best UA-match score
    (``g`` — consecutive UA lines accumulate via greatest; a UA line
    after group BODY starts a new group), the file-wide best group
    score (``gm``), and an array of collected entries (``es`` —
    rules or delays, each stamped with its group's score). ``nw``
    flags that the current group has body, so the next UA line opens
    a new group; both rule AND delay lines count as body (a UA line
    after either must not merge into the previous group). Selection
    happens in ``finish``: keep entries whose group score equals the
    file best and matched at all (g >= 0) — RFC 9309 §2.2.1
    most-specific group, ties combined."""
    ua = f"regexp_extract(ln, '{ROBOTS_UA_RE}', 1)"
    score = _ua_score_sql(agent)
    body = (f"(regexp_extract(ln, '{ROBOTS_RULE_RE}', 2) != '' OR "
            f"regexp_extract(ln, '{ROBOTS_DELAY_RE}', 1) != '')")
    return f"""aggregate(split({col}, '\n'),
        struct(cast(-1 as int) as g, true as nw, cast(-1 as int) as gm,
               cast(array() as array<{entry_type}>) as es),
        (acc, ln) -> CASE
            WHEN {ua} != '' THEN
                struct(CASE WHEN acc.nw THEN {score}
                       ELSE greatest(acc.g, {score}) END as g,
                       false as nw,
                       greatest(acc.gm,
                                CASE WHEN acc.nw THEN {score}
                                ELSE greatest(acc.g, {score}) END) as gm,
                       acc.es as es)
            WHEN {body} THEN
                struct(acc.g as g, true as nw, acc.gm as gm,
                       {entry_case} as es)
            ELSE acc END,
        acc -> {finish})"""


def parse_robots(col, agent: str = ROBOTS_AGENT) -> "F.Column":
    """robots.txt text → array<struct<p: string, a: boolean,
    w: boolean, rx: string>> of the rules in the group(s) SELECTED
    for ``agent`` per RFC 9309 §2.2.1 (most specific matching
    ``User-agent:`` token — longest case-insensitive prefix of the
    agent token, else the ``*`` group; equal-specificity groups
    combine; no matching group → empty array → allow-all). Fields:
    a = Allow; w = the pattern carries `*`/`$` and needs the regex
    engine; rx = the compiled match regex, built ONCE per rule on the
    domain-sized frame — the corpus-sized verdict fold executes it
    only for wildcard rules and matches plain prefixes with
    startswith. One scan-side fold; comments/blank/unknown lines are
    structural no-ops (they neither close a group nor join one)."""
    verb = f"lower(regexp_extract(ln, '{ROBOTS_RULE_RE}', 1))"
    pat = f"regexp_extract(ln, '{ROBOTS_RULE_RE}', 2)"
    entry_case = (f"""CASE WHEN {pat} != '' THEN
            acc.es || array(struct({pat} as p, {verb} = 'allow' as a,
                                   acc.g as g))
        ELSE acc.es END""")
    base = F.expr(_group_fold_sql(
        col, agent,
        "struct<p: string, a: boolean, g: int>", entry_case,
        "filter(acc.es, r -> r.g >= 0 AND r.g = acc.gm)"))
    # w marks rules that actually NEED the regex engine; plain-prefix
    # rules (the overwhelming majority of real robots.txt lines) match
    # with startswith in the verdict fold — no per-row regex compile
    # on the corpus-sized side (r12 scaling: the all-regex fold bent
    # the decade ratio from 1.24x to 1.79x)
    return F.transform(base, lambda r: F.struct(
        r["p"].alias("p"), r["a"].alias("a"),
        (r["p"].contains("*") | r["p"].endswith("$")).alias("w"),
        _rule_rx(r["p"]).alias("rx")))


def parse_crawl_delay(col, agent: str = ROBOTS_AGENT) -> "F.Column":
    """robots.txt text → the SELECTED group's ``Crawl-delay`` in
    integer seconds, NULL when the selected group declares none (the
    scheduler falls back to its rate ladder). Group selection is the
    same §2.2.1 walk as ``parse_robots`` (one shared fold generator);
    several delay lines across combined tied groups resolve to the
    slowest (max — the conservative politeness reading)."""
    cd = f"regexp_extract(ln, '{ROBOTS_DELAY_RE}', 1)"
    entry_case = (f"""CASE WHEN {cd} != '' THEN
            acc.es || array(struct(cast({cd} as bigint) as d,
                                   acc.g as g))
        ELSE acc.es END""")
    return F.expr(_group_fold_sql(
        col, agent, "struct<d: bigint, g: int>", entry_case,
        "array_max(transform("
        "filter(acc.es, e -> e.g >= 0 AND e.g = acc.gm), e -> e.d))"))


def parse_sitemap_locs(col) -> "F.Column":
    """robots.txt text → array of declared ``Sitemap:`` locations, in
    file order. Sitemap lines are GLOBAL (sitemaps.org / RFC 9309 §6:
    not group-scoped), so no selection walk — one scan-side
    split/transform/filter."""
    return F.expr(
        f"""filter(transform(split({col}, '\n'),
                   ln -> regexp_extract(ln, '{ROBOTS_SITEMAP_RE}', 1)),
                   s -> s != '')""")


def robots_allowed(rules, path) -> "F.Column":
    """TRUE when the most specific rule matching ``path`` allows
    (specificity = raw-pattern octet length; Allow wins a length tie;
    no matching rule → allowed; NULL rules — a domain with no
    robots.txt row — fold to NULL, which every gate coalesces to
    allow-all per RFC 9309 §2.3.1.2/2.3.1.3). One scan-side aggregate
    fold over the (small) rules array; each rule's regex was compiled
    once on the broadcast side."""
    return F.expr(
        f"""aggregate(filter({rules},
                      r -> CASE WHEN r.w THEN {path} rlike r.rx
                                ELSE startswith({path}, r.p) END),
                      struct(-1 as l, true as a),
                      (acc, r) -> CASE
                          WHEN length(r.p) > acc.l
                               OR (length(r.p) = acc.l AND r.a)
                          THEN struct(length(r.p) as l, r.a as a)
                          ELSE acc END).a""")


def robots_stats(documents: DataFrame) -> DataFrame:
    """The registered rollup: per domain — URLs checked, allowed,
    blocked, and an id-sum checksum over the ALLOWED set, so the
    value-hash pins every per-URL verdict. Plan: scan-side
    canonicalization + ONE broadcast join against the domain-sized
    parsed-rules frame + one combinable agg — the corpus is never
    shuffled before the rollup."""
    u = documents.select(
        "doc_id", canonicalize_url(synth_url_sql()).alias("canon"))
    u = u.select(
        "doc_id", url_domain("canon").alias("domain"),
        F.regexp_extract("canon", ROBOTS_PATH_RE, 1).alias("path"))
    rules = synthesize_robots(documents).select(
        "domain", parse_robots("robots_txt").alias("rules"),
        (F.col("status") >= 500).alias("r5xx"))
    # LEFT join + coalesce(…, true): a domain with no robots.txt row
    # is allow-all (RFC 9309 §2.3.1.2 — absence of rules never
    # blocks); a 5xx robots fetch is FULL DISALLOW (§2.3.1.3 — the
    # rules are unreadable, so the crawler must assume the worst)
    ok = F.when(F.coalesce("r5xx", F.lit(False)), F.lit(False)) \
        .otherwise(F.coalesce(robots_allowed("rules", "path"),
                              F.lit(True)))
    return (u.join(F.broadcast(rules), "domain", "left")
            .withColumn("ok", ok)
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.sum(F.col("ok").cast("long")).alias("n_allowed"),
                 F.sum((~F.col("ok")).cast("long")).alias("n_blocked"),
                 F.sum(F.when(F.col("ok"),
                              F.pmod(F.col("doc_id"),
                                     F.lit(CKSUM_MOD)))
                       .otherwise(F.lit(0))).alias("allowed_checksum"))
            .orderBy("domain"))


def robots_filter_docs(documents: DataFrame) -> DataFrame:
    """The materializing form of the robots gate: documents whose
    synthesized canonical URL the domain's robots rules ALLOW (input
    schema preserved, plus the fetch-layer columns dropped again) —
    composed into the corpus pipeline as ``--robots``, right after the
    domain deny list (both are frontier hygiene; robots needs the
    parse+fold, so the cheaper blocklist runs first). Same plan shape
    as ``robots_stats`` minus the rollup: scan-side canonicalization,
    ONE broadcast join against the domain-sized rules frame, a scan-
    side verdict fold — the corpus is never shuffled."""
    u = documents.withColumn(
        "_canon", canonicalize_url(synth_url_sql())).withColumn(
        "_domain", url_domain("_canon")).withColumn(
        "_path", F.regexp_extract("_canon", ROBOTS_PATH_RE, 1))
    rules = synthesize_robots(documents).select(
        F.col("domain").alias("_domain"),
        parse_robots("robots_txt").alias("_rules"),
        (F.col("status") >= 500).alias("_r5xx"))
    return (u.join(F.broadcast(rules), "_domain", "left")
            .filter(F.when(F.coalesce("_r5xx", F.lit(False)),
                           F.lit(False))
                    .otherwise(F.coalesce(
                        robots_allowed("_rules", "_path"), F.lit(True))))
            .drop("_canon", "_domain", "_path", "_rules", "_r5xx"))


def deny_gate(frame: DataFrame,
              blocked: list[str] | None = None) -> DataFrame:
    """The plan-literal deny-list gate over any frame carrying a
    ``domain`` column — scan-side ``array_contains``, shareable ahead
    of a shuffle (the frontier applies it to raw edge rows BEFORE the
    rank join). One definition for every discovery channel (r11
    review: the frontier and the sitemap channel each hand-kept a
    copy; their gates are contractually identical)."""
    blocked = fixture_blocklist() if blocked is None else blocked
    return frame.filter(~F.array_contains(
        F.lit([str(b) for b in blocked]), F.col("domain")))


def shared_robots_rules(documents: DataFrame) -> DataFrame:
    """The parsed robots verdict frame (``domain``, ``_rules``,
    ``_r5xx``) built ONCE and lineage-cut — the shared broadcast side
    for a plan that gates several channels (fetch_list applies six
    gates; r14 measurement: re-analyzing the multi-KB group-selection
    fold per gate cost more driver time than executing the whole
    query). Domain-class-sized (16 rows), so the lazy checkpoint
    materializes metadata, never corpus data."""
    return synthesize_robots(documents).select(
        "domain", parse_robots("robots_txt").alias("_rules"),
        (F.col("status") >= 500).alias("_r5xx")).localCheckpoint(
        eager=False)


def robots_gate_frame(frame: DataFrame,
                      documents: DataFrame,
                      rules: DataFrame | None = None) -> DataFrame:
    """The robots longest-match gate over any frame carrying
    (``canon``, ``domain``): broadcast the domain-sized parsed-rules
    frame, fold the verdict per row, keep the allowed rows (input
    schema preserved). A frame domain with NO rules row passes —
    absence of robots.txt means allow-all (RFC 9309 §2.3.1.2), never
    silent disappearance — while a domain whose robots.txt fetch
    answered 5xx is FULL DISALLOW (§2.3.1.3). The shared second half
    of the discovery-channel gate sequence. ``rules`` — a
    ``shared_robots_rules`` frame — lets a multi-gate plan parse the
    rules once instead of per gate."""
    if rules is None:
        rules = synthesize_robots(documents).select(
            "domain", parse_robots("robots_txt").alias("_rules"),
            (F.col("status") >= 500).alias("_r5xx"))
    gated = frame.withColumn(
        "_path", F.regexp_extract("canon", ROBOTS_PATH_RE, 1))
    return (gated.join(F.broadcast(rules), "domain", "left")
            .filter(F.when(F.coalesce("_r5xx", F.lit(False)),
                           F.lit(False))
                    .otherwise(F.coalesce(
                        robots_allowed("_rules", "_path"), F.lit(True))))
            .drop("_rules", "_path", "_r5xx"))
