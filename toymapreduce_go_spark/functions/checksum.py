"""The shared content-checksum convention: fold a value into the
oracle-comparable hash as ``x mod CKSUM_MOD`` and SUM the terms.

One constant, referenced by every operator that emits a certifying
checksum column (chunking, event_funnel, fuzzy_name_stats) AND by the
generated DuckDB oracle SQL — four independent literals drifting apart
would silently break value-hash parity for only some queries.

Why this prime: terms stay < ~10^6, so a per-group SUM is far from
int64 range at any realistic row count (10^12 rows ≈ 10^18), and the
inputs are always nonnegative (md5-derived prefixes < 2^48, epoch-µs),
so Spark ``pmod`` and DuckDB ``%`` agree exactly."""

CKSUM_MOD = 1_000_003
