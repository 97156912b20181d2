"""robots.txt parsing + crawl-permission filtering (RFC 9309).

The rule that matters at crawl scale: for a given user-agent group, the
MOST SPECIFIC (longest) matching path rule wins; on a length tie, Allow
beats Disallow. An empty Disallow value allows everything; no matching
rule means allowed.

Spark-first shape: robots files for 10^8 hosts parse into one
(host, agent, allow, prefix, rule_len) table — a few rules per host.
Applying it to a URL frontier is ONE equi-join on host (the rules side
is per-host-bounded, AQE-broadcastable per partition) + a prefix match
+ a per-(url, host) window to keep the longest rule. No UDFs anywhere.

Wildcard support: RFC 9309 ``*`` inside a path and ``$`` anchors are
translated to a regex match; plain prefixes stay prefix comparisons
(the fast path — the regex path only triggers on rules that contain
metacharacters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(robots: DataFrame, host_col: str = "host", body_col: str = "body") -> DataFrame:
    """(host, body) -> (host, agent, allow, prefix, rule_len).

    Group semantics per RFC 9309: consecutive ``User-agent:`` lines
    open a group that following Allow/Disallow lines attach to; a
    blank-line-separated new ``User-agent`` starts a new group. Rules
    attach to EVERY agent named in their group. Comments (#) and
    unknown directives are dropped. Pure Catalyst except the
    group-numbering window (per-host, robots files are KB-sized)."""
    lines = robots.select(
        host_col,
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("ln", "line"),
    ).select(
        host_col,
        "ln",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    )
    directives = lines.filter(F.col("line") != "").select(
        host_col,
        "ln",
        F.lower(F.trim(F.substring_index("line", ":", 1))).alias("key"),
        F.trim(
            F.substring(
                F.col("line"),
                F.length(F.substring_index("line", ":", 1)) + 2,
                F.lit(1 << 30),
            )
        ).alias("val"),
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))

    # a user-agent line that follows a rule line starts a NEW group
    w = Window.partitionBy(host_col).orderBy("ln")
    grouped = directives.withColumn(
        "new_group",
        (
            (F.col("key") == "user-agent")
            & (F.lag("key").over(w).isNull() | (F.lag("key").over(w) != "user-agent"))
        ).cast("int"),
    ).withColumn("grp", F.sum("new_group").over(w))

    agents = grouped.filter(F.col("key") == "user-agent").select(
        host_col, "grp", F.lower(F.col("val")).alias("agent")
    )
    rules = grouped.filter(F.col("key") != "user-agent").select(
        host_col,
        "grp",
        (F.col("key") == "allow").alias("allow"),
        F.col("val").alias("prefix"),
    )
    return (
        agents.join(rules, [host_col, "grp"])
        .filter(F.col("prefix") != "")  # empty Disallow = allow all = no rule
        .select(
            host_col, "agent", "allow", "prefix",
            F.length("prefix").alias("rule_len"),
        )
    )


def _rule_match(path_col, prefix_col):
    """RFC 9309 path match: plain prefixes compare directly; rules with
    ``*``/``$`` compile to an anchored regex."""
    has_meta = prefix_col.contains("*") | prefix_col.contains("$")
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(
            F.regexp_replace(
                # escape regex specials except * and $
                F.regexp_replace(prefix_col, r"([.\\+?\[\]()^{}|])", r"\\$1"),
                r"\*", ".*",
            ),
            r"\$$", "(END)",
        ),
    )
    rx = F.regexp_replace(rx, r"\(END\)$", "\\$")
    return F.when(has_meta, F.regexp_like(path_col, rx)).otherwise(
        path_col.startswith(prefix_col)
    )


def crawl_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Filter a URL frontier by robots rules for ``agent``: longest
    matching rule wins, Allow beats Disallow on ties, no match =
    allowed. Returns urls + ``allowed`` + the winning rule."""
    r = rules.filter(F.col("agent") == agent.lower()).select(
        F.col(host_col).alias("__rh"), "allow", "prefix", "rule_len"
    )
    joined = urls.join(
        r,
        (F.col(host_col) == F.col("__rh"))
        & _rule_match(F.col(path_col), F.col("prefix")),
        "left",
    )
    w = Window.partitionBy(host_col, path_col).orderBy(
        F.col("rule_len").desc_nulls_last(),
        F.col("allow").desc_nulls_last(),
        F.col("prefix").asc_nulls_last(),
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[c for c in urls.columns],
            F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
            F.col("prefix").alias("winning_rule"),
        )
    )


def crawl_delays(robots: DataFrame, host_col: str = "host", body_col: str = "body") -> DataFrame:
    """(host, body) -> (host, agent, delay_s): the non-standard but
    universally honored ``Crawl-delay`` directive, attached to its
    user-agent group with the same group-numbering pass as the path
    rules. Non-numeric values drop; multiple delays in one group keep
    the strictest (max)."""
    lines = robots.select(
        host_col,
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("ln", "line"),
    ).select(
        host_col,
        "ln",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    )
    directives = lines.filter(F.col("line") != "").select(
        host_col,
        "ln",
        F.lower(F.trim(F.substring_index("line", ":", 1))).alias("key"),
        F.trim(
            F.substring(
                F.col("line"),
                F.length(F.substring_index("line", ":", 1)) + 2,
                F.lit(1 << 30),
            )
        ).alias("val"),
    ).filter(F.col("key").isin("user-agent", "crawl-delay"))
    w = Window.partitionBy(host_col).orderBy("ln")
    grouped = directives.withColumn(
        "new_group",
        (
            (F.col("key") == "user-agent")
            & (F.lag("key").over(w).isNull() | (F.lag("key").over(w) != "user-agent"))
        ).cast("int"),
    ).withColumn("grp", F.sum("new_group").over(w))
    agents = grouped.filter(F.col("key") == "user-agent").select(
        host_col, "grp", F.lower(F.col("val")).alias("agent")
    )
    delays = grouped.filter(F.col("key") == "crawl-delay").select(
        host_col, "grp", F.col("val").try_cast("double").alias("delay_s")
    ).filter(F.col("delay_s").isNotNull())
    return (
        agents.join(delays, [host_col, "grp"])
        .groupBy(host_col, "agent")
        .agg(F.max("delay_s").alias("delay_s"))
    )


def robots_delta_audit(
    urls: DataFrame,
    robots_old: DataFrame,
    robots_new: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    round_digits: int = 6,
) -> DataFrame:
    """robots.txt change-impact audit — what a policy rollout blocks
    and frees.

    The pre-deploy check robots changes deserve and rarely get (a
    mis-scoped Disallow silently de-indexes a site section; the REP
    RFC 9309 gives no dry-run — this is it): evaluate the SAME url
    set under the old and new robots bodies via the shared
    longest-match evaluator (``crawl_allowed``) and diff the
    verdicts per host.

    Per host: (host, n_urls, allowed_old, allowed_new, newly_blocked,
    newly_allowed, churn_frac).
    """
    urls = urls.select(host_col, path_col).distinct()
    r_old = parse_robots(robots_old, host_col=host_col)
    r_new = parse_robots(robots_new, host_col=host_col)
    old = crawl_allowed(urls, r_old, host_col=host_col,
                        path_col=path_col).select(
        host_col, path_col, F.col("allowed").alias("a_old")
    )
    new = crawl_allowed(urls, r_new, host_col=host_col,
                        path_col=path_col).select(
        host_col, path_col, F.col("allowed").alias("a_new")
    )
    j = old.join(new, [host_col, path_col])
    return j.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.col("a_old").cast("long")).alias("allowed_old"),
        F.sum(F.col("a_new").cast("long")).alias("allowed_new"),
        F.sum(
            (F.col("a_old") & ~F.col("a_new")).cast("long")
        ).alias("newly_blocked"),
        F.sum(
            (~F.col("a_old") & F.col("a_new")).cast("long")
        ).alias("newly_allowed"),
        F.round(
            F.sum(
                (F.col("a_old") != F.col("a_new")).cast("long")
            )
            / F.count(F.lit(1)),
            round_digits,
        ).alias("churn_frac"),
    )
