"""Unrolled ANSI-SQL oracle of the crawl scheduler (DuckDB-runnable).

The engine's micro-round loop (operators/frontier.py) has fixed round
count in the correctness fixture, so the whole crawl unrolls into a
chain of CTEs: window politeness + anti-join dedup per round. The
driver runs this SQL in DuckDB against the same `documents` view and
hash-compares with the Spark result — crawl ordering AND the final
URL-seen set are therefore value-checked, not just row-counted
(BASELINE.json north_rule: "matching the reference's crawl ordering
and URL-seen set under the same seed list + politeness budget").
"""

from __future__ import annotations

from ..datagen import (
    CRAWL_ROUNDS,
    DEFAULT_BUDGET,
    H0_BUDGET,
    ROBOTS_BLOCKED_DAY,
    ROBOTS_BLOCKED_HOST,
    SEED_DOC_IDS,
    pages_select_sql,
)

_BUDGET_CASE = (
    f"CASE WHEN host = 'h0.test' THEN {H0_BUDGET} ELSE {DEFAULT_BUDGET} END"
)


def crawl_oracle_sql(n_docs: int, rounds: int = CRAWL_ROUNDS) -> str:
    seeds = ", ".join(str(s) for s in SEED_DOC_IDS)
    ctes = [
        f"pages AS ({pages_select_sql(n_docs, 'duckdb')})",
        f"""frontier_0 AS (
          SELECT url, host, priority FROM pages WHERE doc_id IN ({seeds})
        )""",
        "seen_0 AS (SELECT url FROM frontier_0)",
    ]
    for r in range(rounds):
        ctes.append(f"""sched_{r} AS (
          SELECT url, host, priority,
                 row_number() OVER (PARTITION BY host ORDER BY priority, url) AS rn
          FROM frontier_{r}
        )""")
        ctes.append(f"""fetch_{r} AS (
          SELECT url, host, priority FROM sched_{r} WHERE rn <= {_BUDGET_CASE}
        )""")
        if r < rounds - 1:
            ctes.append(f"""defer_{r} AS (
              SELECT url, host, priority FROM sched_{r} WHERE rn > {_BUDGET_CASE}
            )""")
            ctes.append(f"""disc_{r} AS (
              SELECT DISTINCT p2.url, p2.host, p2.priority
              FROM fetch_{r} f
              JOIN pages p ON p.url = f.url
              JOIN pages p2
                ON p2.url = p.next1_url OR p2.url = p.next2_url
              WHERE NOT (p2.host = '{ROBOTS_BLOCKED_HOST}'
                         AND p2.day_time = {ROBOTS_BLOCKED_DAY})
            )""")
            ctes.append(f"""new_{r} AS (
              SELECT d.url, d.host, d.priority FROM disc_{r} d
              WHERE d.url NOT IN (SELECT url FROM seen_{r})
            )""")
            ctes.append(f"""frontier_{r + 1} AS (
              SELECT * FROM defer_{r} UNION ALL SELECT * FROM new_{r}
            )""")
            ctes.append(f"""seen_{r + 1} AS (
              SELECT url FROM seen_{r} UNION ALL SELECT url FROM new_{r}
            )""")
    fetched_union = " UNION ALL ".join(
        f"SELECT {r} AS round, url, host, priority FROM fetch_{r}"
        for r in range(rounds)
    )
    ctes.append(f"fetched AS ({fetched_union})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
        SELECT cast(round as int) AS round, url, host,
               cast(priority as int) AS priority,
               cast(row_number() OVER (ORDER BY round, priority, host, url)
                    as int) AS fetch_order
        FROM fetched
        """
    )


def seen_set_oracle_sql(n_docs: int, rounds: int = CRAWL_ROUNDS) -> str:
    """Final URL-seen set (every URL ever enqueued)."""
    body = crawl_oracle_sql(n_docs, rounds)
    # reuse the CTE chain; replace the final select
    head = body[: body.rindex("SELECT cast(round as int)")]
    return head + f"SELECT url FROM seen_{rounds - 1} ORDER BY url"


def host_lineage_oracle_sql(n_docs: int, rounds: int = CRAWL_ROUNDS) -> str:
    """Per-(round, host) scheduled/deferred counts — the unrolled-SQL
    twin of crawl(host_lineage=True). Deferred rows exist for EVERY
    round in the engine (the final round's unscheduled remainder
    included), so the deferred side is inlined from sched_r rather
    than reusing the defer_r CTEs (which stop one round early)."""
    body = crawl_oracle_sql(n_docs, rounds)
    head = body[: body.rindex("SELECT cast(round as int)")]
    unions = " UNION ALL ".join(
        f"""SELECT {r} AS round, host,
               CASE WHEN rn <= {_BUDGET_CASE} THEN 1 ELSE 0 END AS taken
            FROM sched_{r}"""
        for r in range(rounds)
    )
    return head + f"""
        SELECT cast(round AS int) AS round, host,
               cast(sum(taken) AS bigint) AS n_scheduled,
               cast(sum(1 - taken) AS bigint) AS n_deferred
        FROM ({unions})
        GROUP BY round, host
        ORDER BY round, host
    """
