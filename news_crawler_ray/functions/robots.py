"""robots.txt text parsing → the engine's robots config table.

The reference bot never reads robots.txt (it hard-sleeps 1 s between
requests, scheduler.py sleep analog); the north rule requires real
robots handling, so the engine consumes a parsed (host,
disallow_prefixes, crawl_delay_ms) table (stages/politeness.RobotsFilter
caches it per actor). This module closes the text side: raw fetched
robots.txt bodies → that table, per RFC 9309 group semantics for the
'*' user-agent (most-specific-agent groups are honored when they match
``agent``; unknown directives are ignored; a missing file or no
matching group means allow-all with the default delay).

Parsing is per-ROW Python on purpose: robots cardinality is hosts (the
politeness domain), not pages — at 10^10 URLs there are maybe 10^6
robots bodies of ~1 KB, a map_batches stage that is never the floor.
"""

from __future__ import annotations

import pyarrow as pa


def parse_robots_text(
    text: str | None, agent: str = "*", default_delay_ms: int = 1000
) -> tuple[list[str], int]:
    """One robots.txt body → (disallow_prefixes, crawl_delay_ms).

    Groups are runs of User-agent lines followed by rules; a group
    applies if any of its agents is '*' or a case-insensitive substring
    of ``agent``. The LONGEST matching agent string wins (RFC 9309
    most-specific rule); among groups with the same best match, rules
    merge. Empty Disallow lines (allow-all markers) are dropped.
    """
    if not text:
        return [], default_delay_ms
    groups: list[tuple[list[str], list[str], int | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_delay: int | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_delay, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay, in_rules = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(value.lower())
        elif field in ("disallow", "crawl-delay"):
            in_rules = True
            if field == "disallow":
                if value:
                    cur_dis.append(value)
            else:
                try:
                    cur_delay = int(float(value) * 1000)
                except ValueError:
                    pass
    flush()

    agent_l = agent.lower()
    best_len = -1
    for agents, _, _ in groups:
        for a in agents:
            if a == "*" or a in agent_l:
                L = 0 if a == "*" else len(a)
                best_len = max(best_len, L)
    if best_len < 0:
        return [], default_delay_ms
    dis: list[str] = []
    delay: int | None = None
    for agents, d, cd in groups:
        match = max(
            (0 if a == "*" else len(a))
            for a in agents
            if a == "*" or a in agent_l
        ) if any(a == "*" or a in agent_l for a in agents) else -1
        if match == best_len:
            dis.extend(d)
            if cd is not None:
                delay = cd if delay is None else max(delay, cd)
    return dis, delay if delay is not None else default_delay_ms


def parse_robots_batch(
    batch: pa.Table,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
    default_delay_ms: int = 1000,
) -> pa.Table:
    """(host, robots_txt) rows → the politeness config table
    (host, disallow_prefixes, crawl_delay_ms) — feed straight into
    stages/politeness.robots_table_to_config."""
    dis, delay = [], []
    for t in batch[text_col].to_pylist():
        d, ms = parse_robots_text(t, agent=agent, default_delay_ms=default_delay_ms)
        dis.append(d)
        delay.append(ms)
    return pa.table(
        {
            "host": batch[host_col],
            "disallow_prefixes": pa.array(dis, pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(delay, pa.int32()),
        }
    )
