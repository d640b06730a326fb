"""robots.txt over the live transport: fetch + parse into the robots
table the politeness scheduler consumes.

The engine's robots rules normally arrive as a parquet table (host,
disallow_prefixes, crawl_delay_ms — fixtures/synth.make_robots, the
reference's global sleep(1) upgraded to per-host budgets). A real
deployment discovers those rules from each host's ``/robots.txt``; this
module closes that loop on the same injectable transport the fetch
stage uses (stages/transport.py):

* :func:`parse_robots_txt` — pure RFC-9309-style parser (user-agent
  group selection by longest matching product token, ``*`` fallback,
  ``Disallow`` prefixes, ``Crawl-delay`` seconds → ms, comments,
  case-insensitive keys). Pure function ⇒ unit-testable without
  sockets, and the sequential oracle for the fetch stage.
* :func:`render_robots_txt` — the inverse, used by the loopback server
  (testing/httpstore serves ``/{host}/robots.txt``) and round-trip
  tests.
* :class:`RobotsFetchStage` / :func:`fetch_robots_table` — actor-pool
  ``map_batches`` over a table of hosts: one GET per host through a
  persistent-connection transport, parse, emit the robots schema. At
  cluster scale the host list is millions of rows — it shards like any
  other Dataset; the transport session is per-actor state (T1).
  Unreachable/absent robots (404, timeout) mean ALLOW-ALL with the
  default delay — the standard's semantics and the reference's
  implicit behavior (it never fetched robots at all), as row-level
  data, never a failed job (T5).
"""

from __future__ import annotations

import http.client

import pyarrow as pa

ROBOTS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("disallow_prefixes", pa.list_(pa.string())),
        ("crawl_delay_ms", pa.int32()),
    ]
)


def parse_robots_txt(
    text: str, user_agent: str = "*", default_delay_ms: int = 1000
) -> "tuple[list[str], int]":
    """``(disallow_prefixes, crawl_delay_ms)`` for ``user_agent``.

    Group selection per RFC 9309 §2.2.1: split into groups of
    consecutive ``User-agent`` lines followed by their rules; the
    applicable group is the one whose agent token is the LONGEST
    case-insensitive substring of ``user_agent``; groups for ``*``
    apply only when no specific group matched. Empty ``Disallow:``
    values are allow-all no-ops; ``Crawl-delay`` may be fractional
    seconds. Unknown directives are ignored.
    """
    groups: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_delay: float | None = None
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
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(val)
        elif key == "disallow":
            in_rules = True
            if val:
                cur_dis.append(val)
        elif key == "crawl-delay":
            in_rules = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        elif key in ("allow", "sitemap"):
            in_rules = True  # recognized rule lines end a UA run
    flush()

    ua_low = user_agent.lower()
    best_len = -1
    best: "tuple | None" = None
    star: "tuple | None" = None
    for agents, dis, delay in groups:
        for a in agents:
            a_low = a.strip().lower()
            if a_low == "*":
                if star is None:
                    star = (dis, delay)
            elif a_low and a_low in ua_low and len(a_low) > best_len:
                best_len, best = len(a_low), (dis, delay)
    chosen = best if best is not None else star
    if chosen is None:
        return [], default_delay_ms
    dis, delay = chosen
    delay_ms = default_delay_ms if delay is None else int(round(delay * 1000))
    return list(dis), delay_ms


def render_robots_txt(
    disallow_prefixes: "list[str]", crawl_delay_ms: "int | None" = None,
    user_agent: str = "*",
) -> str:
    """Inverse of :func:`parse_robots_txt` for one group — loopback
    server + round-trip tests."""
    lines = [f"User-agent: {user_agent}"]
    for p in disallow_prefixes:
        lines.append(f"Disallow: {p}")
    if crawl_delay_ms is not None:
        d = crawl_delay_ms / 1000.0
        lines.append(
            f"Crawl-delay: {int(d) if d == int(d) else d}"
        )
    return "\n".join(lines) + "\n"


class RobotsFetchStage:
    """Actor-pool stage: batch of (host) rows → robots table rows via
    one ``GET /robots.txt`` per host over a persistent transport
    session (built once per actor). 404/garbage/timeout ⇒ allow-all +
    default delay, row-locally."""

    def __init__(
        self,
        base_url: "str | None" = None,
        user_agent: str = "*",
        default_delay_ms: int = 1000,
        timeout_s: float = 5.0,
        transport_factory=None,
    ):
        from ..stages.transport import HTTPTransport

        self.base_url = base_url.rstrip("/") if base_url else None
        self.user_agent = user_agent
        self.default_delay_ms = default_delay_ms
        self.transport = (
            transport_factory() if transport_factory is not None
            else HTTPTransport(timeout_s=timeout_s)
        )

    def _url(self, host: str) -> str:
        if self.base_url is not None:
            return f"{self.base_url}/{host}/robots.txt"
        return f"http://{host}/robots.txt"

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_pylist()
        dis_out, delay_out = [], []
        for h in hosts:
            dis, delay = [], self.default_delay_ms
            try:
                resp = self.transport.get(self._url(h))
                if resp.status == 200 and resp.body is not None:
                    dis, delay = parse_robots_txt(
                        resp.body.decode("utf-8", errors="replace"),
                        self.user_agent,
                        self.default_delay_ms,
                    )
            except (OSError, http.client.HTTPException, UnicodeError):
                pass  # unreachable ⇒ allow-all row, not a dead stage
            dis_out.append(dis)
            delay_out.append(delay)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "disallow_prefixes": pa.array(dis_out, pa.list_(pa.string())),
                "crawl_delay_ms": pa.array(delay_out, pa.int32()),
            }
        )


def fetch_robots_table(
    hosts: "pa.Table | list[str]",
    base_url: "str | None" = None,
    user_agent: str = "*",
    default_delay_ms: int = 1000,
    timeout_s: float = 5.0,
    concurrency: "int | tuple" = (1, 4),
    batch_size: int = 256,
) -> pa.Table:
    """Fetch+parse robots for every host; returns the robots TABLE the
    scheduler consumes (drop-in for the parquet input). ``hosts`` may
    be a one-column table or a plain list; the fetch fans out as an
    actor-pool Dataset stage and the (small: one row per host) result
    materializes driver-side like the parquet path it replaces."""
    import ray.data

    if isinstance(hosts, list):
        hosts = pa.table({"host": pa.array(hosts, pa.string())})
    ds = ray.data.from_arrow(hosts.select(["host"])).map_batches(
        RobotsFetchStage,
        fn_constructor_kwargs=dict(
            base_url=base_url,
            user_agent=user_agent,
            default_delay_ms=default_delay_ms,
            timeout_s=timeout_s,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    import ray

    # materialize ONCE before pulling refs: schema inference on a lazy
    # dataset runs a limit-1 probe that would re-execute the fetch and
    # hit every host's robots.txt twice
    parts = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    out = (
        pa.concat_tables(parts)
        if parts
        else ROBOTS_SCHEMA.empty_table()
    )
    return out.cast(ROBOTS_SCHEMA).sort_by("host")
