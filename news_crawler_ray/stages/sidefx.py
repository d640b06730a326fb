"""Side-effect sinks + digest renderers (SURVEY.md §2.6 K1-K5).

* :class:`IpsetPayloadDatasink` — K3 (ref
  /root/reference/src/secbot/defense/ipset.py:93-122): a custom Ray Data
  ``Datasink`` whose write tasks emit idempotent ``ipset restore``
  command payload files (one ``add <set> <ip>`` line per row), plus a
  ``00-create`` payload mirroring ``ensure_set`` (ipset.py:76-90).
  Feeding the files to ``ipset restore -!`` is the driver-side
  subprocess step, exactly as SMTP sending is — the engine's job ends at
  the byte-exact payload.
* :func:`write_rules_file` — K4 text analog (ref suricata.py:139-206):
  merge-don't-rewrite Suricata rules file; existing lines keep their
  SIDs verbatim, new IPs append with ``sid = BASE + 1-based position``.
* :func:`render_digest_sections` — K1/K2 (ref mailer/gmail.py:186-306,
  mailer/naverMail.py:59-116): assemble the three digest messages
  (news, advisories, IOC) as data; the SMTP socket stays out of the
  dataflow (SURVEY.md §2.6).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import pyarrow as pa
import ray.data

from ..functions.formatters import parse_ip_rule_lines, validate_ips


class IpsetPayloadDatasink(ray.data.Datasink):
    """Distributed side-effect sink: one restore-payload file per write
    task, named by task index so re-running a failed write overwrites
    its own file (idempotent) instead of duplicating commands."""

    def __init__(self, out_dir: str, set_name: str = "secbot_bad_ips", ip_col: str = "value"):
        self.out_dir = out_dir
        self.set_name = set_name
        self.ip_col = ip_col

    def on_write_start(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        create = os.path.join(self.out_dir, "00-create.txt")
        tmp = create + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"create {self.set_name} hash:ip timeout 0 -exist\n")
        os.replace(tmp, create)

    def write(self, blocks, ctx) -> int:
        n = 0
        lines: list[str] = []
        for block in blocks:
            tbl = pa.table(block) if not isinstance(block, pa.Table) else block
            for ip in tbl[self.ip_col].to_pylist():
                if ip:
                    lines.append(f"add {self.set_name} {ip.strip()}")
                    n += 1
        path = os.path.join(self.out_dir, f"payload-{ctx.task_idx:05d}.txt")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(tmp, path)  # atomic publish per task
        return n

    @property
    def supports_distributed_writes(self) -> bool:
        return True


def write_ipset_payloads(
    ds: "ray.data.Dataset", out_dir: str, set_name: str = "secbot_bad_ips",
    ip_col: str = "value",
) -> str:
    ds.write_datasink(IpsetPayloadDatasink(out_dir, set_name, ip_col))
    return out_dir


def read_ipset_payload(out_dir: str) -> str:
    """Assemble the full restore payload (driver-side, for the subprocess
    step / tests): create line first, then every task's add lines."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".txt"):
            with open(os.path.join(out_dir, name)) as f:
                parts.append(f.read().rstrip("\n"))
    return "\n".join(p for p in parts if p)


def write_rules_file(
    new_ips: Iterable[str],
    path: str,
    base_sid: int = 7000000,
    reload_hook=None,
) -> int:
    """Merge IPs into a Suricata rules file, reference semantics
    (suricata.py:139-206): existing ``drop ip`` lines (``<>`` or ``->``
    forms) keep their order and SIDs; new normalized IPs append with
    ``sid = base_sid + 1-based position``; the reload hook fires once
    iff anything new was written. Atomic full-file replace (the
    reference appends in place; a kill mid-append corrupts — here the
    merge publishes via rename). Returns the total rule count.
    """
    existing_lines: list[str] = []
    existing_ips: list[str] = []
    if os.path.exists(path):
        with open(path) as f:
            existing_lines = [ln.rstrip("\n") for ln in f if ln.strip()]
        parsed = parse_ip_rule_lines(pa.array(existing_lines, pa.string()))
        for ip in parsed.to_pylist():
            if ip and ip not in existing_ips:
                existing_ips.append(ip)

    norm = validate_ips(pa.array([str(s) for s in new_ips], pa.string())).to_pylist()
    fresh: list[str] = []
    for ip in norm:
        if ip and ip not in existing_ips and ip not in fresh:
            fresh.append(ip)

    if fresh:
        start = len(existing_ips) + 1  # 1-based, reference suricata.py:178-181
        new_lines = [
            f'drop ip {ip} any <> any any (msg:"SecBot malicious IP {ip}"; '
            f"sid:{base_sid + start + i}; rev:1;)"
            for i, ip in enumerate(fresh)
        ]
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(existing_lines + new_lines) + "\n")
        os.replace(tmp, path)
        if reload_hook is not None:
            reload_hook()
    return len(existing_ips) + len(fresh)


def write_hash_list_file(
    hashes: Iterable[str],
    list_path: str,
    rules_path: str,
    base_sid: int = 7200000,
    reload_hook=None,
) -> int:
    """K6 (ref suricata_hash.py:49-89): overwrite the hash-list file
    with the distinct sorted lowercase hashes, append the single
    ``filemd5`` rule iff not already present, fire the reload hook.
    Returns the hash count.
    """
    uniq = sorted({str(h).strip().lower() for h in hashes if str(h).strip()})
    tmp = list_path + ".tmp"
    with open(tmp, "w") as f:
        for h in uniq:
            f.write(h + "\n")
    os.replace(tmp, list_path)

    rule_line = (
        'drop http any any -> any any (msg:"SecBot malicious file download"; '
        f"flow:established; filemd5:{os.path.basename(list_path)}; "
        f"sid:{base_sid}; rev:1;)"
    )
    existing = ""
    if os.path.exists(rules_path):
        with open(rules_path) as f:
            existing = f.read()
    if rule_line not in existing:
        rtmp = rules_path + ".tmp"
        with open(rtmp, "w") as f:
            f.write(existing + rule_line + "\n")
        os.replace(rtmp, rules_path)
    if reload_hook is not None:
        reload_hook()
    return len(uniq)


def render_digest_sections(
    news_rows: list[dict],
    advisory_rows: list[dict],
    ioc_rows: list[dict],
    date_str: str,
    customer_to: list[str] | None = None,
    team_to: list[str] | None = None,
    style: str = "gmail",
) -> list[dict]:
    """Assemble the three digest messages as data (K1; ``style="naver"``
    gives the K2 variant's plainer body, naverMail.py:60-116).

    Returns ``[{"subject", "to", "body"}, ...]`` — news to customer+team,
    advisories (only if any) to customer+team, IOCs team-only, matching
    gmail.py:186-223's routing.
    """
    customer_to = customer_to or ["customer@example.com"]
    team_to = team_to or ["team@example.com"]

    def md(r):  # news.py:79-82 to_md
        return f"- [{r['title']}]({r['link']})"

    def naver_line(r):  # naverMail.py:68
        return f"- {r['title']}: {r['link']}"

    def section_body(header: str, rows: list[dict]) -> str:
        if style == "naver":
            return "\n\n".join(naver_line(r) for r in rows)
        lines = [f"🛡️  {header} – {date_str}", "=" * 50, f"\n[ {header} ]"]
        lines.extend(md(r) for r in rows)
        lines.append("\n— Sent automatically by 관제공화국\n")
        return "\n".join(lines)

    def ioc_body() -> str:
        by_kind: dict[str, list[str]] = {"ip": [], "hash": [], "url": []}
        for r in ioc_rows:
            by_kind.setdefault(r["kind"], []).append(r["value"])
        if style == "naver":
            return "\n\n".join(
                f"- {v}" for k in ("ip", "hash", "url") for v in sorted(by_kind[k])
            )
        lines = [f"🛡️  ASEC IOC – {date_str}", "=" * 50, "\n[ ASEC IOC ]"]
        for kind, label in (("ip", "IP"), ("hash", "HASH"), ("url", "URL")):
            vals = sorted(by_kind[kind])
            lines.append(f"- {label} ({len(vals)}):")
            lines.extend(f"    - {v}" for v in vals)
        lines.append("\n— Sent automatically by 관제공화국\n")
        return "\n".join(lines)

    msgs: list[dict] = []
    for to in (customer_to, team_to):
        msgs.append(
            {
                "subject": f"[관제공화국] 보안정보뉴스 {date_str}",
                "to": list(to),
                "body": section_body("보안뉴스", news_rows),
            }
        )
    if advisory_rows:
        for to in (customer_to, team_to):
            msgs.append(
                {
                    "subject": f"[관제공화국] KISA 보안공지 {date_str}",
                    "to": list(to),
                    "body": section_body("KISA 보안공지", advisory_rows),
                }
            )
    msgs.append(
        {
            "subject": f"[관제공화국] ASEC IOC {date_str}",
            "to": list(team_to),
            "body": ioc_body(),
        }
    )
    return msgs
