"""Output formatters (SURVEY.md §2.2 M16/M17/M19, §2.5 A8-A9 sinks).

Vectorized rule-line and markdown rendering over final (small) result
tables. Stable SID assignment composes :func:`stages.index.assign_stable_ids`
with these format maps — SID = BASE + sorted position, exactly the
reference's merge-preserving rule files
(/root/reference/src/secbot/defense/suricata.py:60,182-189,
suricata_url.py:13,83-96, suricata_hash.py:63-86).
"""

from __future__ import annotations

import ipaddress
from urllib.parse import unquote, urlsplit

import pyarrow as pa
import pyarrow.compute as pc

IP_BASE_SID = 7000000
URL_BASE_SID = 7100000


def validate_ips(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Strip + refang + ``ipaddress`` parse; invalid → null (M12)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = []
    for v in arr.to_pylist():
        if v is None:
            out.append(None)
            continue
        s = v.strip().replace("[.]", ".")
        try:
            out.append(str(ipaddress.ip_address(s)))
        except ValueError:
            out.append(None)
    return pa.array(out, pa.string())


def normalize_hashes(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """strip().lower(), empty → null (M13)."""
    t = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
    return pc.if_else(pc.equal(t, ""), pa.scalar(None, pa.string()), t)


def ip_rule_lines(batch: pa.Table, ip_col: str = "value", sid_col: str = "sid") -> pa.Table:
    """IP drop-rule formatter (M16): one rule line per row."""
    ips = batch[ip_col].to_pylist()
    sids = batch[sid_col].to_pylist()
    lines = [
        f'drop ip {ip} any <> any any (msg:"SecBot blocked IP"; sid:{sid}; rev:1;)'
        for ip, sid in zip(ips, sids)
    ]
    return batch.append_column("rule", pa.array(lines, pa.string()))


def split_host_uri(url: str) -> tuple[str, str]:
    """Refang + urlsplit + unquote path → (host, uri) (M14)."""
    s = url.replace("[:]", ":").replace("[.]", ".")
    if "://" not in s:
        s = "http://" + s
    p = urlsplit(s)
    uri = unquote(p.path) or "/"
    if p.query:
        uri += f"?{p.query}"
    return (p.hostname or "", uri)


def url_rule_lines(batch: pa.Table, url_col: str = "value", sid_col: str = "sid") -> pa.Table:
    """HTTP host+uri drop-rule formatter (M17)."""
    urls = batch[url_col].to_pylist()
    sids = batch[sid_col].to_pylist()
    lines = []
    for u, sid in zip(urls, sids):
        host, uri = split_host_uri(u)
        lines.append(
            f'drop http any any -> any any (msg:"SecBot blocked URL"; '
            f'http.host; content:"{host}"; http.uri; content:"{uri}"; '
            f"sid:{sid}; rev:1;)"
        )
    return batch.append_column("rule", pa.array(lines, pa.string()))


def to_markdown_bullets(batch: pa.Table, title_col: str = "title", link_col: str = "link") -> pa.Table:
    """Markdown bullet renderer (M19): ``- [title](link)`` per row."""
    md = pc.binary_join_element_wise(
        "- [", pc.coalesce(batch[title_col], ""), "](", pc.coalesce(batch[link_col], ""), ")", ""
    )
    return batch.append_column("md", md)


def parse_ip_rule_lines(lines: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Rules-file re-reader (M18): extract the IP from ``drop ip`` lines,
    handling both ``<>`` and ``->`` direction forms; non-rules → null."""
    m = pc.extract_regex(
        lines, r"^drop ip (?P<ip>\S+) any (?:<>|->) any any"
    )
    return pc.struct_field(m, "ip")
