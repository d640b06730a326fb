"""Env-var config layer: ``NC_*`` overrides for :class:`CrawlConfig`.

The reference's extension surface is a pydantic ``Settings`` class whose
every field reads a ``SEC_BOT_*`` environment variable
(/root/reference/src/secbot/config.py:33-177) — ``ray job submit`` users
configure the same way (``--runtime-env`` env vars, no code edits). This
module is that surface for the engine, derived straight from the
``CrawlConfig`` dataclass so a new config field is env-overridable the
moment it is declared — no parallel schema to keep in sync.

Precedence (tested in tests/test_cli.py): **CLI flag > ``NC_*`` env var
> dataclass default.** The CLI realises this by seeding its argparse
defaults from :func:`env_default` (an explicit flag then wins over env),
and ``_run_crawl_once`` layers :func:`crawl_config_env_overrides` under
the CLI-mapped kwargs.

Naming: field ``max_waves`` ← ``NC_MAX_WAVES`` (upper-cased field name
behind the ``NC_`` prefix). Coercion is driven by the dataclass field
annotation (stringified under ``from __future__ import annotations``):

* ``int`` / ``float``            → ``int(raw)`` / ``float(raw)``
* ``bool``                       → 1/0, true/false, yes/no, on/off
* ``str``                        → verbatim
* ``int | None`` / ``str | None``→ the non-None arm (empty string → None)
* ``int | tuple | str``          → ``"4"`` → 4, ``"1,8"`` → (1, 8),
                                   else verbatim (``"auto"``)

An unknown ``NC_*`` name or an uncoercible value raises ``ValueError``
loudly at startup — a typo'd env var silently ignored is a
misconfigured crawl discovered hours later.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Mapping

ENV_PREFIX = "NC_"

# NC_-prefixed env vars that are NOT CrawlConfig fields (debug/trace
# switches read directly where they act) — exempt from the typo guard.
RESERVED_ENV = frozenset({"NC_CRAWL_TRACE", "NC_CRAWL_STATS"})

_TRUE = frozenset({"1", "true", "yes", "on"})
_FALSE = frozenset({"0", "false", "no", "off"})


def _coerce_bool(raw: str, key: str) -> bool:
    low = raw.strip().lower()
    if low in _TRUE:
        return True
    if low in _FALSE:
        return False
    raise ValueError(
        f"{key}: expected a boolean (1/0, true/false, yes/no, on/off), "
        f"got {raw!r}"
    )


def _coerce(raw: str, ftype: str, key: str) -> Any:
    """Coerce one env-var string by the dataclass field annotation."""
    ftype = ftype.replace(" ", "")
    if ftype == "int":
        return int(raw)
    if ftype == "float":
        return float(raw)
    if ftype == "bool":
        return _coerce_bool(raw, key)
    if ftype == "str":
        return raw
    if ftype in ("int|None", "Optional[int]"):
        return None if raw.strip() == "" else int(raw)
    if ftype in ("str|None", "Optional[str]"):
        return None if raw.strip() == "" else raw
    if ftype == "int|tuple|str":
        s = raw.strip()
        if "," in s:
            return tuple(int(x) for x in s.split(",") if x.strip())
        try:
            return int(s)
        except ValueError:
            return s  # e.g. "auto"
    raise ValueError(f"{key}: no env coercion for field type {ftype!r}")


def crawl_config_env_overrides(
    environ: "Mapping[str, str] | None" = None,
) -> dict[str, Any]:
    """``{field: value}`` for every ``CrawlConfig`` field with an
    ``NC_<FIELD>`` env var set. Unknown ``NC_*`` names raise (typo
    guard); names owned by other layers (``NC_CLI_*``, see
    :func:`env_default`) are skipped."""
    from .pipelines.crawl import CrawlConfig

    env = os.environ if environ is None else environ
    fields = {f.name: f for f in dataclasses.fields(CrawlConfig)}
    out: dict[str, Any] = {}
    unknown = []
    for key, raw in env.items():
        if not key.startswith(ENV_PREFIX) or key in RESERVED_ENV:
            continue
        name = key[len(ENV_PREFIX):].lower()
        f = fields.get(name)
        if f is None:
            unknown.append(key)
            continue
        out[f.name] = _coerce(raw, str(f.type), key)
    if unknown:
        known = ", ".join(ENV_PREFIX + n.upper() for n in sorted(fields))
        raise ValueError(
            f"unknown config env var(s) {sorted(unknown)}; known: {known}"
        )
    return out


def env_default(
    field: str,
    fallback: Any,
    environ: "Mapping[str, str] | None" = None,
) -> Any:
    """Argparse-default helper: the ``NC_<FIELD>`` value if set, else
    ``fallback`` — seeding a CLI flag's default with this makes the
    precedence CLI > env > default fall out of argparse itself.
    Coercion follows the matching ``CrawlConfig`` field annotation when
    one exists, else the fallback's own type."""
    from .pipelines.crawl import CrawlConfig

    env = os.environ if environ is None else environ
    key = ENV_PREFIX + field.upper()
    raw = env.get(key)
    if raw is None:
        return fallback
    fields = {f.name: f for f in dataclasses.fields(CrawlConfig)}
    f = fields.get(field)
    if f is not None:
        return _coerce(raw, str(f.type), key)
    if isinstance(fallback, bool):
        return _coerce_bool(raw, key)
    if isinstance(fallback, int):
        return int(raw)
    if isinstance(fallback, float):
        return float(raw)
    return raw
