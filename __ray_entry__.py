"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Worker import note: Ray worker processes resolve ``news_crawler_ray`` via
their own environment (raylet cwd or PYTHONPATH captured at ray.init) —
the driver's post-init ``sys.path`` edits do NOT propagate. Running with
cwd=/root/repo (the normal driver setup) or ``PYTHONPATH=/root/repo``
both work.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from news_crawler_ray.context import configure  # noqa: E402
from news_crawler_ray.pipelines.queries import build_oracle_sql, build_queries  # noqa: E402


def entry() -> Any:
    """Flagship pipeline: the north-rule multi-wave frontier crawl over
    the synthetic image+caption page-store (BASELINE.json input_hint).

    Deterministic (seeded fixtures), returns the fetched-pages Dataset
    with stable schema (url, host, wave, crawl_rank, fetch_status,
    image_id).
    """
    configure()
    return build_queries()["crawl_flagship"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 +
    the training-data ops (dedup / similarity / text / multimodal)."""
    configure()
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every query: real SQL over the sf views where
    the operator is SQL-expressible; for LSH / crawl / decode pipelines,
    an INDEPENDENT sequential Python oracle (pipelines/expected.py —
    brute-force buckets, pure-Python crawl loop) rendered as inline
    VALUES so the driver still gets a rows+schema+hash comparison."""
    return build_oracle_sql("/root/testdata/sf0.01")
