"""Alias: the pure-Python crawl oracle lives in ``testing.oracle``."""

from ..testing.oracle import OracleResult, canonicalize_url, crawl_oracle  # noqa: F401
