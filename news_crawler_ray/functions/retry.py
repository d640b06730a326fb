"""Bounded retry with exponential backoff + deterministic jitter (T5).

The reference DEFINES this policy but never applies it
(/root/reference/src/secbot/utils/retry.py:29-77: 5 attempts, 1 s
initial delay, ×2 backoff, ±20 % jitter); here it actually wraps the
fetch actors' transient IO (shard reads), so a flaky read becomes a
retried read instead of a ``fetch_status="error"`` row. Jitter comes
from a seeded RNG — deterministic tests, no wall clock in decisions.
"""

from __future__ import annotations

import functools
import time

import numpy as np


class RetriesExhausted(RuntimeError):
    def __init__(self, attempts: int, last: BaseException):
        super().__init__(f"gave up after {attempts} attempts: {last!r}")
        self.attempts = attempts
        self.last = last


def with_retry(
    fn=None,
    *,
    attempts: int = 5,
    initial_delay_s: float = 1.0,
    backoff: float = 2.0,
    jitter: float = 0.2,
    retryable: tuple[type[BaseException], ...] = (OSError, IOError),
    sleep=time.sleep,
    seed: int = 0,
):
    """Decorator/wrapper: retry ``fn`` on ``retryable`` exceptions.

    Delay before attempt ``i`` (1-based, after the first failure) is
    ``initial_delay_s * backoff**(i-1) * (1 ± jitter)``. Non-retryable
    exceptions propagate immediately; exhausting attempts raises
    :class:`RetriesExhausted` chaining the last error.
    """

    def deco(f):
        @functools.wraps(f)
        def wrapped(*args, **kwargs):
            rng = np.random.default_rng(seed)
            delay = initial_delay_s
            last: BaseException | None = None
            for attempt in range(attempts):
                try:
                    return f(*args, **kwargs)
                except retryable as e:
                    last = e
                    if attempt == attempts - 1:
                        raise RetriesExhausted(attempts, e) from e
                    factor = 1.0 + jitter * (2.0 * rng.random() - 1.0)
                    sleep(delay * factor)
                    delay *= backoff
            raise RetriesExhausted(attempts, last)  # pragma: no cover

        return wrapped

    return deco if fn is None else deco(fn)
