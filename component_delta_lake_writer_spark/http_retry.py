"""HTTP retry helper (X4; reference src/storage_api_client.py:18-30).

The reference wraps its Storage API calls in 3 attempts with linear
backoff (sleep attempt+1 seconds), re-raising the last error. Kept as
a generic callable wrapper for any HTTP sidecar the engine grows."""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def with_retries(
    fn: Callable[[], T],
    attempts: int = 3,
    backoff: Callable[[int], float] = lambda attempt: attempt + 1,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``fn`` up to ``attempts`` times; linear backoff between
    tries (src/storage_api_client.py:24-29); re-raise the last error."""
    if attempts < 1:
        raise ValueError(f"attempts must be >= 1, got {attempts}")
    last: Exception | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — mirror reference behavior
            last = exc
            if attempt < attempts - 1:
                sleep(backoff(attempt))
    assert last is not None
    raise last
