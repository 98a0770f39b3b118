"""Driver-side retry with exponential backoff.

The reference wraps every remote call in PerfectRetry with
``sleep = initial_wait * (2 * (n - 1))`` and limit 5
(reference: lib/embulk/input/service/base_service.rb:83-99), and maps error
classes to retryable/fatal (4xx config errors never retry,
lib/embulk/input/mixpanel_api/client.rb:115-131 via tests).

In the Spark engine, *executor-side* faults are already retried by the
scheduler (spark.task.maxFailures); this decorator covers the *driver-side*
unit of work — a whole batch commit — which is safe to retry because the
snapshot commit is atomic (a failed attempt left no visible state).
"""

from __future__ import annotations

import functools
import logging
import time
from collections.abc import Callable
from typing import TypeVar

logger = logging.getLogger(__name__)

R = TypeVar("R")

__all__ = ["with_retry", "FatalError"]


class FatalError(Exception):
    """Non-retryable (the 4xx ConfigError analog)."""


def with_retry(
    limit: int = 5,
    initial_wait: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Callable[[Callable[..., R]], Callable[..., R]]:
    def deco(fn: Callable[..., R]) -> Callable[..., R]:
        @functools.wraps(fn)
        def wrapped(*args, **kwargs) -> R:
            attempt = 0
            while True:
                try:
                    return fn(*args, **kwargs)
                except FatalError:
                    raise
                except Exception:  # noqa: BLE001
                    attempt += 1
                    if attempt > limit:
                        raise
                    wait = initial_wait * (2 * attempt - 1)
                    logger.warning("attempt %d/%d failed; retrying in %.1fs", attempt, limit, wait)
                    sleep(wait)

        return wrapped

    return deco
