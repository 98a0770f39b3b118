"""Window / micro-batch planning.

The reference plans ingest as an ordered ledger of calendar-day partitions
(reference: lib/range_generator.rb:12-16,47-61), sliced into micro-batches of
``slice_range`` days (lib/embulk/input/service/export_service.rb:83), with a
backfill widening of the start when resuming incrementally
(lib/embulk/input/service/base_service.rb:109-115) and an upper bound locked
at job start so in-flight writes are excluded
(lib/embulk/input/service/export_service.rb:239-243).

Here the same semantics are expressed twice:

- :func:`generate_dates` / :func:`slice_dates` — the calendar-day form, kept
  for parity with the reference's goldens (test/test_range_generator.rb).
- :class:`BatchPlanner` — the engine's native form: the ledger is over the
  change-stream's monotone ``event_seq`` (the LSN analog) instead of days.
  Plans are pure driver-side metadata; per-batch cost is O(1) regardless of
  table size, so planning never becomes a scale bottleneck.
"""

from __future__ import annotations

import datetime as dt
import logging
import math
from dataclasses import dataclass, field
from zoneinfo import ZoneInfo

logger = logging.getLogger(__name__)

__all__ = [
    "ConfigError",
    "validate_timezone",
    "today_in_tz",
    "generate_dates",
    "slice_dates",
    "widen_for_backfill",
    "Batch",
    "BatchPlanner",
]


class ConfigError(ValueError):
    """Invalid user configuration (reference raises Embulk::ConfigError)."""


def validate_timezone(tz: str) -> ZoneInfo:
    """Reject unknown timezones at config time.

    (reference: lib/timezone_validator.rb:6-14)
    """
    try:
        return ZoneInfo(tz)
    except Exception as exc:  # noqa: BLE001 - any failure is a config error
        raise ConfigError(f"timezone '{tz}' is invalid") from exc


def today_in_tz(tz: str | None) -> dt.date:
    """Timezone-aware 'today', falling back to the system date.

    (reference: lib/embulk/input/service/base_service.rb:53-60)
    """
    if tz:
        try:
            return dt.datetime.now(ZoneInfo(tz)).date()
        except Exception:  # noqa: BLE001
            pass
    return dt.date.today()


def _parse_date(value: str) -> dt.date:
    try:
        return dt.date.fromisoformat(str(value))
    except ValueError as exc:
        raise ConfigError(f"from_date '{value}' is not a valid date") from exc


def generate_dates(
    from_date: str,
    fetch_days: int | None,
    today: dt.date | None = None,
    tz: str | None = None,
) -> list[str]:
    """Inclusive, ascending day ledger with future-day clamping.

    Mirrors the reference goldens exactly (lib/range_generator.rb:47-73;
    test/test_range_generator.rb:21-108):

    - invalid date or non-positive fetch_days -> ConfigError
    - fetch_days None -> through yesterday-ish default handled by caller
    - days beyond *today* are clamped off with a warning
    - from_date entirely in the future -> empty ledger + warning
    """
    start = _parse_date(from_date)
    if fetch_days is not None and fetch_days <= 0:
        raise ConfigError(f"fetch_days {fetch_days} must be positive")
    today = today or today_in_tz(tz)

    if start > today:
        logger.warning("from_date %s is in the future; nothing to fetch", from_date)
        return []

    end = start + dt.timedelta(days=fetch_days - 1) if fetch_days is not None else today
    if end > today:
        logger.warning(
            "clamping window end %s to today %s (future days not yet available)",
            end,
            today,
        )
        end = today
    n = (end - start).days + 1
    return [(start + dt.timedelta(days=i)).isoformat() for i in range(n)]


def slice_dates(dates: list[str], slice_range: int) -> list[list[str]]:
    """Split the ledger into micro-batches of ``slice_range`` days.

    (reference: export_service.rb:83 `each_slice`; golden
    test_export_service.rb:641-656 — slice_range 2 over 2015-02-22..03-01)
    """
    if slice_range <= 0:
        raise ConfigError(f"slice_range {slice_range} must be positive")
    return [dates[i : i + slice_range] for i in range(0, len(dates), slice_range)]


def widen_for_backfill(
    from_date: str,
    fetch_days: int | None,
    latest_fetched_time: int,
    incremental: bool,
    back_fill_days: int = 5,
    incremental_column: str | None = None,
) -> tuple[str, int | None]:
    """Backfill widening on incremental resume.

    Only when an incremental column is configured AND a previous run
    checkpointed a high-water mark: start moves back ``back_fill_days`` and
    the window grows by the same amount, so a lateness horizon is re-read;
    dedup makes the overlap idempotent.
    (reference: base_service.rb:109-115; test_export_service.rb:340-357)
    """
    if not (incremental and incremental_column and latest_fetched_time):
        return from_date, fetch_days
    start = _parse_date(from_date) - dt.timedelta(days=back_fill_days)
    days = fetch_days + back_fill_days if fetch_days is not None else None
    return start.isoformat(), days


@dataclass(frozen=True)
class Batch:
    """Half-open window over the change stream: lo < event_seq <= hi."""

    index: int
    lo: int  # exclusive (the HWM going in)
    hi: int  # inclusive

    @property
    def size(self) -> int:
        return self.hi - self.lo


@dataclass
class BatchPlanner:
    """Plan micro-batches over the monotone event_seq axis.

    - ``hwm`` — resume point: everything <= hwm is already committed
      (reference checkpoint: export_service.rb:59-65).
    - ``upper_bound`` — locked at plan time; events with
      seq > upper_bound are deferred to the next run, the analog of
      `job_start_time - delay` excluding in-flight commits
      (reference: export_service.rb:239-243). Validated > hwm just like
      the reference (export_service.rb:28-30).
    - ``slice_size`` — events per micro-batch (the `slice_range` analog);
      bounds memory / failure blast radius per commit.
    - ``backfill`` — extra overlap re-read below the HWM each run
      (lateness horizon); idempotent because apply dedups on event_id.
    """

    hwm: int
    upper_bound: int
    slice_size: int
    backfill: int = 0
    batches: list[Batch] = field(init=False)

    def __post_init__(self) -> None:
        if self.slice_size <= 0:
            raise ConfigError(f"slice_size {self.slice_size} must be positive")
        if self.upper_bound <= self.hwm:
            raise ConfigError(
                f"upper_bound {self.upper_bound} must exceed hwm {self.hwm}; "
                "lower the delay or wait for new events"
            )
        lo = max(self.hwm - self.backfill, 0) if self.backfill else self.hwm
        n = math.ceil((self.upper_bound - lo) / self.slice_size)
        self.batches = [
            Batch(i, lo + i * self.slice_size, min(lo + (i + 1) * self.slice_size, self.upper_bound))
            for i in range(n)
        ]

    def __iter__(self):
        return iter(self.batches)

    def __len__(self) -> int:
        return len(self.batches)
