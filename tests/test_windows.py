"""Window-planner goldens, mirroring the reference suite.

(reference: test/test_range_generator.rb:9-108;
 slice golden test/embulk/input/service/test_export_service.rb:641-656;
 backfill test_export_service.rb:340-357;
 timezone test/test_timezone_validator.rb:7-23)
"""

import datetime as dt

import pytest

from embulk_input_mixpanel_spark.plans.windows import (
    Batch,
    BatchPlanner,
    ConfigError,
    generate_dates,
    slice_dates,
    validate_timezone,
    widen_for_backfill,
)

TODAY = dt.date(2015, 3, 3)


def test_exact_day_list():
    # test_range_generator.rb:21-52 golden shape
    assert generate_dates("2015-02-26", 3, today=TODAY) == [
        "2015-02-26",
        "2015-02-27",
        "2015-02-28",
    ]


def test_invalid_date_raises():
    with pytest.raises(ConfigError):
        generate_dates("not-a-date", 3, today=TODAY)


@pytest.mark.parametrize("days", [0, -1])
def test_non_positive_days_raises(days):
    with pytest.raises(ConfigError):
        generate_dates("2015-02-26", days, today=TODAY)


def test_clamp_to_today():
    # test_range_generator.rb:54-82: future days clamped off
    got = generate_dates("2015-03-02", 5, today=TODAY)
    assert got == ["2015-03-02", "2015-03-03"]


def test_future_from_date_empty():
    # test_range_generator.rb:84-108
    assert generate_dates("2015-03-04", 5, today=TODAY) == []


def test_slice_fanout_golden():
    # slice_range 2 over 2015-02-22..03-01 -> exact pairs
    # (test_export_service.rb:643-655)
    dates = generate_dates("2015-02-22", 8, today=dt.date(2015, 3, 10))
    assert slice_dates(dates, 2) == [
        ["2015-02-22", "2015-02-23"],
        ["2015-02-24", "2015-02-25"],
        ["2015-02-26", "2015-02-27"],
        ["2015-02-28", "2015-03-01"],
    ]


def test_backfill_widening_only_when_incremental_resume():
    # base_service.rb:109-115: widen only when HWM exists + incremental col
    assert widen_for_backfill("2015-03-10", 10, 0, True, 5, "seq") == ("2015-03-10", 10)
    assert widen_for_backfill("2015-03-10", 10, 123, False, 5, "seq") == ("2015-03-10", 10)
    assert widen_for_backfill("2015-03-10", 10, 123, True, 5, None) == ("2015-03-10", 10)
    assert widen_for_backfill("2015-03-10", 10, 123, True, 5, "seq") == ("2015-03-05", 15)


def test_timezone_validation():
    validate_timezone("Asia/Tokyo")
    with pytest.raises(ConfigError):
        validate_timezone("Not/AZone")


def test_batch_planner_covers_range_exactly():
    p = BatchPlanner(hwm=100, upper_bound=1000, slice_size=250)
    assert p.batches == [
        Batch(0, 100, 350),
        Batch(1, 350, 600),
        Batch(2, 600, 850),
        Batch(3, 850, 1000),
    ]


def test_batch_planner_backfill_overlap():
    p = BatchPlanner(hwm=100, upper_bound=300, slice_size=250, backfill=50)
    assert p.batches[0].lo == 50


def test_upper_bound_must_exceed_hwm():
    # validation parity: export_service.rb:28-30
    with pytest.raises(ConfigError):
        BatchPlanner(hwm=100, upper_bound=100, slice_size=10)
