"""Timezone / epoch conversion with the reference's DST edge semantics.

The reference adjusts epochs by the project timezone's UTC offset *at that
local time* and has two documented DST-gap behaviors:

- export path: a local time inside the spring-forward gap is DROPPED and
  counted (reference: lib/embulk/input/service/base_service.rb:43-51;
  drop+count export_service.rb:124-126) — F1;
- JQL path: the same gap SHIFTS forward by an hour instead — F2
  (lib/embulk/input/service/jql_service.rb:151-169).

Plain offset arithmetic is native Spark (``from_utc_timestamp`` family),
but gap *detection* needs a real tz database lookup per value, so the two
semantics are implemented as a vectorized pandas UDF over Arrow batches
(zoneinfo; no per-row Python round trips — one call per 10k-row batch).
ms->s epoch conversion (F3, jql_service.rb:204-234) is a pure column op.
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["ms_to_s", "epoch_local_adjust", "DROP", "SHIFT"]

DROP = "drop"    # export semantics: gap rows -> NULL (caller filters+counts)
SHIFT = "shift"  # JQL semantics: gap rows -> +1h


def ms_to_s(col: str | Column) -> Column:
    """Epoch ms -> s, only for positive values (F3 parity: value > 0)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c > 0, (c / 1000).cast("long")).otherwise(c)


def _gap_aware_offset(tz_name: str, mode: str):
    tz = ZoneInfo(tz_name)

    def batch(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            if v is None or pd.isna(v):
                out.append(None)
                continue
            naive = dt.datetime.utcfromtimestamp(int(v))
            # interpret the naive wall-clock in tz; detect the DST gap by
            # round-tripping: a time in the gap does not survive
            local = naive.replace(tzinfo=tz)
            rt = local.astimezone(ZoneInfo("UTC")).astimezone(tz).replace(tzinfo=None)
            if rt != naive:
                if mode == DROP:
                    out.append(None)
                    continue
                local = (naive + dt.timedelta(hours=1)).replace(tzinfo=tz)
            out.append(int(local.astimezone(ZoneInfo("UTC")).timestamp()))
        return pd.Series(out, dtype="object")

    return batch


def epoch_local_adjust(col: str | Column, tz_name: str, mode: str = DROP) -> Column:
    """Interpret epoch seconds as tz-local wall clock -> true UTC epoch.

    mode=DROP: DST-gap values become NULL (export drop+count semantics).
    mode=SHIFT: DST-gap values shift +1h (JQL semantics).
    """
    if mode not in (DROP, SHIFT):
        raise ValueError(f"mode must be {DROP!r} or {SHIFT!r}")
    udf = pandas_udf(_gap_aware_offset(tz_name, mode), T.LongType())
    c = F.col(col) if isinstance(col, str) else col
    return udf(c)
