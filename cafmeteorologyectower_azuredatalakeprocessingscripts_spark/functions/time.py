"""Calendar functions: water year, day floor/ceil.

Reference semantics:
- water year (Oct 1 - Sep 30 label): month >= 10 -> year + 1, else year
  (src/AzureDataLakeAccess.py:282-289; first/last helpers :324-332).
- day floor/ceil pad a series to midnight boundaries
  (src/AzureDataLakeAccess.py:57 — pandas ``floor('D')`` / ``ceil('D')``;
  ceil leaves exact midnight unchanged).

All implemented as native Column expressions — no UDFs, fully
Catalyst-optimizable (constant folding, pushdown through them is fine).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


def water_year(c: Column | str) -> Column:
    """Water-year label of a date/timestamp column (int)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.when(F.month(c) >= 10, F.year(c) + 1).otherwise(F.year(c))


def water_year_of(d: datetime.date) -> int:
    """Driver-side water year of a python date."""
    return d.year + 1 if d.month >= 10 else d.year


def first_date_of_water_year(wy: int) -> datetime.date:
    """Oct 1 of the prior calendar year (src/AzureDataLakeAccess.py:329-332)."""
    return datetime.date(wy - 1, 10, 1)


def last_date_of_water_year(wy: int) -> datetime.date:
    """Sep 30 of the water year (src/AzureDataLakeAccess.py:324-327)."""
    return datetime.date(wy, 9, 30)


def day_floor(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.date_trunc("DAY", c)


def day_ceil(c: Column | str) -> Column:
    """Midnight stays; anything past midnight rounds up to next midnight."""
    c = F.col(c) if isinstance(c, str) else c
    floored = F.date_trunc("DAY", c)
    return F.when(c == floored, c).otherwise(floored + F.expr("INTERVAL 1 DAY"))
