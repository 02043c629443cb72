"""Window descriptors for temporal aggregations.

Mirrors the reference's window behaviors — ``NoWindow | Since | Sliding``
(reference: crates/sparrow-instructions/src/aggregation_args.rs:9-18) and
calendar tick conditions (crates/sparrow-compiler/src/functions/window.rs:18-47)
— as plain Python descriptors the Timeline compiler lowers onto Spark
window specs.

Semantics (from reference e2e tests, windowed_aggregation_tests.rs):

- ``Since(cond)``: the aggregate covers rows since the last time ``cond``
  was true. A row where ``cond`` fires belongs to the *closing* window
  (the value at that row includes it); the reset applies to later rows.
- ``Sliding(n, cond)``: aggregate over the last ``n`` windows demarcated
  by ``cond`` firings, where the current (partial) window counts as one.
  This is a count-based window over condition firings, not a time-based
  one (reference: two-stacks algorithm,
  crates/sparrow-instructions/src/evaluators/aggregation/two_stacks.rs:24-38).

Tick conditions (``minutely() … yearly()``) are represented as the
``Tick`` descriptor; in batch mode they lower to calendar-bucket
partitioning (`date_trunc`), in streaming to state resets at boundaries.

Boundary fine print: the DSL's `date_trunc` lowering assigns an event
at exactly a boundary to the NEW window. The reference instead orders
ticks after coincident events, so such an event belongs to the CLOSING
window (tick subsort sentinel, operation/tick.rs:33-60). The
reference-exact behavior is available through `operators/tick.with_ticks`
+ `Since(F.col(TICK_COL))` (what q_tick_daily does) and is what the
Fenl frontend compiles to; the two differ only for events landing on a
boundary to the nanosecond.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

from pyspark.sql import Column

#: calendar tick unit -> Spark date_trunc unit
TICK_UNITS = {
    "minutely": "minute",
    "hourly": "hour",
    "daily": "day",
    "monthly": "month",
    "yearly": "year",
}


@dataclass(frozen=True)
class Tick:
    """A periodic calendar condition: fires at every unit boundary."""

    unit: str  # one of TICK_UNITS keys

    def __post_init__(self) -> None:
        if self.unit not in TICK_UNITS:
            raise ValueError(f"unknown tick unit {self.unit!r}")

    @property
    def trunc_unit(self) -> str:
        return TICK_UNITS[self.unit]


def minutely() -> Tick:
    return Tick("minutely")


def hourly() -> Tick:
    return Tick("hourly")


def daily() -> Tick:
    return Tick("daily")


def monthly() -> Tick:
    return Tick("monthly")


def yearly() -> Tick:
    return Tick("yearly")


Condition = Union[Column, Tick]


@dataclass(frozen=True)
class Since:
    """Aggregate since the last time ``condition`` was true."""

    condition: Condition


@dataclass(frozen=True)
class Sliding:
    """Aggregate over the last ``n`` condition-demarcated windows.

    ``condition=None`` declares the every-row window (each row closes
    its own window — `sliding(n, is_valid(Input))`-style rolling
    last-n-rows): semantically identical to ``F.lit(True)`` but lowered
    as ONE frame-bounded window pass instead of the generic
    per-window-id decomposition, which degenerates to a group per row
    for this shape (measured 8x at sf0.1)."""

    n: int
    condition: Optional[Condition]

    def __post_init__(self) -> None:
        if self.n < 1:
            raise ValueError("sliding window requires n >= 1")


WindowSpec = Union[None, Since, Sliding]
