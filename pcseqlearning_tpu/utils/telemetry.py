"""Process-wide truncation/overflow telemetry.

Quality-affecting truncations (Pallas scan-window clips, halo-cap drops in
the sharded CC, claim-compaction overflow) were previously surfaced only as
stdout warnings; a regression that truncated 100x more windows would pass
CI. This registry accumulates the counters at the points where the host
already reads them (no extra device syncs on the hot path), and bench.py /
the fullscale harness emit a snapshot into their JSON artifacts so the
counters are pinned per round.

Counters are plain host ints. Callers inside jitted code must NOT call
``add`` with traced values — read the value to host first (every current
call site already does, because the counts gate a warning print).
"""

from __future__ import annotations

from collections import defaultdict

COUNTERS: dict[str, int] = defaultdict(int)


def add(name: str, value) -> None:
    """Accumulate ``value`` into counter ``name`` (no-op for 0/None)."""
    try:
        v = int(value)
    except (TypeError, ValueError):
        return
    if v:
        COUNTERS[name] += v


def snapshot(reset: bool = False) -> dict[str, int]:
    """Return a plain-dict copy of all counters; optionally zero them."""
    out = dict(COUNTERS)
    if reset:
        COUNTERS.clear()
    return out


def reset() -> None:
    COUNTERS.clear()
