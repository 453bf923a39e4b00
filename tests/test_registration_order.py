"""The driver's correctness gate oracles only the FIRST 50 registered
catalog entries (observed: CORRECTNESS_r02.json == registration indices
0-49 exactly; CORRECTNESS_r03.json == the round-3 reordered first 50).
Pin that every entry without a driver-green row in ANY prior round —
and every entry modified this round — sits inside that window."""

import json
import pathlib

from stock_market_data_pipeline_spark.catalog import (
    _DRIVER_WINDOW_DEFERRED,
    _DRIVER_WINDOW_FIRST,
    ORACLES,
    QUERIES,
)

REPO = pathlib.Path(__file__).resolve().parents[1]


def _last_green_round() -> dict[str, int]:
    """Per-entry newest driver round with a fully-green row, from the
    CORRECTNESS_r*.json artifacts (they ARE the persisted per-entry
    last-checked metadata — no second bookkeeping file to drift)."""
    import re

    last: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        for name, row in json.loads(path.read_text()).items():
            if (row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match") and not row.get("err")):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _driver_green() -> set[str]:
    """Union of entry names with a fully-green row across every
    CORRECTNESS_r*.json the driver has produced so far."""
    return set(_last_green_round())


def test_unchecked_entries_inside_driver_window():
    """Every never-driver-green entry sits inside the 50-slot window —
    EXCEPT under saturation: when mandatory entries (never-green +
    stale-beyond-bound) exceed 50 (a driver round that produced no
    correctness artifact leaves the prior window's cohort mandatory
    again), the overflow defers FIFO (newest registrations wait) and
    MUST be named in _DRIVER_WINDOW_DEFERRED — an explicit, reviewed
    list, never a silent drop.  A deferral is only legal while the
    window is genuinely full of mandatory entries."""
    checked = _driver_green()
    last = _last_green_round()
    window = list(QUERIES)[:50]
    outside = sorted(n for n in list(QUERIES)[50:]
                     if n not in checked)
    assert outside == sorted(_DRIVER_WINDOW_DEFERRED), (
        f"entries with no driver-green row fell outside the 50-entry "
        f"correctness window undocumented: "
        f"{sorted(set(outside) - set(_DRIVER_WINDOW_DEFERRED))}"
    )
    if _DRIVER_WINDOW_DEFERRED:
        current_round = (max(last.values()) + 1) if last else 1
        mandatory_in_window = [
            n for n in window
            if n not in checked or last.get(n, 0) < current_round - 2]
        assert len(mandatory_in_window) == 50, (
            f"deferred list is non-empty but the window holds only "
            f"{len(mandatory_in_window)} mandatory entries — the "
            f"deferral is hiding schedulable work")
    # the explicit priority list actually landed in front
    for name in _DRIVER_WINDOW_FIRST:
        assert name in window, f"{name} not in driver window"


def test_driver_window_staleness_bound():
    """THE ROTATION POLICY (VERDICT r6 "Next round" #4), asserted, not
    assumed: every entry OUTSIDE the upcoming driver window must have
    been driver-green within the last two completed rounds.  With a
    50-slot window over ~100 entries, perfect alternation gives age
    0/1; the bound of 2 absorbs window churn from new entries, but an
    entry can never quietly age out the way rollup_revenue did
    (green r2, unchecked r3-r6)."""
    last = _last_green_round()
    if not last:
        return  # round 1: no artifacts yet
    current_round = max(last.values()) + 1
    window = set(list(QUERIES)[:50])
    offenders = {
        # PREVIOUSLY-GREEN entries only: never-green entries are the
        # in-window / documented-deferral test's domain above
        n: last[n] for n in QUERIES
        if n not in window and n in last
        and last[n] < current_round - 2
    }
    assert offenders == {}, (
        f"entries outside the round-{current_round} driver window with "
        f"no green row since round {current_round - 2}: {offenders} — "
        f"front them in _DRIVER_WINDOW_FIRST")


def test_oracle_registry_order_mirrors_queries():
    qnames = [n for n in QUERIES if n in ORACLES]
    assert qnames == list(ORACLES)


def test_every_window_name_exists():
    missing = [n for n in _DRIVER_WINDOW_FIRST if n not in QUERIES]
    assert missing == []
