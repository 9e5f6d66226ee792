"""Driver-confirmation freshness guard (r11, verdict #7).

The driver value-checks only the ``_DRIVER_WINDOW`` prefix each round, so a
key can be locally bit-exact forever yet never re-confirmed on the current
harness. This guard makes the rotation self-enforcing: every live registry
key must either (a) have a driver confirmation within the last
``MAX_AGE_ROUNDS`` completed rounds, or (b) sit in the CURRENT window (about
to be re-confirmed this round), or (c) be brand new (never checked — it must
then be in the window, enforced separately).

Threshold: MAX_AGE_ROUNDS = 6. Currently green because the r11 rotation
cleared the entire ≤ r05 cohort (31 keys) into the window; the oldest
non-window confirmations are the r06 cohort, which is exactly at the limit
when round 12 is being built — so round 12's rotation MUST pick them up, and
so on. That is the intended forcing function.
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MAX_AGE_ROUNDS = 6


def _last_confirmed() -> tuple[dict[str, int], int]:
    last: dict[str, int] = {}
    max_round = 0
    for f in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", Path(f).name).group(1))
        max_round = max(max_round, rnd)
        for key, res in json.load(open(f)).items():
            ok = res.get("hash_match") or (
                res.get("rows_match") and res.get("err") is None
            )
            if ok:
                last[key] = max(last.get(key, 0), rnd)
    return last, max_round


def test_no_live_key_exceeds_driver_staleness_budget():
    from graph_database_project_spark import registry

    last, max_round = _last_confirmed()
    building_round = max_round + 1  # the round whose window is in HEAD
    window = set(registry._DRIVER_WINDOW)
    live = set(registry.all_queries())

    stale = sorted(
        k for k in live
        if k not in window
        and building_round - last.get(k, building_round) > MAX_AGE_ROUNDS
    )
    assert not stale, (
        f"live keys whose last driver confirmation predates round "
        f"{building_round - MAX_AGE_ROUNDS} and are NOT in the current "
        f"_DRIVER_WINDOW — rotate them in: {stale}"
    )


def test_never_driver_checked_keys_are_in_the_window():
    """A brand-new key's first driver check must happen the round it ships
    (the round-rhythm discipline) — so it must be in the current window."""
    from graph_database_project_spark import registry

    last, _ = _last_confirmed()
    window = set(registry._DRIVER_WINDOW)
    live = set(registry.all_queries())
    unchecked = sorted(k for k in live if k not in last and k not in window)
    assert not unchecked, (
        f"never-driver-checked keys missing from _DRIVER_WINDOW: {unchecked}"
    )
