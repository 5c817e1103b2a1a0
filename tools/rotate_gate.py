#!/usr/bin/env python
"""Print the computed driver-gate rotation with its composition
breakdown (flagships / rule-a never-gated / rule-b stale / family adds
/ fill).  The gate itself is derived at import time by
queries/rotation.py — this tool is the human-readable view.

Usage: python tools/rotate_gate.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import __spark_entry__ as e
    from implementation_of_an_etl_process_spark.queries.rotation import (
        FAMILY_COVER,
        FLAGSHIPS,
        read_driver_history,
        read_landed_before,
        stale_lag,
    )

    gate = list(e.queries())[:50]
    latest, completed, value_green = read_driver_history()
    landed = read_landed_before(completed)
    reg = set(e.queries())
    never = (reg - set(latest)) & landed
    lag = stale_lag(len(reg))
    stale = {
        k for k in reg if k in latest and latest[k] <= completed - lag
    }
    fam_members = set().union(*FAMILY_COVER.values())

    print(f"completed round: r{completed}; registered: {len(reg)}; "
          f"gate: {len(gate)}; stale lag: {lag} "
          f"({lag + 1}-round cycle)")
    for k in gate:
        tags = []
        if k in FLAGSHIPS:
            tags.append("flagship")
        if k in never:
            tags.append("rule-a:never-gated")
        if k in stale:
            tags.append(f"rule-b:stale(r{latest[k]})")
        if not tags and k in fam_members:
            fams = [f for f, m in FAMILY_COVER.items() if k in m]
            tags.append(f"family:{','.join(fams)}(r{latest.get(k, '-')})")
        if not tags:
            tags.append(f"fill(r{latest.get(k, 'new')})")
        print(f"  {k:40s} {' '.join(tags)}")
    import collections

    hist = collections.Counter(latest[k] for k in reg if k in latest)
    print("latest-green histogram:", dict(sorted(hist.items())))
    queued = sorted(k for k in reg if k in latest
                    and latest[k] == completed - 2 and k not in gate)
    print(f"aging next round (r{completed - 2}-green, not in gate): "
          f"{len(queued)}")


if __name__ == "__main__":
    main()
