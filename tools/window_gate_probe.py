"""One-off audit probe behind tests/test_plan_shapes.py's global-window
gate: list every registered query whose physical plan contains a
partition-less Window over a non-Limit-bounded input, plus whether it is
covered by the audited allowlist.  The pytest gate is the enforcement; this
prints the full census for PLANS.md records."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olap_sus_spark.session import get_spark  # noqa: E402

import olap_sus_spark.queries  # noqa: F401, E402
from olap_sus_spark.registry import QUERIES  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main():
    from tests.test_plan_shapes import (
        BOUNDED_GLOBAL_WINDOWS,
        _global_window_ids,
        _window_input_is_limited,
        plan_of,
    )

    spark = get_spark("window-gate-probe")
    n_flagged = 0
    for name in sorted(QUERIES):
        try:
            plan = plan_of(QUERIES[name](spark, SF))
        except Exception as exc:  # noqa: BLE001 — census keeps going
            print(f"ERR {name}: {exc}", flush=True)
            continue
        for nid in _global_window_ids(plan):
            if _window_input_is_limited(plan, nid):
                print(f"OK   {name}: node {nid} Limit-bounded", flush=True)
            elif name in BOUNDED_GLOBAL_WINDOWS:
                print(
                    f"OK   {name}: node {nid} allowlisted "
                    f"({BOUNDED_GLOBAL_WINDOWS[name]})",
                    flush=True,
                )
            else:
                n_flagged += 1
                print(f"FLAG {name}: node {nid} UNBOUNDED global window", flush=True)
    print(f"\n{n_flagged} unbounded of {len(QUERIES)} queries")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    sys.exit(main())
