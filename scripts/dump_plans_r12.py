"""Dump explain('formatted') plans for named queries into plans/r12/.

Usage: python scripts/dump_plans_r12.py <tag> <name> [name ...]

Writes plans/r12/<name>_<tag>.txt (tag = before/after). Runs at sf0.01
on a small local session — plan shape, not timing, is the artifact.
For the iterative operators the loop executes eagerly at plan-build
time, so the dump shows the final-round plan plus the lineage cuts;
join-strategy changes (BroadcastExchange vs Exchange under the round
joins) are exactly what these dumps are for.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p6_spark.plans import get_queries  # noqa: E402
from p6_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("p6_plan_dump", cpus=8)
    qs = get_queries()
    for name in names:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
