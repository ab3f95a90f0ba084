"""Capture .explain("formatted") for the timed query series into
plans/r16/<query>_<tag>.txt (tag = before/after).

Usage: python tools/r16_plans.py before [name ...]
       python tools/r16_plans.py after  [name ...]
No names = the 12 bench=True headline queries + the EXTRA_QUERIES
series from bench.py (the full timed surface).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTRA_QUERIES  # noqa: E402
from electrician_spark.benchvariants import resolve_variant  # noqa: E402
from electrician_spark.queries import REGISTRY  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (
        [n for n, q in REGISTRY.items() if q.bench]
        + [n for n in EXTRA_QUERIES if n in REGISTRY]
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_session("r16-plans", cpus=cpu_budget())
    failures = 0
    for name in names:
        # Same resolution as bench.py: frozen-artifact variants are the
        # timed form, so their plan is the one on record.
        fn = resolve_variant(name, SF_DIR) or REGISTRY[name].spark
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"FAILED {name}: {type(e).__name__}: {e}")
            failures += 1
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
