"""Dump .explain('formatted') for named queries() / extra_queries()
entries to plans/<tag>/<query>_<suffix>.txt (judge evidence for the
optimization rounds).

Usage: python scripts/dump_plans.py <tag> <suffix> [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = sys.argv[4:]

    import __spark_entry__ as entrymod
    from kmers_spark.session import get_spark

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    names = only or sorted(qs)
    out_dir = Path(__file__).resolve().parents[1] / "plans" / tag
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange, "
              f"{plan.count('EvalPython') + plan.count('MapInArrow') + plan.count('FlatMapGroupsIn')} py-nodes)")
    spark.stop()


if __name__ == "__main__":
    main()
