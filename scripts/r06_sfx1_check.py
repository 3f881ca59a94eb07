"""10x-scale evidence for the round-6 rewrites: oracle-check + time the
rewritten pipelines over the deterministic sfx1 tables (50k docs / 20k
vectors — scripts/bench_sf1.py's generator). Correctness here is
host-independent; timings carry the canary state."""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

QUERIES = [
    "dedup_exact", "minhash_lsh_pairs", "ngram_jaccard", "simhash",
    "token_count", "ann_cosine_topk", "ann_ivf_topk", "ann_ivf_lloyd_topk",
    "ann_topk_lsh_multi", "embedding_dup_pairs",
]


def main() -> None:
    from kmers_spark import hostcheck

    sys.path.insert(0, str(REPO / "scripts"))
    import bench_sf1

    bench_sf1.ensure_sfx1()
    sfx1 = str(bench_sf1.SFX1)
    host_start = hostcheck.probe()
    s = bench_sf1._spark(32, shuffle=64, coalesce=True)
    s.sparkContext.setLogLevel("ERROR")
    try:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        timings: dict[str, list[float]] = {}
        for name in QUERIES:
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](s, sfx1).write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            timings[name] = runs
        from tests import oracle_harness

        oracle = oracle_harness.run(sfx1, only=QUERIES)
        oracle_ok = {k: bool(v.get("ok")) for k, v in oracle.items()}
    finally:
        s.stop()
    print(json.dumps({
        "sfx1_rows": {"documents": bench_sf1.DOCS_ROWS,
                      "embeddings": bench_sf1.VECS_ROWS},
        "query_runs": timings,
        "oracle_ok": oracle_ok,
        "all_ok": all(oracle_ok.values()),
        "host_state": {"start": host_start, "end": hostcheck.probe()},
    }))


if __name__ == "__main__":
    main()
