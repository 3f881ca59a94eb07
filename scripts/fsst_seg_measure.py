"""Measured decision for fsst_seg (VERDICT r3 #7): shared symbol table
+ segmented code streams vs whole-block fsst vs per-segment-table
seg:fsst, on the pages fixture columns. Prints ratio and full/selective
decode times; the outcome (adopt override-only / reject) is recorded in
BENCH/ROUND4.md with these numbers.

Usage: python scripts/fsst_seg_measure.py [n_rows]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from kmers_spark.session import get_spark
    from kmers_spark import codecs, pages

    spark = get_spark("fsst_seg_measure", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    pdf = pages.pages_df(spark, n_rows, seed=13, partitions=4).toPandas()
    spark.stop()

    sel = np.zeros(n_rows, dtype=bool)
    rng = np.random.default_rng(7)
    sel[rng.choice(n_rows, max(n_rows // 100, 1), replace=False)] = True  # 1%

    for col in ("url", "text", "html"):
        s = pdf[col]
        typ = "string" if col != "html" else "binary"
        raw = int(s.map(lambda v: len(v) if isinstance(v, (bytes, str)) else 0)
                  .sum())
        print(f"--- {col} (raw {raw/1e6:.1f} MB) ---")
        for codec in ("fsst", "seg:fsst", "fsst_seg"):
            t0 = time.perf_counter()
            payload, meta = codecs.encode_column(s, codec, typ)
            t_enc = time.perf_counter() - t0
            t0 = time.perf_counter()
            full = codecs.decode_column(payload, meta)
            t_dec = time.perf_counter() - t0
            assert list(full) == list(s), f"{codec} roundtrip mismatch on {col}"
            t0 = time.perf_counter()
            part = codecs.decode_column_selected(payload, meta, sel)
            t_sel = time.perf_counter() - t0
            assert len(part) == int(sel.sum())
            print(f"{codec:9s} ratio {len(payload)/raw:.4f} "
                  f"enc {t_enc:.2f}s dec_full {t_dec:.2f}s dec_1pct {t_sel:.3f}s")


if __name__ == "__main__":
    main()
