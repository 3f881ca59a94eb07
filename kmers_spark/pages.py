"""Deterministic synthetic Common-Crawl-style `pages` table (FIXTURES.md §1).

Exactly the BASELINE.json input_hint shape:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Generation is seeded numpy PCG64 — same seed => byte-identical table —
and runs *distributed*: the driver plans (partition_id, row range) splits
and `mapInPandas` generates each partition's rows inside the executors,
so a 10^8-row bench table never materializes on the driver. Zipf host
skew (a=1.3) creates the hot hosts the salting tests need.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl", "pl", "tr"]
LANG_P = np.array([0.60, 0.10, 0.06, 0.06, 0.05, 0.04, 0.03, 0.02, 0.01, 0.01, 0.01, 0.01])
N_HOSTS = 1000
BASE_TS_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z in epoch-us

_WORDS = None


def _vocab() -> np.ndarray:
    global _WORDS
    if _WORDS is None:
        rng = np.random.default_rng(123)
        alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        _WORDS = np.array(
            ["".join(rng.choice(alpha, rng.integers(2, 10))) for _ in range(512)]
        )
    return _WORDS


def generate_chunk(start: int, n: int, seed: int = 42) -> pd.DataFrame:
    """Rows [start, start+n) of the infinite deterministic page stream.

    Each row's randomness is keyed off (seed, row_id) via a per-chunk
    generator seeded with (seed, start, n)-independent derivation:
    we seed per-row-block so any partitioning yields identical rows.
    """
    words = _vocab()
    rows = np.arange(start, start + n, dtype=np.int64)
    # per-row values from counter-based hashing (stable under any split);
    # `seed` offsets only the *hash* domain, not row-derived arithmetic
    rid = rows + np.int64(seed) * np.int64(1 << 40)
    h = _mix(rid, 0x9E3779B97F4A7C15)
    host_rank = _zipf_rank(h, N_HOSTS, a=1.3)
    n_path = 1 + (_mix(rid, 0xBF58476D1CE4E5B9) % 4)
    path_w1 = words[_mix(rid, 0x94D049BB133111EB) % 512]
    path_w2 = words[_mix(rid, 0xD6E8FEB86659FD93) % 512]
    urls = np.array(
        [
            f"https://host{host_rank[i]}.example.com/{path_w1[i]}"
            + (f"/{path_w2[i]}" if n_path[i] > 1 else "")
            + f"/{rows[i]}"
            for i in range(n)
        ],
        dtype=object,
    )

    # near-sorted per-host timestamps: base + row*250ms + jitter ±300s
    jitter = (_mix(rid, 0xFF51AFD7ED558CCD) % 600_000_000).astype(np.int64) - 300_000_000
    ts_us = BASE_TS_US + rows * 250_000 + jitter
    warc_ts = pd.Series(ts_us.view("datetime64[us]"))

    # lang is a property of the host (one site, one language): after the
    # encode job's sort-by-url, same-host rows are adjacent -> long runs
    lang_idx = _weighted_pick(_mix(host_rank, 0xC4CEB9FE1A85EC53), LANG_P)
    langs = np.array(LANGS, dtype=object)[lang_idx]

    n_sent = 1 + (_mix(rid, 0x2545F4914F6CDD1D) % 8)
    texts = np.empty(n, dtype=object)
    htmls = np.empty(n, dtype=object)
    for i in range(n):
        r = int(rid[i])
        if _mix1(r, 11) % 100 == 0:
            texts[i] = None
        elif _mix1(r, 12) % 100 < 5:
            texts[i] = ""
        else:
            wi = _mix(np.arange(r, r + 6 * int(n_sent[i]), dtype=np.int64), 0xA0761D6478BD642F) % 512
            texts[i] = " ".join(words[wi])
        body = (texts[i] or "").encode("utf-8")
        trailer = b"</body></html>"
        if _mix1(r, 13) % 100 < 2:  # invalid-UTF8 + NUL injection (binary stress)
            trailer = b"\xff\xfe\x80\x00" + trailer
        htmls[i] = b"<html><body>" + body + trailer

    return pd.DataFrame(
        {"url": urls, "warc_ts": warc_ts, "html": htmls, "text": texts, "lang": langs}
    )


def _mix(x: np.ndarray, c: int) -> np.ndarray:
    """splitmix64-style counter hash, vectorized (uint64 wraparound)."""
    z = (x.astype(np.uint64) + np.uint64(c)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(31)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(29)
    return z


def _mix1(x: int, c: int) -> int:
    return int(_mix(np.array([x], dtype=np.int64), c)[0])


def _zipf_rank(h: np.ndarray, n: int, a: float) -> np.ndarray:
    """Map uniform hashes to Zipf(a)-distributed ranks in [0, n)."""
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), a)
    cdf = np.cumsum(w) / w.sum()
    u = (h % np.uint64(1 << 53)).astype(np.float64) / float(1 << 53)
    return np.searchsorted(cdf, u).astype(np.int64)


def _weighted_pick(h: np.ndarray, p: np.ndarray) -> np.ndarray:
    cdf = np.cumsum(p) / p.sum()
    u = (h % np.uint64(1 << 53)).astype(np.float64) / float(1 << 53)
    return np.clip(np.searchsorted(cdf, u), 0, len(p) - 1)


def pages_df(spark, n_rows: int, seed: int = 42, partitions: int = 32):
    """Distributed deterministic pages DataFrame of n_rows."""
    from pyspark.sql import functions as F

    bounds = np.linspace(0, n_rows, partitions + 1, dtype=np.int64)
    plan = [(int(bounds[i]), int(bounds[i + 1] - bounds[i])) for i in range(partitions)]
    plan_df = spark.createDataFrame(plan, "start long, n long").repartition(partitions, "start")

    def gen(iterator):
        for pdf in iterator:
            for _, row in pdf.iterrows():
                if row["n"] > 0:
                    yield generate_chunk(int(row["start"]), int(row["n"]), seed)

    return plan_df.mapInPandas(gen, SCHEMA)
