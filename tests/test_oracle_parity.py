"""Cross-engine parity: every queries() entry vs its DuckDB oracle.

This mirrors the driver's correctness gate. It is expensive (~minutes),
so the full sweep only runs when RUN_ORACLE_PARITY=1; the default run
checks a fast representative subset so `pytest -x -q` stays quick but
still guards the contract.
"""

import os

import pytest

SF = "/root/testdata/sf0.01"
FAST_SUBSET = [
    "revcomp_doc",
    "canonical_count",
    "token_count",
    "fingerprint",
    "codec_dict_rle_lang",
]


def _run(names):
    from tests.oracle_harness import run

    res = run(SF, names)
    bad = {k: v for k, v in res.items() if not v.get("ok")}
    assert not bad, f"parity failures: { {k: {kk: vv for kk, vv in v.items() if 'head' not in kk} for k, v in bad.items()} }"


@pytest.mark.slow
def test_fast_subset_parity():
    _run(FAST_SUBSET)


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("RUN_ORACLE_PARITY") != "1",
    reason="full sweep is slow; set RUN_ORACLE_PARITY=1",
)
def test_full_parity():
    _run(None)
