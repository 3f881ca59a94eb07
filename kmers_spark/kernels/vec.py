"""Arrow-batched vector math for the ANN surface.

These are bit-identical twins of the interpreted higher-order-function
expressions they replace (functions/ann.py pre-r6: F.aggregate /
zip_with / transform — CodegenFallback, i.e. per-row per-element
interpreted evaluation; the engine's own zorder measurement showed the
vectorized form 33x faster at 4M rows, operators/partitioning.py).

Bit-identity contract: every reduction accumulates SEQUENTIALLY over
the dimension axis (acc = acc + x_j * y_j), vectorized over the ROW
axis — the same left-fold order, float32->float64 widening, and IEEE
double ops as the Spark expressions, so scores match the unchanged
DuckDB oracles to the last ulp (no pairwise/np.dot summation, which
reorders the adds). The per-dimension Python loop costs len(dims)
numpy ops per batch — vectorization happens across rows, where the
cardinality is.

NaN semantics for argmax follow Spark's ordering (NaN greater than
every double, NaN == NaN), so zero-norm vectors keep the exact
max(struct(ccos, -cent_id)) tie-break behavior.
"""

from __future__ import annotations

import numpy as np


def stack_embeddings(values) -> np.ndarray:
    """Sequence of float32 vectors (pd.Series of ndarrays / lists) ->
    (n, d) float64 matrix. float32 -> float64 is exact, matching the
    expressions' x.cast('double')."""
    return np.stack([np.asarray(v) for v in values]).astype(np.float64)


def seq_dot(A: np.ndarray, b: np.ndarray,
            tmp: np.ndarray | None = None) -> np.ndarray:
    """Left fold over dims of acc + A[:, j] * b[j] — twin of _dot.

    Allocation-lean: `np.multiply(out=tmp)` + `acc += tmp` are the same
    IEEE ops in the same order (bit-identical to the naive form), but
    touch 2 buffers instead of allocating 2 fresh arrays per dimension.
    Under the sandbox host's first-touch-memory pathology the per-dim
    allocations were a 2-3x wall-clock tax on the ANN surface
    (measured at the 20k-vector sfx1 scale); on a healthy host it is
    simply less allocator traffic per batch."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    if tmp is None:
        tmp = np.empty(A.shape[0], dtype=np.float64)
    for j in range(A.shape[1]):
        np.multiply(A[:, j], b[j], out=tmp)
        acc += tmp
    return acc


def seq_dot_pair(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise left-fold dot of two (n, d) matrices (pair rescoring)."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    tmp = np.empty(A.shape[0], dtype=np.float64)
    for j in range(A.shape[1]):
        np.multiply(A[:, j], B[:, j], out=tmp)
        acc += tmp
    return acc


def seq_norm(A: np.ndarray, tmp: np.ndarray | None = None) -> np.ndarray:
    """sqrt of the left fold of acc + x_j * x_j — twin of _norm."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    if tmp is None:
        tmp = np.empty(A.shape[0], dtype=np.float64)
    for j in range(A.shape[1]):
        np.multiply(A[:, j], A[:, j], out=tmp)
        acc += tmp
    return np.sqrt(acc)


def seq_dot_scalar(a: np.ndarray, b: np.ndarray) -> float:
    acc = np.float64(0.0)
    for j in range(a.shape[0]):
        acc = acc + np.float64(a[j]) * np.float64(b[j])
    return float(acc)


def seq_norm_scalar(a: np.ndarray) -> float:
    acc = np.float64(0.0)
    for j in range(a.shape[0]):
        acc = acc + np.float64(a[j]) * np.float64(a[j])
    return float(np.sqrt(acc))


def cosine_vs_query(A: np.ndarray, q: np.ndarray) -> np.ndarray:
    """dot(x, q) / (norm(x) * norm(q)) per row — the exact expression
    shape of cosine_topk_df (norms multiplied before the division)."""
    nq = seq_norm_scalar(q)
    return seq_dot(A, q.astype(np.float64)) / (seq_norm(A) * nq)


def cosine_pairs(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise dot(a, b) / (norm(a) * norm(b)) for pair rescoring."""
    return seq_dot_pair(A, B) / (seq_norm(A) * seq_norm(B))


def argmax_centroid(A: np.ndarray, cents: np.ndarray,
                    cent_ids: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment by cosine: per row, the cent_id with
    the greatest ccos = dot(x, c)/(norm(x)*norm(c)); ties -> the SMALLER
    cent_id; NaN ccos (zero-norm vector or centroid) ranks GREATER than
    any number — exactly max(struct(ccos, -cent_id)) under Spark's
    ordering. `cents` rows must be sorted by cent_id ascending."""
    n = A.shape[0]
    tmp = np.empty(n, dtype=np.float64)
    norms = seq_norm(A, tmp=tmp)
    best_val = np.full(n, -np.inf, dtype=np.float64)
    best_nan = np.zeros(n, dtype=bool)
    best_id = np.full(n, -1, dtype=np.int64)
    for i in range(cents.shape[0]):
        c = cents[i].astype(np.float64)
        ccos = seq_dot(A, c, tmp=tmp)
        ccos /= norms * seq_norm_scalar(c)  # in place: same IEEE divide
        isnan = np.isnan(ccos)
        # strictly-greater keeps the earliest (smallest) cent_id on ties
        better = isnan | (ccos > best_val)
        better &= ~best_nan
        np.copyto(best_val, ccos, where=better)
        best_nan |= better & isnan
        np.copyto(best_id, cent_ids[i], where=better)
    return best_id


def plane_weights(plane_ids, dims: int) -> np.ndarray:
    """(len(plane_ids), dims) ±1 weight matrix of the fixed seedless
    pattern w(p, d) = +1 if (31p + 17d) % 7 < 3 else -1 (SURVEY §2.5
    H4 determinism rule; identical to the F.transform index form)."""
    p = np.asarray(plane_ids, dtype=np.int64)[:, None]
    d = np.arange(dims, dtype=np.int64)[None, :]
    return np.where((31 * p + 17 * d) % 7 < 3, 1.0, -1.0)


def signed_bits(A: np.ndarray, W: np.ndarray) -> np.ndarray:
    """(n, n_planes) int64 sign bits: left-fold dot(x, W[p]) > 0 per
    plane — twin of (_signed_dot(emb, plane) > 0).cast('long')."""
    n, d = A.shape
    bits = np.empty((n, W.shape[0]), dtype=np.int64)
    acc = np.empty(n, dtype=np.float64)
    tmp = np.empty(n, dtype=np.float64)
    for p in range(W.shape[0]):
        acc[:] = 0.0
        w = W[p]
        for j in range(d):
            np.multiply(A[:, j], w[j], out=tmp)
            acc += tmp
        bits[:, p] = acc > 0
    return bits
