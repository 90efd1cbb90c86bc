"""Vectorized numpy kernels for the embedding-family operators, with
bit-exactness guards against the declared oracles.

Why this exists (optimization guide §4.2): the embedding operators'
per-pair arithmetic was built from Spark higher-order functions
(``aggregate(zip_with(...))`` folds), which evaluate lambda closures per
array element in the interpreter — fine for thousands of evaluations,
ruinous for the tens of millions a within-cluster pairing or PQ encode
performs. The sweet spot is to let Spark do distribution and hand whole
Arrow batches to BLAS: one ``X @ Y.T`` replaces millions of interpreted
folds.

Why results stay EXACTLY equal to the JVM plans (and the DuckDB
oracles): every rounded quantity the oracles compare is
``floor(x * 10^k + 0.5) / 10^k``. BLAS accumulates in a different order
than Spark's left fold, so ``x`` can differ by ~1e-13 — harmless unless
``x`` sits within that distance of a rounding boundary. The guard:
compute ``x`` fast, detect entries whose fractional position is within
``GUARD`` (1e-5 of a boundary in r4-space, i.e. |Δx| < 1e-9 — four
orders of magnitude above the worst-case reordering error, six below
the rounding step), and recompute ONLY those with the exact sequential
fold Spark uses (Python floats are IEEE doubles with identical
semantics). Non-borderline entries provably round identically; borderline
entries are bit-identical by construction. Sign decisions (LSH plane
projections) get the same guard around zero.
"""

from __future__ import annotations

import math

import numpy as np

# distance from a rounding boundary (in scaled space) below which the
# exact sequential fold is recomputed; reordering error is bounded by
# ~d * eps * sum|terms| ~ 1e-13 in x-space for 64-dim unit vectors,
# so 1e-9 (r4) / 1e-10 (r6) guard bands are >1000x the error while
# keeping the recompute fraction ~1e-5 of entries
_GUARD_R4 = 1e-5  # in (x*1e4 + 0.5)-space
_GUARD_R6 = 1e-4  # in (x*1e6 + 0.5)-space
_GUARD_SIGN = 1e-9  # |projection| below this -> exact recompute


def dot_seq(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def norm_seq(a) -> float:
    acc = 0.0
    for x in a:
        acc += x * x
    return math.sqrt(acc)


def l2sq_seq(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def cos_seq(a, b) -> float:
    return dot_seq(a, b) / (norm_seq(a) * norm_seq(b))


def r4_floor(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000


def r6_floor(x: float) -> float:
    return math.floor(x * 1000000 + 0.5) / 1000000


def _rounded(approx: np.ndarray, exact_at, scale: float, guard: float) -> np.ndarray:
    """floor(x*scale + 0.5)/scale elementwise over ``approx``; entries whose
    scaled fractional position is within ``guard`` of an integer are
    recomputed with ``exact_at(idx_tuple)`` (the sequential fold), making
    the result equal Spark's fold-then-floor everywhere."""
    r = approx * scale + 0.5
    fl = np.floor(r)
    out = fl / scale
    fr = r - fl
    border = (fr < guard) | (fr > 1.0 - guard)
    if border.any():
        for idx in np.argwhere(border):
            t = tuple(idx)
            out[t] = math.floor(exact_at(t) * scale + 0.5) / scale
    return out


def rounded4(approx: np.ndarray, exact_at) -> np.ndarray:
    return _rounded(approx, exact_at, 10000.0, _GUARD_R4)


def rounded6(approx: np.ndarray, exact_at) -> np.ndarray:
    return _rounded(approx, exact_at, 1000000.0, _GUARD_R6)


def cos_rounded(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """(n x m) matrix of r4-rounded cosines between rows of X and rows of Y
    (both float64, d columns): one GEMM + guarded rounding. Equals the
    fold-computed ``_r4(cosine(x, y))`` of simsearch for every entry."""
    nx = np.sqrt(np.einsum("ij,ij->i", X, X))
    ny = np.sqrt(np.einsum("ij,ij->i", Y, Y))
    c = (X @ Y.T) / (nx[:, None] * ny[None, :])
    return rounded4(c, lambda t: cos_seq(X[t[0]], Y[t[1]]))


def cos_rounded_sym(V: np.ndarray) -> np.ndarray:
    """Symmetric pairwise r4-rounded cosines of rows of V — the
    within-cluster pairing kernel. Only the strict upper triangle is
    guaranteed guarded-exact (that is the half the pairing reads)."""
    n = np.sqrt(np.einsum("ij,ij->i", V, V))
    c = (V @ V.T) / (n[:, None] * n[None, :])
    return rounded4(c, lambda t: cos_seq(V[t[0]], V[t[1]]))


def rp_project_signs(X: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Boolean (n x n_bits) sign matrix of the random-projection dots,
    guarded at zero: entries with |projection| < _GUARD_SIGN recompute the
    exact left fold, so the ``>= 0`` decision matches Spark's bitwise."""
    proj = X @ planes.T
    near = np.abs(proj) < _GUARD_SIGN
    if near.any():
        for i, j in np.argwhere(near):
            proj[i, j] = dot_seq(X[i], planes[j])
    return proj >= 0


def rp_bucket(X: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """int64 bucket ids: sum over j of 2^j where projection j >= 0 — the
    numpy twin of simsearch._rp_bucket_col."""
    signs = rp_project_signs(X, planes)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return signs @ weights


def argmax_cos_rounded(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Per row of X: the index of the max r4-rounded cosine against rows of
    C, lowest index on ties (C rows are ordered by centroid id, and
    np.argmax returns the first maximum) — the ivf_assign ranking rule."""
    return np.argmax(cos_rounded(X, C), axis=1)


def pq_codes(X: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """(n x m) int32 PQ codes: per subspace the argmin r6-rounded L2^2
    against the ksub centroids, lowest centroid id on ties (np.argmin
    returns the first minimum) — the _pq_code_expr ranking rule.
    ``codebook`` is (m, ksub, d_sub) float64."""
    n = X.shape[0]
    m, ksub, d_sub = codebook.shape
    codes = np.empty((n, m), dtype=np.int32)
    for s in range(m):
        xs = X[:, s * d_sub:(s + 1) * d_sub]
        diff = xs[:, None, :] - codebook[s][None, :, :]
        d2 = np.einsum("nkd,nkd->nk", diff, diff)
        d2r = rounded6(d2, lambda t, _xs=xs, _s=s: l2sq_seq(_xs[t[0]], codebook[_s][t[1]]))
        codes[:, s] = np.argmin(d2r, axis=1)
    return codes


def pq_query_tables(qv: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """(m x ksub) table of EXACT r6-rounded subspace distances for one
    query vector — computed with the sequential fold directly (k*m*d ops,
    driver-trivial), so no guard is needed: the values are bit-identical
    to Spark's ``_r6(_l2sq(qv_s, c))`` terms by construction."""
    m, ksub, d_sub = codebook.shape
    out = np.empty((m, ksub), dtype=np.float64)
    for s in range(m):
        qs = qv[s * d_sub:(s + 1) * d_sub]
        for j in range(ksub):
            out[s, j] = r6_floor(l2sq_seq(qs, codebook[s][j]))
    return out


def adc_rounded(codes: np.ndarray, tables: np.ndarray) -> np.ndarray:
    """r4-rounded asymmetric distances for (n x m) codes against one
    query's (m x ksub) EXACT term table, accumulated in Spark's term
    order (left fold over subspaces) — elementwise IEEE-identical to
    ``_r4(sum(terms))``, so the floor needs no guard."""
    acc = tables[0][codes[:, 0]]
    for s in range(1, codes.shape[1]):
        acc = acc + tables[s][codes[:, s]]
    return np.floor(acc * 10000.0 + 0.5) / 10000.0
