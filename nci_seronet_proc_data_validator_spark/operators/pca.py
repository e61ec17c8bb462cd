"""Distributed PCA for embedding columns — the dimensionality-reduction /
whitening step ANN pipelines run before quantization (IVF-PQ style), and
the one linear-algebra operator the engine was missing.

Spark-first shape for 100 TB (the k-means model-sync pattern,
``operators/kmeans.py``, applied to second moments):

- **Fit is ONE aggregation pass.** Mean and the upper-triangle second
  moments are ``1 + d + d(d+1)/2`` scalar ``sum`` aggregates in a single
  ``agg`` — map-side partial aggregation, no explode (a naive
  explode-the-outer-product plan inflates the corpus d² ×), result is
  O(d²) scalars to the driver regardless of corpus size.
- **Eigendecomposition is driver math.** The covariance is d×d (64×64
  here) — ``numpy.linalg.eigh`` on the driver, exactly where MLlib's own
  PCA does it. No data-scale work leaves the executors.
- **Transform is map-only.** The k×d component matrix rides the plan as
  literal arithmetic (one projection expression per output dimension);
  scoring scales with the scan, zero shuffles, and runs unchanged on
  streaming sources.

Float contract: fit/transform are IEEE double throughout; this is a
test-verified operator (numpy parity at test scale), not a DuckDB-oracle
query — cross-engine eigensolvers don't bit-match and shouldn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(emb: DataFrame, dim: int, k: int,
            vec_col: str = "embedding") -> tuple[list[float],
                                                 list[list[float]]]:
    """Fit PCA: returns ``(mean, components)`` with ``components`` the
    top-``k`` eigenvectors (rows, descending eigenvalue), sign-normalized
    so each row's largest-magnitude entry is positive (deterministic
    across eigensolver sign flips)."""
    import numpy as np
    if not 1 <= k <= dim:
        raise ValueError(f"need 1 <= k <= dim: {k=} {dim=}")

    def x(i: int) -> str:
        return f"CAST({vec_col}[{i}] AS DOUBLE)"

    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.expr(f"sum({x(i)})").alias(f"s{i}") for i in range(dim)]
    aggs += [F.expr(f"sum({x(i)} * {x(j)})").alias(f"p{i}_{j}")
             for i in range(dim) for j in range(i, dim)]
    row = emb.agg(*aggs).collect()[0]
    n = row["n"]
    if n < 2:
        raise ValueError(f"need >= 2 vectors to fit PCA, got {n}")
    mean = np.array([row[f"s{i}"] for i in range(dim)]) / n
    cov = np.empty((dim, dim))
    for i in range(dim):
        for j in range(i, dim):
            c = row[f"p{i}_{j}"] / n - mean[i] * mean[j]
            cov[i, j] = cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)          # ascending
    comps = vecs[:, ::-1][:, :k].T            # k rows, descending value
    for r in range(k):                        # deterministic sign
        m = np.argmax(np.abs(comps[r]))
        if comps[r][m] < 0:
            comps[r] = -comps[r]
    return mean.tolist(), comps.tolist()


def pca_transform(df: DataFrame, mean: list[float],
                  components: list[list[float]],
                  vec_col: str = "embedding",
                  out_col: str = "pca") -> DataFrame:
    """Project ``vec_col`` onto the fitted components, appending
    ``out_col`` (array<double>, length k). Pure literal arithmetic —
    map-only, streaming-safe."""
    dim = len(mean)
    outputs = []
    for comp in components:
        terms = " + ".join(
            f"({comp[j]!r}) * (CAST({vec_col}[{j}] AS DOUBLE)"
            f" - ({mean[j]!r}))"
            for j in range(dim))
        outputs.append(f"({terms})")
    return df.withColumn(out_col,
                         F.expr(f"array({', '.join(outputs)})"))
