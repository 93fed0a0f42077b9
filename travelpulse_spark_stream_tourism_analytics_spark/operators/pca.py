"""Distributed PCA over embedding columns.

The dimensionality-reduction step vector pipelines run before
storage/ANN (fewer dims = smaller index, and decorrelated axes help
product quantization). Classic two-phase shape:

- FIT is a single distributed pass: each partition reduces its rows to
  (count, sum-vector, gram matrix) with vectorized numpy inside
  ``mapInPandas`` — d x d floats per partition, independent of row
  count — and the driver sums the partials, forms the covariance, and
  eigendecomposes a d x d matrix (d is the embedding width, tiny).
- PROJECT is a pure map-side projection: the k component vectors are
  plan constants (like LSH planes / PQ codebooks), and each output
  coordinate is one deterministic sequential-fold dot product.

Sign convention: each component is flipped so its largest-magnitude
entry is positive — eigenvector sign is otherwise arbitrary and would
differ across LAPACK builds.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
    dot,
)


@dataclass
class PCAModel:
    mean: list[float]
    components: list[list[float]]  # k rows of length d
    explained_variance: list[float]


def pca_fit(
    emb: DataFrame, vec_col: str = "v", k: int = 8
) -> PCAModel:
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = (
        emb.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, g array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus")
    n = sum(r["n"] for r in rows)
    s = np.sum([r["s"] for r in rows], axis=0)
    d = len(s)
    g = np.sum([r["g"] for r in rows], axis=0).reshape(d, d)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for i in order:
        v = evecs[:, i]
        if v[np.abs(v).argmax()] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return PCAModel(
        mean=[float(x) for x in mu],
        components=comps,
        explained_variance=[float(evals[i]) for i in order],
    )


def pca_project(
    emb: DataFrame,
    model: PCAModel,
    vec_col: str = "v",
    out_col: str = "pc",
    scale: int = 6,
) -> DataFrame:
    """Append ``out_col`` = the k-dim projection of ``vec_col`` onto
    the fitted components (centered; each coordinate rounded at
    ``scale`` so downstream rankings are engine-stable)."""
    mean_lit = F.lit([float(x) for x in model.mean])
    centered = F.zip_with(F.col(vec_col), mean_lit, lambda a, b: a - b)
    coords = [
        F.round(dot(centered, F.lit([float(w) for w in comp])), scale)
        for comp in model.components
    ]
    return emb.withColumn(out_col, F.array(*coords))


def pca_whiten(
    emb: DataFrame,
    model: PCAModel,
    vec_col: str = "v",
    out_col: str = "pc",
    eps: float = 1e-9,
    scale: int = 6,
) -> DataFrame:
    """Whitened projection: each PCA coordinate divided by the
    component's standard deviation, so the output space has identity
    covariance — the preconditioning that makes product-quantization
    subspaces carry equal information. ``eps`` guards degenerate
    components."""
    import math

    mean_lit = F.lit([float(x) for x in model.mean])
    centered = F.zip_with(F.col(vec_col), mean_lit, lambda a, b: a - b)
    coords = [
        F.round(
            dot(centered, F.lit([float(w) for w in comp]))
            / F.lit(math.sqrt(max(var, eps))),
            scale,
        )
        for comp, var in zip(model.components, model.explained_variance)
    ]
    return emb.withColumn(out_col, F.array(*coords))
