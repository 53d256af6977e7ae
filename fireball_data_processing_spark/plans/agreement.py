"""A21: inter-rater agreement statistics.

The reference computes pairwise Cohen's kappa / Kendall's tau /
Krippendorff's alpha over raters with overlapping question sets
(``human_eval/results_analysis.py:107-178``). Spark shape: self-join
ratings on the question key to materialize rater pairs, then one
``applyInPandas`` per pair computing the statistic (numpy only — no scipy
dependency). Pairs are tiny; the join is the distributed part.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohen_kappa(a: np.ndarray, b: np.ndarray) -> float:
    """Cohen's kappa for two equal-length label vectors."""
    cats = np.unique(np.concatenate([a, b]))
    n = len(a)
    if n == 0:
        return float("nan")
    po = float(np.mean(a == b))
    pe = 0.0
    for c in cats:
        pe += (np.mean(a == c)) * (np.mean(b == c))
    if pe == 1.0:
        return 1.0
    return (po - pe) / (1.0 - pe)


def pairwise_kappa(
    ratings: DataFrame,
    rater_col: str = "rater",
    item_col: str = "item",
    label_col: str = "label",
) -> DataFrame:
    """Kappa for every rater pair over their co-rated items."""
    a = ratings.select(
        F.col(rater_col).alias("rater_a"),
        F.col(item_col).alias(item_col),
        F.col(label_col).alias("label_a"),
    )
    b = ratings.select(
        F.col(rater_col).alias("rater_b"),
        F.col(item_col).alias(item_col),
        F.col(label_col).alias("label_b"),
    )
    pairs = a.join(b, item_col).filter(F.col("rater_a") < F.col("rater_b"))

    def kappa_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        k = cohen_kappa(pdf["label_a"].to_numpy(), pdf["label_b"].to_numpy())
        return pd.DataFrame(
            {
                "rater_a": [pdf["rater_a"].iloc[0]],
                "rater_b": [pdf["rater_b"].iloc[0]],
                "n_items": [len(pdf)],
                "kappa": [round(float(k), 6)],
            }
        )

    return pairs.groupBy("rater_a", "rater_b").applyInPandas(
        kappa_fn, schema="rater_a string, rater_b string, n_items bigint, kappa double"
    )
