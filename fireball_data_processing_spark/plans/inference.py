"""U3/U4/U5: the model-inference envelope as a concrete operator.

The reference runs three classifier generations over distilled utterances —
GPT few-shot (``distill3b_ic_classifier_gpt.py``), an HF zero-shot model,
and a finetuned predictor (SURVEY section 2.8) — all with the same shape:
batch text in, (label, prob) out, followed by deterministic threshold/
filter logic. The engine reifies that shape once:

- :func:`classify_batches` — distributed batch inference via
  ``mapInPandas``: Arrow batches cross the JVM→Python boundary once, the
  model callable is pluggable (an API client, a transformers pipeline, an
  MLlib model wrapper, or a deterministic rule for tests), and everything
  downstream (thresholds, joins, aggregation) stays JVM-side.

The model itself is NOT part of the engine: this container has no model
runtime, and the reference treats the classifier as an external dependency
too (API keys / model checkpoints). The deterministic envelope around it
(threshold/label/prob math) is oracle-checked via the
``ic_ooc_classification`` catalog query.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd

from pyspark.sql import DataFrame


def classify_batches(
    df: DataFrame,
    input_cols: Sequence[str],
    model_fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_cols: str = "label string, prob double",
) -> DataFrame:
    """Attach model predictions to every row.

    ``model_fn`` receives a pandas frame of ``input_cols`` (one Arrow batch
    at a time, NOT the whole partition in memory) and must return a frame
    with the ``out_cols`` columns, same length and order. Expensive model
    state should be constructed lazily inside ``model_fn`` on first call —
    mapInPandas reuses the Python worker across batches, so per-executor
    model load is amortized exactly like the reference's worker-pool init.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + out_cols

    cols = list(input_cols)

    def run(batches):
        for pdf in batches:
            preds = model_fn(pdf[cols])
            preds.index = pdf.index
            yield pd.concat([pdf, preds], axis=1)

    return df.mapInPandas(run, schema=out_schema)
