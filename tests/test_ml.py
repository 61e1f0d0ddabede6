"""N7 pipeline quality gate.

The synthetic `embeddings.label` column is noise by construction —
nearest-centroid holdout accuracy is ~0.10 (chance for 10 classes) at
every scale factor, so no classifier can generalize on this data. What
CAN be asserted: the pipeline mechanically learns the training set far
beyond chance (L-BFGS converges, gradients flow, scoring works), and
the scored holdout has the right shape.
"""

from __future__ import annotations

from iris_pyspark_spark.queries.ml_pipeline import fit_and_score, fit_train_accuracy


def test_pipeline_fits_beyond_chance(spark, sf_dir):
    # Train-set accuracy: chance is 0.1 for 10 balanced classes; a
    # working LR memorizes far more of 400 rows x 64 dims.
    acc = fit_train_accuracy(spark, sf_dir)
    assert acc >= 0.3, f"train accuracy {acc:.3f} at chance — pipeline broken"


def test_holdout_scoring_shape(spark, sf_dir):
    scored = fit_and_score(spark, sf_dir)
    rows = scored.collect()
    assert len(rows) > 0
    assert set(scored.columns) == {"vec_id", "label", "prediction", "correct"}
    assert all(0 <= r.prediction <= 9 for r in rows)
