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


def test_model_save_load_roundtrip(spark, sf_dir, tmp_path_factory):
    """The reference class's full workflow includes persisting the
    fitted model; a reloaded model must score identically."""
    from pyspark.ml.classification import LogisticRegressionModel
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.classification import LogisticRegression
    from pyspark.sql import functions as F

    from iris_pyspark_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        F.col("label").cast("double").alias("label"),
    )
    model = LogisticRegression(maxIter=5, regParam=0.1).fit(emb)
    path = str(tmp_path_factory.mktemp("lr_model")) + "/m"
    model.write().overwrite().save(path)
    reloaded = LogisticRegressionModel.load(path)

    a = model.transform(emb).select("vec_id", "prediction")
    b = reloaded.transform(emb).select("vec_id", "prediction")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
