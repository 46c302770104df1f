"""Learned quality/domain classifier over text features — the GPT-3-style
"classifier filtering" step of an LLM data pipeline (GPT-3 appendix A:
a logistic classifier trained on a positive seed corpus scores every
candidate document; WebText positives vs Common Crawl negatives).

Spark-first shape: featurization is ALL Catalyst expressions (codegen,
zero Python in the corpus pass); training is `pyspark.ml`'s
LogisticRegression — distributed treeAggregate LBFGS over the assembled
vectors, a ~10-float model on the driver; scoring broadcasts that model
back as one narrow map. At 100 TB the cost is two corpus passes
(featurize+train sample, featurize+score) with no shuffle beyond ml's
bounded aggregation tree.

The reference has no such surface (read-only sharing client); this is
part of the driver-mandated LLM-pipeline extension set. The per-document
feature block reuses the oracle-verified signal family
(functions/text.py: token/entropy/repetition signals)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EN_STOPWORDS = (
    "the a an and or of to in is was for on with as by at it this that "
    "be are from"
).split()

FEATURE_COLS = [
    "f_mean_word_len",
    "f_stopword_frac",
    "f_digit_frac",
    "f_space_frac",
    "f_distinct_ratio",
    "f_vowel_frac",
    "f_len_log",
]


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the classifier's per-document feature columns — pure
    codegen expressions, one narrow pass."""
    t = F.col(text_col)
    toks = F.filter(F.split(t, " "), lambda x: x != "")
    n_tok = F.greatest(F.size(toks), F.lit(1)).cast("double")
    n_chr = F.greatest(F.length(t), F.lit(1)).cast("double")
    return (
        df.withColumn("__toks", toks)
        .withColumn(
            "f_mean_word_len",
            F.aggregate(
                F.col("__toks"),
                F.lit(0).cast("double"),
                lambda a, x: a + F.length(x).cast("double"),
            )
            / n_tok,
        )
        .withColumn(
            # occurrence count, NOT array_intersect (which dedups to
            # distinct stopword TYPES — 'the the the the cat' must score
            # 0.8, not 0.2, or the feature saturates at |stoplist|/n_tok)
            "f_stopword_frac",
            F.size(
                F.filter(F.col("__toks"), lambda x: x.isin(*_EN_STOPWORDS))
            ).cast("double")
            / n_tok,
        )
        .withColumn(
            "f_digit_frac",
            (n_chr - F.length(F.regexp_replace(t, "[0-9]", ""))) / n_chr,
        )
        .withColumn(
            "f_space_frac",
            (n_chr - F.length(F.regexp_replace(t, " ", ""))) / n_chr,
        )
        .withColumn(
            "f_distinct_ratio",
            F.size(F.array_distinct(F.col("__toks"))).cast("double") / n_tok,
        )
        .withColumn(
            "f_vowel_frac",
            (n_chr - F.length(F.regexp_replace(F.lower(t), "[aeiou]", ""))) / n_chr,
        )
        .withColumn("f_len_log", F.log(n_chr))
        .drop("__toks")
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit the logistic model on a labeled frame (label_col ∈ {0,1});
    returns the fitted pyspark.ml PipelineModel (assembler + LR)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feat = text_features(df, text_col)
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="__raw"),
            StandardScaler(inputCol="__raw", outputCol="__features"),
            LogisticRegression(
                featuresCol="__features",
                labelCol=label_col,
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    return pipe.fit(feat)


def score_quality(
    model, df: DataFrame, text_col: str = "text", out_col: str = "quality_prob"
) -> DataFrame:
    """Broadcast-score the corpus: P(label=1) per document."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(text_features(df, text_col))
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    ).drop("__raw", "__features", "rawPrediction", "probability", "prediction")
