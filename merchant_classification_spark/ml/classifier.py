"""Text classifier with fasttext-equivalent semantics, MLlib-native.

The reference trains a fasttext supervised model — hashed bag of word
n-grams into a linear softmax (Joulin et al. 2016, "Bag of Tricks for
Efficient Text Classification") — as single-node C++ called from the
driver, exchanging models through the shared filesystem
(reference 02_merchcat_ml.py:64-83, utils/merchcat_utils.py:30-54 —
SURVEY.md §2.11 M1). This engine expresses the same model family as a
distributed MLlib Pipeline:

    RegexTokenizer → NGram(2..n) → concat → HashingTF(bucket) →
    StringIndexer(label) → LogisticRegression(multinomial) → IndexToString

fasttext's `bucket` (2,000,000 in the reference, 02_merchcat_ml.py:77)
maps to HashingTF `numFeatures`; `wordNgrams` to the NGram range; the
softmax layer to multinomial logistic regression. Parity is judged on
metric equivalence (accuracy distribution), not per-prediction identity —
the hash families differ (SURVEY.md §4.3).

Scoring is `PipelineModel.transform` — pure JVM, distributed, no pyfunc
spark_udf round-trip and no shared-filesystem model hack
(replaces 02_merchcat_ml.py:506-513 — SURVEY.md §2.11 M7).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import (
    HashingTF,
    IndexToString,
    NGram,
    RegexTokenizer,
    SQLTransformer,
    StringIndexer,
)
from pyspark.sql import DataFrame


@dataclass
class NarrativeClassifier:
    """Supervised short-text classifier (label <- cleaned narrative).

    Parameters mirror the reference's tuning space
    (02_merchcat_ml.py:305-323): `ngram_max` = wordNgrams, `num_features`
    = bucket, `max_iter` ≈ epochs, `reg_param` ≈ lr-complement.
    """

    text_col: str = "tr_description_clean"
    label_col: str = "tr_merchant"
    prediction_col: str = "pr_merchant"
    ngram_max: int = 2
    num_features: int = 1 << 18
    max_iter: int = 50
    reg_param: float = 0.0
    elastic_net: float = 0.0
    #: fasttext subword range (minn/maxn, 02_merchcat_ml.py tuning
    #: space): per-token character n-grams over '<'+token+'>' (the
    #: boundary markers distinguish prefixes/suffixes, as in fasttext).
    #: 0/0 disables. Subwords are what make truncated or partially
    #: OCR'd merchant mentions ("star nort coff" vs "star north
    #: coffee") share features — word n-grams alone treat them as
    #: disjoint vocabularies.
    char_ngram_min: int = 0
    char_ngram_max: int = 0
    #: name of a PRE-COMPUTED array<string> token column to hash into
    #: the same feature space (e.g. fitted BPE segments from
    #: functions/bpe.bpe_segment, domain tags). The column must be
    #: present on every DataFrame passed to fit() AND transform() —
    #: the pipeline consumes it, it does not compute it (a corpus-fitted
    #: vocabulary is data, not a serializable stage).
    extra_tokens_col: str | None = None

    def _stages(self):
        tokenizer = RegexTokenizer(
            inputCol=self.text_col,
            outputCol="_tokens",
            pattern=r"\s+",
            toLowercase=True,
        )
        gram_cols = ["_tokens"]
        grams = []
        for n in range(2, self.ngram_max + 1):
            out = f"_grams_{n}"
            grams.append(NGram(n=n, inputCol="_tokens", outputCol=out))
            gram_cols.append(out)
        if self.char_ngram_max:
            if not (1 <= self.char_ngram_min <= self.char_ngram_max):
                raise ValueError(
                    "char_ngram range must satisfy 1 <= min <= max"
                )
            # one SQLTransformer per subword width — plain codegen HOFs
            # over the token array, so the fitted PipelineModel stays a
            # stock MLlib pipeline (serializable, JVM-side scoring). A
            # token shorter than the padded width contributes its whole
            # '<token>' once (fasttext keeps short subwords the same way).
            for n in range(self.char_ngram_min, self.char_ngram_max + 1):
                out = f"_cgrams_{n}"
                grams.append(
                    SQLTransformer(
                        statement=(
                            "SELECT *, flatten(transform(_tokens, t -> "
                            "transform(sequence(1, greatest(length(t) + "
                            f"{3 - n}, 1)), i -> substring(concat('<', t, "
                            f"'>'), i, {n})))) AS {out} FROM __THIS__"
                        )
                    )
                )
                gram_cols.append(out)
        if self.extra_tokens_col:
            # NULL-proof: concat() returns NULL if ANY operand is NULL,
            # which would crash HashingTF downstream — a row with no
            # extra tokens contributes an empty array instead
            gram_cols.append(
                f"coalesce({self.extra_tokens_col}, array())"
            )
        concat = SQLTransformer(
            statement=(
                "SELECT *, concat(" + ", ".join(gram_cols) + ") AS _all_grams "
                "FROM __THIS__"
            )
        )
        tf = HashingTF(
            inputCol="_all_grams",
            outputCol="_features",
            numFeatures=self.num_features,
        )
        indexer = StringIndexer(
            inputCol=self.label_col, outputCol="_label_idx", handleInvalid="skip"
        )
        lr = LogisticRegression(
            featuresCol="_features",
            labelCol="_label_idx",
            predictionCol="_pred_idx",
            family="multinomial",
            maxIter=self.max_iter,
            regParam=self.reg_param,
            elasticNetParam=self.elastic_net,
        )
        return tokenizer, grams, concat, tf, indexer, lr

    def fit(self, train: DataFrame) -> "NarrativeClassifierModel":
        tokenizer, grams, concat, tf, indexer, lr = self._stages()
        indexer_model = indexer.fit(train)
        decode = IndexToString(
            inputCol="_pred_idx",
            outputCol=self.prediction_col,
            labels=indexer_model.labels,
        )
        pipeline = Pipeline(
            stages=[tokenizer, *grams, concat, tf, indexer_model, lr, decode]
        )
        model = pipeline.fit(train)
        _strip_training_summaries(model)
        return NarrativeClassifierModel(model, self)


def _strip_training_summaries(pipeline_model: PipelineModel) -> None:
    """Drop fitted stages' training summaries before the model is used.

    A training summary (e.g. LogisticRegression's) holds a SparkSession
    reference; any task closure capturing the model then serializes the
    session — which fails outright once the session's lazily-created
    ObservationManager exists (not Serializable in Spark 4.1), and would
    ship driver state to executors even when it doesn't. Scoring never
    reads the summary, so the engine clears it at fit time; callers who
    want training diagnostics use ml/evaluate.py, which recomputes them
    from DataFrames.
    """
    from pyspark import SparkContext

    jvm = SparkContext._active_spark_context._jvm
    for stage in pipeline_model.stages:
        jobj = getattr(stage, "_java_obj", None)
        if (
            jobj is not None
            and hasattr(jobj, "setSummary")
            and getattr(stage, "hasSummary", False)
        ):
            jobj.setSummary(jvm.scala.Option.empty())


_INTERNAL_COLS = ("_tokens", "_all_grams", "_features", "_label_idx", "_pred_idx")


class NarrativeClassifierModel:
    """Fitted model; `transform` appends `prediction_col` (string label)."""

    def __init__(self, pipeline_model: PipelineModel, spec: NarrativeClassifier):
        self.pipeline_model = pipeline_model
        self.spec = spec

    def transform(self, df: DataFrame) -> DataFrame:
        out = self.pipeline_model.transform(df)
        drop = [
            c
            for c in out.columns
            if c in _INTERNAL_COLS
            or c.startswith("_grams_")
            or c.startswith("_cgrams_")
            or c in ("rawPrediction", "probability")
        ]
        return out.drop(*drop)

    def save(self, path: str) -> None:
        self.pipeline_model.write().overwrite().save(path)

    @classmethod
    def load(cls, path: str, spec: NarrativeClassifier | None = None):
        return cls(PipelineModel.load(path), spec or NarrativeClassifier())
