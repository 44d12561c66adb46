"""score_with: broadcast-bytes external-model scoring (reference pyfunc
parity — lazy per-worker init, Arrow-batched predict, no shared FS).

Models and callables are defined INSIDE the tests so cloudpickle ships
them by value — the Spark workers have no import path to this test
module, which mirrors the real constraint (executors can't import the
user's driver-side module either).
"""

import pickle

import pandas as pd
from pyspark import cloudpickle

from merchant_classification_spark.ml.external import score_with


def _stub_linear_model(weight: float, bias: float):
    class StubLinearModel:
        """sklearn-style stand-in: picklable params + vectorized predict."""

        def __init__(self, w, b):
            self.weight = w
            self.bias = b

        def predict(self, xs: pd.Series) -> pd.Series:
            return xs * self.weight + self.bias

    return StubLinearModel(weight, bias)


def test_score_with_stub_model(spark):
    model_bytes = cloudpickle.dumps(_stub_linear_model(weight=2.0, bias=1.0))
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], ["id", "x"]
    ).repartition(8)
    scored = score_with(
        df,
        model_bytes,
        pickle.loads,
        lambda m, pdf: m.predict(pdf["x"].astype("float64")),
        input_cols=["x"],
        output_col="yhat",
    )
    rows = {r.id: r.yhat for r in scored.collect()}
    assert len(rows) == 1000
    assert all(rows[i] == 2.0 * i + 1.0 for i in range(1000))
    # schema: appended column only, input columns untouched
    assert scored.columns == ["id", "x", "yhat"]


def test_score_with_string_output_and_multicol(spark):
    """Multi-input-column batch + non-numeric output type."""

    class Labeler:
        def predict(self, pdf: pd.DataFrame) -> pd.Series:
            return (pdf["a"] + pdf["b"]).map(lambda v: f"c{int(v) % 3}")

    df = spark.createDataFrame([(i, i * 2) for i in range(200)], ["a", "b"])
    scored = score_with(
        df,
        cloudpickle.dumps(Labeler()),
        pickle.loads,
        lambda m, pdf: m.predict(pdf),
        input_cols=["a", "b"],
        output_col="label",
        output_type="string",
    )
    got = {r.a: r.label for r in scored.collect()}
    assert got == {i: f"c{(i * 3) % 3}" for i in range(200)}


def test_score_with_file_backed_loader(spark):
    """The fasttext-shaped path: init dumps bytes to a LOCAL file on the
    worker and loads from it — proves no shared-filesystem requirement."""

    def file_init(raw: bytes):
        import os
        import pickle as pkl
        import tempfile

        fd, path = tempfile.mkstemp(suffix=".bin")
        with os.fdopen(fd, "wb") as f:
            f.write(raw)
        with open(path, "rb") as f:
            model = pkl.load(f)
        os.unlink(path)
        return model

    df = spark.createDataFrame([(float(i),) for i in range(50)], ["x"])
    scored = score_with(
        df,
        cloudpickle.dumps(_stub_linear_model(weight=-1.0, bias=0.5)),
        file_init,
        lambda m, pdf: m.predict(pdf["x"].astype("float64")),
        input_cols=["x"],
        output_col="yhat",
    )
    assert {(r.x, r.yhat) for r in scored.collect()} == {
        (float(i), -float(i) + 0.5) for i in range(50)
    }
