"""Experiment tracking (reference M4/M5: MLflow log/register,
02_merchcat_ml.py:182-211,467-483).

MLflow is Spark-ecosystem-native, so when it is installed we use it
directly; this container doesn't ship it, so the same API degrades to a
local JSON run log — the engine's operators never depend on the backend.
"""

from __future__ import annotations

import json
import os
import time
import uuid

try:  # optional dependency
    import mlflow  # type: ignore

    HAVE_MLFLOW = True
except Exception:  # pragma: no cover - environment without mlflow
    mlflow = None
    HAVE_MLFLOW = False


class RunTracker:
    """Log params/metrics for a training run; register a model path.

    With mlflow installed this maps 1:1 to mlflow runs + registry; without
    it, runs append to ``<dir>/runs.jsonl`` so tuning history survives.
    """

    def __init__(self, experiment: str, directory: str = "/tmp/mcs_runs"):
        self.experiment = experiment
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        if HAVE_MLFLOW:
            mlflow.set_experiment(experiment)

    def log_run(
        self,
        params: dict,
        metrics: dict,
        model_path: str | None = None,
        tags: dict | None = None,
        signature: dict[str, str] | None = None,
    ) -> str:
        """``signature`` is the model's IO contract as {column: type} pairs
        split into "inputs"/"outputs" keys (the reference signs its pyfunc
        with a string→string ColSpec pair, 02_merchcat_ml.py:199-201); it
        travels with the run so scorers can validate frames before
        transform."""
        run_id = uuid.uuid4().hex
        if HAVE_MLFLOW:
            with mlflow.start_run(run_name=run_id):
                mlflow.log_params(params)
                mlflow.log_metrics(metrics)
                if tags:
                    mlflow.set_tags(tags)
                if signature:
                    mlflow.set_tags(
                        {"model_signature": json.dumps(signature, sort_keys=True)}
                    )
            return run_id
        record = {
            "experiment": self.experiment,
            "run_id": run_id,
            "ts": time.time(),
            "params": params,
            "metrics": metrics,
            "model_path": model_path,
            "tags": tags or {},
            "signature": signature,
        }
        with open(os.path.join(self.directory, "runs.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
        return run_id

    def register(
        self,
        model_path: str,
        name: str,
        stage: str = "production",
        signature: dict[str, str] | None = None,
    ) -> None:
        """Model registry: a named pointer to the current production model
        (reference 02_merchcat_ml.py:467-478), carrying the model's IO
        signature so consumers can type-check without loading it."""
        if HAVE_MLFLOW:
            mlflow.register_model(f"file://{model_path}", name)
            return
        pointer = {
            "name": name,
            "stage": stage,
            "path": model_path,
            "ts": time.time(),
            "signature": signature,
        }
        with open(os.path.join(self.directory, f"registry_{name}.json"), "w") as f:
            json.dump(pointer, f)
