"""Engine configuration (reference config/application.yaml:1-14 +
config/configure_notebook.py — SURVEY.md §0).

The reference loads a YAML of table paths / model name / executor count.
Same shape here, as a typed dataclass: defaults work out of the box, a
YAML file overrides when present (pyyaml optional — the engine has no
hard dependency on it), env var SPARK_GRAFT_SF_DIR overrides the data
root for the test corpus.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # data roots
    data_dir: str = field(
        default_factory=lambda: os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    table_format: str = "parquet"  # "delta" on clusters with delta jars

    # transaction-pipeline paths (reference application.yaml:1-3)
    transactions_raw: str = ""
    transactions_fmt: str = ""
    train_path: str = ""
    test_path: str = ""

    # model (reference application.yaml:5-13)
    model_name: str = "merchcat"
    model_path: str = "/tmp/mcs_models"
    tuning_parallelism: int = 20

    # sampling policy (reference 01_merchcat_etl.py:159, 02_merchcat_ml.py:541)
    sample_size: int = 5000
    count_threshold: int = 100
    min_labels_per_class: int = 50
    test_fraction: float = 0.1
    seed: int = 42


def load_config(path: str | None = None) -> EngineConfig:
    """Config from YAML when given/available, else defaults."""
    cfg = EngineConfig()
    if path is None:
        return cfg
    try:
        import yaml  # optional dependency
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("pyyaml not installed; pass no path for defaults") from e
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    for key, value in raw.items():
        if hasattr(cfg, key):
            setattr(cfg, key, value)
    return cfg
