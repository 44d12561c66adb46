import os

from merchant_classification_spark.config import EngineConfig, load_config


def test_defaults():
    cfg = load_config()
    assert cfg.model_name == "merchcat"
    assert cfg.sample_size == 5000
    assert cfg.count_threshold == 100
    assert cfg.test_fraction == 0.1


def test_yaml_override(tmp_path):
    p = tmp_path / "app.yaml"
    p.write_text("model_name: custom\nsample_size: 123\nunknown_key: ignored\n")
    cfg = load_config(str(p))
    assert cfg.model_name == "custom"
    assert cfg.sample_size == 123
    assert not hasattr(cfg, "unknown_key")


def test_env_data_dir(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/tmp/somewhere")
    assert EngineConfig().data_dir == "/tmp/somewhere"
