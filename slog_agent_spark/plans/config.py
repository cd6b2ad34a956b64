"""The flagship pipeline configuration.

Loaded from the committed YAML file ``slog_agent_spark/configs/
flagship.yml`` — written in the reference's config format (reference:
testdata/config_sample.yml) and verified on load by the YAML front-end
(plans/yaml_config.py), exactly like the reference parses + verifies its
config before starting (reference: run/config.go:64-134).

The module-level constants are the verified config's fields, kept for
the rest of the package; ``DEFAULT_CONFIG`` is the full object.
"""

from __future__ import annotations

from .yaml_config import PipelineConfig, load_config


def _load_default() -> PipelineConfig:
    # importlib.resources keeps this working when the package is imported
    # from the spark-submit --py-files zip (plain __file__ would not).
    from importlib.resources import files

    text = (
        files("slog_agent_spark")
        .joinpath("configs/flagship.yml")
        .read_text(encoding="utf-8")
    )
    from .yaml_config import parse_config

    return parse_config(text)


DEFAULT_CONFIG: PipelineConfig = _load_default()

SCHEMA_FIELDS = DEFAULT_CONFIG.schema_fields
EXTRACTIONS = DEFAULT_CONFIG.extractions
TRANSFORMATIONS = DEFAULT_CONFIG.transformations
ORCHESTRATION_KEYS = DEFAULT_CONFIG.orchestration_keys
ORCHESTRATION_TAG = DEFAULT_CONFIG.orchestration_tag
METRIC_KEYS = DEFAULT_CONFIG.metric_keys
OUTPUTS = DEFAULT_CONFIG.outputs
ALL_LABELS = DEFAULT_CONFIG.labels

__all__ = [
    "ALL_LABELS", "DEFAULT_CONFIG", "EXTRACTIONS", "METRIC_KEYS",
    "ORCHESTRATION_KEYS", "ORCHESTRATION_TAG", "OUTPUTS", "SCHEMA_FIELDS",
    "TRANSFORMATIONS", "PipelineConfig", "load_config",
]
