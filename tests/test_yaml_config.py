"""YAML config front-end: loading + verification errors.

reference: run/config.go:64-134 (parse + verify with precise errors) and
testdata/config_sample.yml (the format).
"""

import pytest

from slog_agent_spark.plans.config import DEFAULT_CONFIG
from slog_agent_spark.plans.yaml_config import (
    ConfigError,
    collect_labels,
    parse_config,
)

MINIMAL = """
schema:
  fields: [facility, level, time, host, app, pid, source, extradata, log]
inputs:
  - type: syslog
    levelMapping: ['off', fatal, crit, error, warn, notice, info, debug]
    extractions: []
orchestration:
  type: byKeySet
  keys: [app, level]
  tag: dev.$app
metricKeys: [host]
transformations: []
outputBufferPairs:
  - name: out
    output:
      type: datadog
      serialization:
        hiddenFields: [host]
"""


def test_minimal_config_parses():
    cfg = parse_config(MINIMAL)
    assert cfg.orchestration_keys == ["app", "level"]
    assert cfg.outputs["out"]["type"] == "datadog"
    assert cfg.level_mapping[0] == "off"  # YAML 1.1 'off' must stay a string


def test_flagship_yaml_is_the_default_config():
    # the committed flagship.yml IS the pipeline the oracle gate checks
    assert DEFAULT_CONFIG.orchestration_tag == "development.$app"
    assert DEFAULT_CONFIG.labels == [
        "app-auth", "downsampled", "!downsampled", "redacted", "timeError",
    ]
    assert "ip" in DEFAULT_CONFIG.schema_fields
    types = [s["type"] for s in DEFAULT_CONFIG.transformations]
    assert types == ["switch", "block", "addFields", "mapValue"]


def test_match_op_tags_become_tuples():
    cfg = parse_config(
        MINIMAL.replace(
            "transformations: []",
            """transformations:
  - type: if
    match:
      app: !!str-not sshd
      log: !!glob 'P[OU][ST]**'
      host: !!len-gt 3
      source: !!str-any
    then:
      - type: delFields
        keys: [pid]
""",
        )
    )
    m = cfg.transformations[0]["match"]
    assert m["app"] == ("str-not", "sshd")
    assert m["log"] == ("glob", "P[OU][ST]**")
    assert m["host"] == ("len-gt", "3")
    assert m["source"] == ("str-any", "")


@pytest.mark.parametrize(
    "mutate,expect",
    [
        # unknown field in a transform
        (
            (
                "transformations: []",
                "transformations:\n  - type: delFields\n    keys: [nope]\n",
            ),
            "field 'nope' not declared",
        ),
        # unknown transform type
        (
            (
                "transformations: []",
                "transformations:\n  - type: frobnicate\n    key: log\n",
            ),
            "unknown transform type 'frobnicate'",
        ),
        # drop needs metricLabel
        (
            (
                "transformations: []",
                "transformations:\n"
                "  - type: drop\n    match: {app: x}\n    percentage: 50\n",
            ),
            ".metricLabel is unspecified",
        ),
        # drop percentage bounds
        (
            (
                "transformations: []",
                "transformations:\n"
                "  - type: drop\n    match: {app: x}\n    percentage: 0\n"
                "    metricLabel: z\n",
            ),
            "percentage must be between 1 and 100",
        ),
        # orchestration key must be declared
        (("keys: [app, level]", "keys: [app, missing]"), "field 'missing'"),
        # template in tag must reference schema fields
        (("tag: dev.$app", "tag: dev.$ghost"), "field 'ghost'"),
        # singleton requires a static tag
        (
            ("type: byKeySet", "type: singleton"),
            "static tag",
        ),
        # duplicate schema fields
        (
            ("fields: [facility, level,", "fields: [facility, facility, level,"),
            "duplicate field names",
        ),
        # unknown output type
        (("type: datadog", "type: carrier-pigeon"), "unknown output type"),
        # metricKeys must be non-empty (reference: run/config.go:136-139)
        (("metricKeys: [host]", "metricKeys: []"), "metricKeys is empty"),
        # metricKeys disjoint from orchestration keys (run/config.go:143-147)
        (
            ("metricKeys: [host]", "metricKeys: [host, app]"),
            "cannot be listed in both",
        ),
    ],
)
def test_verification_errors(mutate, expect):
    old, new = mutate
    text = MINIMAL.replace(old, new)
    assert text != MINIMAL
    with pytest.raises(ConfigError, match=expect):
        parse_config(text)


def test_collect_labels_nested():
    steps = [
        {"type": "switch", "cases": [
            {"match": {"a": "x"}, "then": [
                {"type": "drop", "match": {"a": "y"}, "percentage": 50,
                 "metricLabel": "ds"},
            ]},
        ]},
        {"type": "block", "steps": [
            {"type": "parseTime", "key": "time", "errorLabel": "te"},
        ]},
        {"type": "redactEmail", "key": "log", "metricLabel": "red"},
    ]
    assert collect_labels(steps) == ["ds", "!ds", "te", "red"]
