"""YAML configuration front-end.

Parses pipeline configs written in the reference's YAML format
(reference: testdata/config_sample.yml) into the dict-step form the
chain compiler consumes, and verifies them against the declared schema
with precise, path-qualified errors (reference: run/config.go:64-134 —
every section is verified before anything runs, and a bad config names
the exact offending step).

Supported custom tags (reference: base/bmatch/valuematch.go:22-34):
    !!str-eq !!str-not !!str-any !!str-start !!str-end !!str-contain
    !!glob !!regex !!len-gt !!len-lt
Each becomes an ``(op, value)`` tuple in a match block; a bare scalar is
``str-eq``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from ..functions.match import OPS
from ..functions.template import template_fields

# ---------------------------------------------------------------------------
# YAML loading
# ---------------------------------------------------------------------------


class _ConfigLoader(yaml.SafeLoader):
    """SafeLoader + the reference's match-operator tags."""


def _make_op_constructor(op: str):
    def construct(loader, node):
        value = loader.construct_scalar(node)
        return (op, value if value is not None else "")

    return construct


for _op in OPS:
    if _op == "str-eq":
        continue  # bare scalars already mean str-eq
    _ConfigLoader.add_constructor(
        "tag:yaml.org,2002:" + _op, _make_op_constructor(_op)
    )
# !!str-eq explicitly → tuple as well
_ConfigLoader.add_constructor(
    "tag:yaml.org,2002:str-eq", _make_op_constructor("str-eq")
)


class ConfigError(ValueError):
    """A configuration verification failure, with the offending path."""

    def __init__(self, path: str, message: str):
        super().__init__(f"{path}: {message}")
        self.path = path


# ---------------------------------------------------------------------------
# The verified config object
# ---------------------------------------------------------------------------


@dataclass
class PipelineConfig:
    schema_fields: list[str]
    max_fields: int
    level_mapping: list[str]
    extractions: list[dict]
    transformations: list[dict]
    orchestration_type: str          # "byKeySet" | "singleton"
    orchestration_keys: list[str]
    orchestration_tag: str
    metric_keys: list[str]
    outputs: dict[str, dict]         # name -> serializer config
    output_limits: dict[str, dict] = field(default_factory=dict)
    labels: list[str] = field(default_factory=list)

    def __post_init__(self):
        if not self.labels:
            self.labels = collect_labels(self.extractions + self.transformations)


def collect_labels(steps: list[dict]) -> list[str]:
    """Metric labels in chain-walk order (drop adds "!label" for pct<100,
    reference: transform/tdrop/tdrop.go:41-44)."""
    labels: list[str] = []

    def walk(ss: list[dict]):
        for s in ss:
            t = s.get("type")
            if t == "drop":
                labels.append(s["metricLabel"])
                if int(s.get("percentage", 100)) < 100:
                    labels.append("!" + s["metricLabel"])
            elif t == "redactEmail" and s.get("metricLabel"):
                labels.append(s["metricLabel"])
            elif t == "parseTime" and s.get("errorLabel"):
                labels.append(s["errorLabel"])
            elif t == "if":
                walk(s.get("then", []))
            elif t == "switch":
                for case in s.get("cases", []):
                    walk(case.get("then", []))
            elif t == "block":
                walk(s.get("steps", []))

    walk(steps)
    # preserve first-seen order, drop duplicates (two steps may share one)
    seen: set[str] = set()
    out = []
    for lb in labels:
        if lb not in seen:
            seen.add(lb)
            out.append(lb)
    return out


# ---------------------------------------------------------------------------
# Verification
# ---------------------------------------------------------------------------

_TRANSFORM_TYPES = {
    "addFields", "block", "delFields", "drop", "extract", "extractHead",
    "extractTail", "if", "mapValue", "parseTime", "redactEmail",
    "replace", "switch", "truncate", "unescape",
}
_REWRITE_TYPES = {"inline", "unescape", "copy"}
_OUTPUT_TYPES = {"fluentdForward", "datadog"}


def _require(cond: bool, path: str, msg: str):
    if not cond:
        raise ConfigError(path, msg)


def _check_field(name, schema: set[str], path: str):
    _require(isinstance(name, str), path, f"field name must be a string, got {name!r}")
    _require(name in schema, path, f"field '{name}' not declared in schema")


def _check_template(tpl: str, schema: set[str], path: str):
    try:
        refs = template_fields(tpl)
    except ValueError as e:
        raise ConfigError(path, str(e)) from None
    for r in refs:
        _check_field(r, schema, path)


def _check_match(match, schema: set[str], path: str):
    _require(isinstance(match, dict) and match, path, "match block must be a non-empty mapping")
    for f, spec in match.items():
        _check_field(f, schema, path)
        if isinstance(spec, tuple):
            op, v = spec
            _require(op in OPS or op == "str", path, f"unknown match op '{op}'")
            if op in ("len-gt", "len-lt"):
                try:
                    int(v)
                except (TypeError, ValueError):
                    raise ConfigError(path, f"{op} needs an integer, got {v!r}") from None


def _check_steps(steps, schema: set[str], path: str):
    _require(isinstance(steps, list), path, "must be a list of steps")
    for i, s in enumerate(steps):
        p = f"{path}[{i}]"
        _require(isinstance(s, dict), p, "step must be a mapping")
        t = s.get("type")
        _require(t in _TRANSFORM_TYPES, p, f"unknown transform type '{t}'")
        p = f"{p}({t})"
        if t == "addFields":
            _require(isinstance(s.get("fields"), dict) and s["fields"], p, "needs .fields")
            for k, v in s["fields"].items():
                _check_field(k, schema, p)
                _check_template(str(v), schema, p)
        elif t == "block":
            _check_steps(s.get("steps", []), schema, p + ".steps")
        elif t == "delFields":
            for k in s.get("keys", []):
                _check_field(k, schema, p)
            _require(bool(s.get("keys")), p, "needs .keys")
        elif t == "drop":
            _check_match(s.get("match"), schema, p + ".match")
            pct = s.get("percentage", 100)
            _require(isinstance(pct, int) and 1 <= pct <= 100, p,
                     f".percentage must be between 1 and 100: {pct}")
            _require(bool(s.get("metricLabel")), p, ".metricLabel is unspecified")
        elif t == "extract":
            _check_field(s.get("key"), schema, p)
            import re as _re

            names = _re.findall(r"\(\?P?<([A-Za-z0-9_]+)>", str(s.get("pattern", "")))
            _require(bool(names), p, ".pattern needs named capture groups")
            for n in names:
                _check_field(n, schema, p)
        elif t in ("extractHead", "extractTail"):
            _check_field(s.get("key"), schema, p)
            _check_field(s.get("destKey"), schema, p)
            _require(bool(s.get("pattern")), p, "needs .pattern")
            _require(int(s.get("maxLen", 0)) > 0, p, ".maxLen must be positive")
        elif t == "if":
            _check_match(s.get("match"), schema, p + ".match")
            _check_steps(s.get("then", []), schema, p + ".then")
        elif t == "mapValue":
            _check_field(s.get("key"), schema, p)
            _require(isinstance(s.get("mapping"), dict) and s["mapping"], p, "needs .mapping")
        elif t == "parseTime":
            _check_field(s.get("key"), schema, p)
        elif t == "redactEmail":
            _check_field(s.get("key"), schema, p)
        elif t == "replace":
            _check_field(s.get("key"), schema, p)
            _require("pattern" in s and "replacement" in s, p,
                     "needs .pattern and .replacement")
        elif t == "switch":
            cases = s.get("cases")
            _require(isinstance(cases, list) and cases, p, "needs .cases")
            for j, case in enumerate(cases):
                cp = f"{p}.cases[{j}]"
                _check_match(case.get("match"), schema, cp + ".match")
                _check_steps(case.get("then", []), schema, cp + ".then")
        elif t == "truncate":
            _check_field(s.get("key"), schema, p)
            _require(int(s.get("maxLen", 0)) > 0, p, ".maxLen must be positive")
            _require("suffix" in s, p, ".suffix is required")
        elif t == "unescape":
            _check_field(s.get("key"), schema, p)


def _steps_as_dicts(steps):
    """Normalize loaded YAML steps (tuples from tags are already in our
    dict-step format; nothing to rewrite today, hook kept for evolution)."""
    return steps


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def parse_config(text: str) -> PipelineConfig:
    """Parse + verify a YAML config document."""
    try:
        doc = yaml.load(text, Loader=_ConfigLoader)
    except yaml.YAMLError as e:
        raise ConfigError("(yaml)", str(e)) from None
    _require(isinstance(doc, dict), "(root)", "config must be a mapping")

    schema_node = doc.get("schema") or {}
    fields = schema_node.get("fields") or []
    _require(isinstance(fields, list) and fields, "schema.fields", "must be a non-empty list")
    _require(len(set(fields)) == len(fields), "schema.fields", "duplicate field names")
    for f in fields:
        _require(isinstance(f, str) and f, "schema.fields", f"bad field name {f!r}")
    max_fields = int(schema_node.get("maxFields", len(fields)))
    _require(max_fields >= len(fields), "schema.maxFields",
             f"maxFields {max_fields} < declared field count {len(fields)}")
    schema = set(fields)

    inputs = doc.get("inputs") or []
    _require(isinstance(inputs, list) and len(inputs) == 1, "inputs",
             "exactly one input is supported")
    inp = inputs[0]
    _require(inp.get("type") == "syslog", "inputs[0].type",
             f"unknown input type '{inp.get('type')}'")
    level_mapping = [str(x) for x in inp.get("levelMapping") or []]
    _require(len(level_mapping) == 8, "inputs[0].levelMapping",
             "must map all 8 syslog severities")
    extractions = _steps_as_dicts(inp.get("extractions") or [])
    _check_steps(extractions, schema, "inputs[0].extractions")

    orch = doc.get("orchestration") or {}
    otype = orch.get("type")
    _require(otype in ("byKeySet", "singleton"), "orchestration.type",
             f"unknown orchestration type '{otype}'")
    keys = orch.get("keys") or []
    if otype == "byKeySet":
        _require(bool(keys), "orchestration.keys", "byKeySet requires keys")
    for k in keys:
        _check_field(k, schema, "orchestration.keys")
    tag = orch.get("tag") or ""
    _require(bool(tag), "orchestration.tag", "tag is required")
    if otype == "singleton":
        _require(not template_fields(tag), "orchestration.tag",
                 "singleton requires a static tag (no field expansion)")
    else:
        _check_template(tag, schema, "orchestration.tag")

    metric_keys = doc.get("metricKeys") or []
    # reference: run/config.go:136-148 — metricKeys must be non-empty and
    # disjoint from orchestration keys (overlap would double-list the
    # same grouping column in the counter table)
    _require(bool(metric_keys), "metricKeys", "metricKeys is empty")
    for i, k in enumerate(metric_keys):
        _check_field(k, schema, "metricKeys")
        _require(
            k not in keys, f"metricKeys[{i}]",
            f"field '{k}' cannot be listed in both .metricKeys and "
            ".orchestration/keys",
        )

    transformations = _steps_as_dicts(doc.get("transformations") or [])
    _check_steps(transformations, schema, "transformations")

    outputs: dict[str, dict] = {}
    output_limits: dict[str, dict] = {}
    pairs = doc.get("outputBufferPairs") or []
    _require(isinstance(pairs, list) and pairs, "outputBufferPairs",
             "at least one output is required")
    for j, pair in enumerate(pairs):
        pp = f"outputBufferPairs[{j}]"
        name = pair.get("name")
        _require(bool(name), pp + ".name", "name is required")
        _require(name not in outputs, pp + ".name", f"duplicate output '{name}'")
        out = pair.get("output") or {}
        otype2 = out.get("type")
        _require(otype2 in _OUTPUT_TYPES, pp + ".output.type",
                 f"unknown output type '{otype2}'")
        ser = out.get("serialization") or {}
        cfg = {"type": otype2}
        for key in ("environmentFields", "hiddenFields"):
            vals = ser.get(key) or []
            for f in vals:
                _check_field(f, schema, f"{pp}.output.serialization.{key}")
            cfg[key] = list(vals)
        rewrites = ser.get("rewriteFields") or {}
        for f, steps in rewrites.items():
            rp = f"{pp}.output.serialization.rewriteFields.{f}"
            _check_field(f, schema, rp)
            for st in steps:
                _require(st.get("type") in _REWRITE_TYPES, rp,
                         f"unknown rewrite type '{st.get('type')}'")
                if st.get("type") == "inline":
                    _check_field(st.get("field"), schema, rp)
        cfg["rewriteFields"] = rewrites
        outputs[name] = cfg
        # chunk/file caps (reference: output/fluentdforward/config.go:24-35)
        limits = {}
        buf = pair.get("buffer") or {}
        if buf.get("maxBufSize"):
            limits["maxBufSize"] = str(buf["maxBufSize"])
        if out.get("maxRecordsPerChunk"):
            limits["maxRecordsPerChunk"] = int(out["maxRecordsPerChunk"])
        output_limits[name] = limits

    return PipelineConfig(
        schema_fields=list(fields),
        max_fields=max_fields,
        level_mapping=level_mapping,
        extractions=extractions,
        transformations=transformations,
        orchestration_type=otype,
        orchestration_keys=list(keys),
        orchestration_tag=tag,
        metric_keys=list(metric_keys),
        outputs=outputs,
        output_limits=output_limits,
    )


def load_config(path: str) -> PipelineConfig:
    with open(path, encoding="utf-8") as fh:
        return parse_config(fh.read())


def validate_reload(old: PipelineConfig, new: PipelineConfig) -> None:
    """Verify ``new`` is a legal hot-reload of ``old``.

    Mirrors the reference's SIGHUP reload restrictions (reference:
    run/reloader.go:1-139, config_sample.yml:41-47): schema fields are
    append-only (never moved, renamed or removed — a record is a
    positional array), maxFields itself cannot change, inputs including
    extractions cannot change, orchestration type/keys/tag cannot change
    (queue dirs are derived from them); metric keys MAY change.
    Raises ConfigError on the first violation.
    """
    _require(new.max_fields == old.max_fields, "schema.maxFields",
             f"cannot change on reload ({old.max_fields} -> {new.max_fields})")
    n_old = len(old.schema_fields)
    _require(new.schema_fields[:n_old] == old.schema_fields, "schema.fields",
             "fields may only be appended on reload (no move/rename/remove)")
    _require(len(new.schema_fields) <= new.max_fields, "schema.fields",
             f"appended past maxFields ({len(new.schema_fields)} > {new.max_fields})")
    _require(new.level_mapping == old.level_mapping,
             "inputs[0].levelMapping", "cannot change on reload")
    _require(new.extractions == old.extractions,
             "inputs[0].extractions", "cannot change on reload")
    _require(new.orchestration_type == old.orchestration_type,
             "orchestration.type", "cannot change on reload")
    _require(new.orchestration_keys == old.orchestration_keys,
             "orchestration.keys", "cannot change on reload")
    _require(new.orchestration_tag == old.orchestration_tag,
             "orchestration.tag", "cannot change on reload")
