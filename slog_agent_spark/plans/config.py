"""The flagship pipeline configuration.

A Python-dict equivalent of the reference's full sample config
(reference: testdata/config_sample.yml), adapted to the transcript
field mapping (SURVEY.md §1.4): the RFC5424-ish header embedded in
``text`` is parsed into the same declared field set, then the same
extraction + transformation chain, orchestration keys, metric keys and
two outputs apply.
"""

from __future__ import annotations

# reference: testdata/config_sample.yml:36-37
SCHEMA_FIELDS = [
    "facility", "level", "time", "host", "app", "pid", "source",
    "extradata", "log", "class", "task", "vhost", "pnum",
    "ddsource", "ddtags", "hostname", "service", "svc_tier",
    "ip", "user_agent",
]

# reference: testdata/config_sample.yml:66-112 (input extractions)
EXTRACTIONS: list[dict] = [
    {"type": "extractHead", "key": "log", "pattern": r"\[*\] - ",
     "maxLen": 100, "destKey": "class"},
    {"type": "extractTail", "key": "source", "pattern": ":[0-9a-f-]",
     "maxLen": 41, "destKey": "task"},
    {"type": "extractTail", "key": "app", "pattern": "/*",
     "maxLen": 100, "destKey": "vhost"},
    {"type": "addFields", "fields": {"pnum": "${task[-1:]}"}},
    # plain named-group extract over the access-log bodies
    # (reference: transform/textract/textract.go:72-92)
    {"type": "extract", "key": "log",
     "pattern": r'ip=(?P<ip>[0-9.]+) time="[^"]*"'
                r' user_agent="(?P<user_agent>[^"]*)"'},
    {"type": "if",
     "match": {"class": ("str-any", ""), "task": ("str-any", "")},
     "then": [{"type": "addFields", "fields": {"task": "$task:$class"}}]},
    {"type": "delFields", "keys": ["facility", "pid", "extradata"]},
]

# reference: testdata/config_sample.yml:143-262 (transformations)
TRANSFORMATIONS: list[dict] = [
    {"type": "switch", "cases": [
        {"match": {"app": "appServ"}, "then": [
            {"type": "drop",
             "match": {"source": "auth.log", "level": ("str-not", "fatal")},
             "percentage": 100, "metricLabel": "app-auth"},
            {"type": "drop",
             "match": {"source": "main.log", "level": "warn"},
             "percentage": 33, "metricLabel": "downsampled"},
            {"type": "switch", "cases": [
                {"match": {"source": "access.log"}, "then": [
                    {"type": "if",
                     "match": {"log": ("glob", "P[OU][ST]** params=**")},
                     "then": [
                         {"type": "truncate", "key": "log", "maxLen": 180,
                          "suffix": " ... (cut)"},
                     ]},
                ]},
                {"match": {"task": ("len-lt", 1)}, "then": [
                    {"type": "redactEmail", "key": "log",
                     "metricLabel": "redacted"},
                ]},
            ]},
        ]},
        {"match": {"app": "abandoned"}, "then": [
            {"type": "addFields", "fields": {"log": "task=$task $log"}},
            {"type": "unescape", "key": "log"},
            {"type": "replace", "key": "log",
             "pattern": r'^(P(OS|U)T ".*".*params=.{145}).{15,}$',
             "replacement": "$1 ... (cut)"},
        ]},
    ]},
    {"type": "block", "steps": [
        {"type": "parseTime", "key": "time", "errorLabel": "timeError"},
        {"type": "delFields", "keys": ["time"]},
    ]},
    {"type": "addFields", "fields": {
        "ddsource": "transcripts",
        "hostname": "$host",
        "service": "$vhost",
        "svc_tier": "$level",
    }},
    # mapValue: severity → paging tier (dictionary lookup with default,
    # reference: transform/tmapvalue/tmapvalue.go:50-61)
    {"type": "mapValue", "key": "svc_tier",
     "mapping": {"fatal": "p0", "crit": "p0", "error": "p1", "warn": "p2"},
     "default": "p3"},
]

# reference: testdata/config_sample.yml:117-130
ORCHESTRATION_KEYS = ["app", "level", "pnum"]
ORCHESTRATION_TAG = "development.$app"
METRIC_KEYS = ["host", "vhost", "source"]

# reference: testdata/config_sample.yml:264-301 (output pairs)
OUTPUTS: dict[str, dict] = {
    "customFluentd": {
        "type": "fluentdForward",
        "environmentFields": ["host", "vhost", "app", "source"],
        "hiddenFields": [
            "task", "class", "pnum", "ddsource", "ddtags",
            "hostname", "service", "ip", "user_agent",
        ],
        "rewriteFields": {
            "log": [
                {"type": "inline", "field": "class"},
                {"type": "unescape"},
            ],
        },
    },
    "datadogAPI": {
        "type": "datadog",
        "hiddenFields": ["task", "class", "pnum", "ip", "user_agent"],
    },
}

ALL_LABELS = ["app-auth", "downsampled", "!downsampled", "redacted", "timeError"]
