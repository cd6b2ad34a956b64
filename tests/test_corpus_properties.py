"""Property tests pinning the round-5 operators against INDEPENDENT
Python models (DuckDB-executed — the dual-dialect generators share one
SQL skeleton, and Spark parity is pinned by the driver gate +
test_parity/test_eventops):

- as-of enrich vs a per-probe brute-force scan (greatest mark ts at or
  before the probe; ties on ts resolve to the greatest event_id)
- bounded-window attribution vs the naive O(n^2) pair filter
- boilerplate span removal vs a direct positional-shingle model
"""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from slog_agent_spark.functions.dialect import DUCKDB
from slog_agent_spark.operators.eventops import asof_enrich_sql, window_attrib_sql
from slog_agent_spark.operators.textops import (
    BOILERPLATE_NGRAM,
    boilerplate_sql,
)

US = 1_000_000

# small discrete domains force collisions (same user, same ts, dup text)
events_strategy = st.lists(
    st.tuples(
        st.integers(0, 20),                      # epoch seconds
        st.integers(1, 3),                       # user_id
        st.sampled_from(["view", "purchase"]),   # event_type
        st.integers(0, 9),                       # value (small ints)
    ),
    min_size=1,
    max_size=25,
)


def _events_rel(rows):
    vals = ", ".join(
        f"({eid}, to_timestamp({ts}), {uid}, '{et}', CAST({v} AS DOUBLE))"
        for eid, (ts, uid, et, v) in enumerate(rows)
    )
    return f"(VALUES {vals}) ev(event_id, ts, user_id, event_type, value)"


@settings(max_examples=60, deadline=None)
@given(events_strategy)
def test_asof_matches_bruteforce(rows):
    got = {
        r[0]: (r[4], r[7])
        for r in duckdb.connect()
        .execute(asof_enrich_sql(DUCKDB, rel=_events_rel(rows)))
        .fetchall()
    }
    evs = [(eid, ts, uid, et, v) for eid, (ts, uid, et, v) in enumerate(rows)]
    probes = [e for e in evs if e[3] == "purchase"]
    marks = [e for e in evs if e[3] == "view"]
    assert set(got) == {p[0] for p in probes}
    for eid, ts, uid, _, _ in probes:
        cands = [m for m in marks if m[2] == uid and m[1] <= ts]
        if not cands:
            assert got[eid] == (None, None)
        else:
            best = max(cands, key=lambda m: (m[1], m[0]))
            assert got[eid] == (best[0], (ts - best[1]) * US)


@settings(max_examples=60, deadline=None)
@given(events_strategy, st.integers(1, 8))
def test_window_attrib_matches_bruteforce(rows, horizon):
    got = sorted(
        (r[0], r[1])
        for r in duckdb.connect()
        .execute(
            window_attrib_sql(
                DUCKDB, rel=_events_rel(rows), horizon_sec=horizon
            )
        )
        .fetchall()
    )
    evs = [(eid, ts, uid, et) for eid, (ts, uid, et, _) in enumerate(rows)]
    want = sorted(
        (p[0], m[0])
        for p in evs if p[3] == "purchase"
        for m in evs if m[3] == "view"
        if m[2] == p[2] and m[1] <= p[1] and (p[1] - m[1]) < horizon
    )
    assert got == want


# lowercase single-space docs: tokens_expr reduces to str.split(' ')
docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1,
        max_size=10,
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


def _model_boilerplate(texts, min_docs):
    n = BOILERPLATE_NGRAM
    toks = [t.split(" ") for t in texts]
    # positional shingles exactly as shingles_expr: pos 1..max(n_t-2, 1),
    # shingle = join of up to 3 tokens from pos (short docs yield one
    # shorter shingle)
    posts = [
        [(p, " ".join(t[p:p + n])) for p in range(max(len(t) - n + 1, 1))]
        for t in toks
    ]
    from collections import defaultdict

    df = defaultdict(set)
    for doc, post in enumerate(posts):
        for _, sh in post:
            df[sh].add(doc)
    common = {sh for sh, docs in df.items() if len(docs) >= min_docs}
    out = {}
    for doc, (t, post) in enumerate(zip(toks, posts)):
        hits = [p for p, sh in post if sh in common]
        cov = {
            c for p in hits for c in range(p, min(p + n, len(t)))
        }
        clean = " ".join(tok for i, tok in enumerate(t) if i not in cov)
        out[doc] = (
            len(t), len(hits), len(cov),
            round(len(cov) / max(len(t), 1), 6),
            hashlib.md5(clean.encode()).hexdigest(),
        )
    return out


@settings(max_examples=40, deadline=None)
@given(docs_strategy, st.integers(1, 4))
def test_boilerplate_matches_positional_model(texts, min_docs):
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    rel = f"(VALUES {vals}) docs(doc_id, text)"
    got = {
        r[0]: tuple(r[1:])
        for r in duckdb.connect()
        .execute(boilerplate_sql(DUCKDB, rel=rel, min_docs=min_docs))
        .fetchall()
    }
    assert got == _model_boilerplate(texts, min_docs)


# all three funnel step types, tight time range so chains form and break
funnel_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 20),
        st.integers(1, 3),
        st.sampled_from(["view", "click", "purchase"]),
        st.integers(0, 9),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=60, deadline=None)
@given(funnel_events_strategy, st.integers(1, 10))
def test_funnel_matches_bruteforce(rows, horizon):
    from slog_agent_spark.operators.eventops import funnel_sql

    got = {
        r[0]: r[1:]
        for r in duckdb.connect()
        .execute(
            funnel_sql(
                DUCKDB, rel=_events_rel(rows), step_horizon_sec=horizon
            )
        )
        .fetchall()
    }
    evs = [(ts * US, uid, et) for ts, uid, et, _ in rows]
    users = {uid for _, uid, _ in evs}
    assert set(got) == users
    h_us = horizon * US
    for uid in users:
        mine = [(t, et) for t, u, et in evs if u == uid]
        want = []
        prev = None  # earliest valid ts of the previous step, or None
        for step in ("view", "click", "purchase"):
            if want and want[-1] == -1:
                want.append(-1)
                continue
            cand = [
                t for t, et in mine
                if et == step
                and (prev is None or prev <= t <= prev + h_us)
            ]
            prev = min(cand) if cand else None
            want.append(prev if prev is not None else -1)
        assert got[uid] == (*want, all(w != -1 for w in want)), (uid, want)


# tiny alphabet, short words: dense pair collisions and ties
bpe_docs_strategy = st.lists(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=5), min_size=1,
        max_size=8,
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


def _model_bpe(texts, rounds):
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    words = {w: (list(w), c) for w, c in vocab.items()}
    merges = []
    for k in range(1, rounds + 1):
        pairs = Counter()
        for syms, c in words.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(ch) for ch in kv[0][0]], [-ord(ch) for ch in kv[0][1]]))
        # tie rule: count DESC then lexicographic ASC on (left, right)
        top_count = max(pairs.values())
        cands = sorted(p for p, c in pairs.items() if c == top_count)
        left, right = cands[0]
        merges.append((k, left, right, left + right, top_count))
        for w, (syms, c) in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, c)
    return merges


@settings(max_examples=40, deadline=None)
@given(bpe_docs_strategy, st.integers(1, 6))
def test_bpe_merges_match_reference_model(texts, rounds):
    from slog_agent_spark.operators.textops import bpe_merges_sql

    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    rel = f"(VALUES {vals}) docs(doc_id, text)"
    got = duckdb.connect().execute(
        bpe_merges_sql(DUCKDB, rel=rel, rounds=rounds)
    ).fetchall()
    assert got == _model_bpe(texts, rounds)
