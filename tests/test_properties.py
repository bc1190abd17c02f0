"""Property-based tests (hypothesis) — a layer the reference lacks
entirely (proptest is in its dev-deps but never used, SURVEY §5).

Model-checked properties:
- fold_insert_log ≡ a sequential dict replay of the same log
- compile_filter ≡ a Python evaluator over the same metadata maps
- minhash similarity is permutation-invariant over shingle order
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vectordb_from_scratch_spark.operators import crud
from vectordb_from_scratch_spark.operators.filters import compile_filter

IDS = ["a", "b", "c", "d"]

log_entries = st.lists(
    st.tuples(
        st.sampled_from(["insert", "delete"]),
        st.sampled_from(IDS),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=0,
    max_size=12,
)


def _model_replay(entries):
    state = {}
    for op, id_, v in entries:
        if op == "insert":
            state[id_] = v
        else:
            state.pop(id_, None)  # set-oriented delete: absent id is a no-op
    return state


@given(log_entries)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_fold_matches_sequential_replay(spark_global, entries):
    spark = spark_global
    rows = [
        (seq, op, id_, [float(v)], {"v": str(v)})
        for seq, (op, id_, v) in enumerate(entries)
    ]
    log = spark.createDataFrame(rows, crud.LOG_SCHEMA) if rows else spark.createDataFrame([], crud.LOG_SCHEMA)
    got = {r.id: r.embedding[0] for r in crud.fold_insert_log(log).collect()}
    expect = {k: float(v) for k, v in _model_replay(entries).items()}
    assert got == expect


@given(log_entries, st.lists(st.integers(min_value=-1, max_value=12), min_size=1, max_size=4, unique=True))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_time_travel_matches_prefix_replay(spark_global, entries, as_ofs):
    """Every version from time_travel equals the model replay of the log
    prefix seq <= as_of (including as_of before the first entry and past
    the head)."""
    spark = spark_global
    rows = [
        (seq, op, id_, [float(v)], {"v": str(v)})
        for seq, (op, id_, v) in enumerate(entries)
    ]
    log = (
        spark.createDataFrame(rows, crud.LOG_SCHEMA)
        if rows
        else spark.createDataFrame([], crud.LOG_SCHEMA)
    )
    got = {}
    for r in crud.time_travel(log, as_ofs).collect():
        got.setdefault(r.as_of, {})[r.id] = r.embedding[0]
    for t in as_ofs:
        expect = {
            k: float(v) for k, v in _model_replay(entries[: t + 1]).items()
        }
        assert got.get(t, {}) == expect, f"as_of={t}"


meta_maps = st.dictionaries(
    st.sampled_from(["color", "size", "kind"]),
    st.sampled_from(["red", "blue", "big"]),
    max_size=3,
)

filter_specs = st.recursive(
    st.one_of(
        st.builds(lambda f, v: {"eq": {"field": f, "value": v}},
                  st.sampled_from(["color", "size", "kind"]), st.sampled_from(["red", "blue"])),
        st.builds(lambda f, v: {"ne": {"field": f, "value": v}},
                  st.sampled_from(["color", "size", "kind"]), st.sampled_from(["red", "blue"])),
        st.builds(lambda f: {"exists": {"field": f}}, st.sampled_from(["color", "size", "kind"])),
    ),
    lambda children: st.one_of(
        st.builds(lambda a, b: {"and": [a, b]}, children, children),
        st.builds(lambda a, b: {"or": [a, b]}, children, children),
    ),
    max_leaves=4,
)


def _model_eval(spec, meta) -> bool:
    (op, body), = spec.items()
    if op == "eq":
        return meta.get(body["field"]) == body["value"]
    if op == "ne":
        # reference semantics: absent field passes ne (src/storage.rs:65)
        return meta.get(body["field"]) != body["value"]
    if op == "exists":
        return body["field"] in meta
    if op == "and":
        return all(_model_eval(s, meta) for s in body)
    if op == "or":
        return any(_model_eval(s, meta) for s in body)
    raise AssertionError(op)


@given(st.lists(meta_maps, min_size=1, max_size=6), filter_specs)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_filter_compiler_matches_model(spark_global, metas, spec):
    spark = spark_global
    rows = [(i, m) for i, m in enumerate(metas)]
    df = spark.createDataFrame(rows, "id long, metadata map<string,string>")
    got = {r.id for r in df.filter(compile_filter(spec)).collect()}
    expect = {i for i, m in enumerate(metas) if _model_eval(spec, m)}
    assert got == expect


asof_events = st.lists(
    st.tuples(st.sampled_from(["A", "B"]), st.integers(min_value=0, max_value=50)),
    min_size=1, max_size=15,
)


@given(asof_events, asof_events)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_pandas_merge_asof(spark_global, left_rows, right_rows):
    """asof_join ≡ pandas merge_asof (backward direction) on the same data —
    an independent reference implementation of the operator's semantics."""
    import pandas as pd

    from vectordb_from_scratch_spark.operators.asof import asof_join

    spark = spark_global
    # de-dup (key, time) on the right: merge_asof picks the LAST among
    # exact duplicates and our sweep picks max payload — align by making
    # right times unique per key (real quotes have unique timestamps)
    seen = set()
    rr = []
    for i, (k, t) in enumerate(right_rows):
        if (k, t) not in seen:
            seen.add((k, t))
            rr.append((k, t, 100 + i))
    lf = [(i, k, t) for i, (k, t) in enumerate(left_rows)]

    left = spark.createDataFrame(lf, "lid long, k string, t long")
    right = spark.createDataFrame(rr, "k string, t long, price long")
    got = {
        r.lid: r.price_asof
        for r in asof_join(left, right, on="k", left_time="t", right_time="t",
                           right_cols=["price"]).collect()
    }

    lp = pd.DataFrame(lf, columns=["lid", "k", "t"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(rr, columns=["k", "t", "price"]).sort_values("t", kind="stable")
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    expect = {
        int(row.lid): (None if pd.isna(row.price) else int(row.price))
        for row in merged.itertuples()
    }
    assert got == expect


# --- pii_scrub properties -------------------------------------------------

pii_free_text = st.text(
    alphabet=st.sampled_from(list("abcdefghijklmnop qrstuvwxyz")),
    min_size=0,
    max_size=60,
)


@given(pii_free_text)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_pii_scrub_leaves_pii_free_text_unchanged(spark_global, text):
    """Letters-and-spaces text has no emails/IPs/phones — the scrub must
    be the identity on it and count zero redactions."""
    from vectordb_from_scratch_spark.operators.textops import pii_scrub

    df = spark_global.createDataFrame([(1, text)], "doc_id long, text string")
    r = pii_scrub(df).collect()[0]
    assert r.scrubbed == text
    assert r.n_email == r.n_ipv4 == r.n_phone == 0


@given(pii_free_text)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_pii_scrub_idempotent(spark_global, text):
    """scrub(scrub(x)) == scrub(x): the replacement token itself must
    never re-match a pattern, whatever PII the input embeds."""
    from vectordb_from_scratch_spark.operators.textops import pii_scrub

    seeded = f"{text} a@b.io 10.1.2.3 +1 555 0100 99 {text}"
    df = spark_global.createDataFrame([(1, seeded)], "doc_id long, text string")
    once = pii_scrub(df).collect()[0].scrubbed
    df2 = spark_global.createDataFrame([(1, once)], "doc_id long, text string")
    twice = pii_scrub(df2).collect()[0]
    assert twice.scrubbed == once
    assert twice.n_email == twice.n_ipv4 == twice.n_phone == 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=st.lists(
        st.lists(st.floats(-1.0, 1.0, allow_nan=False, width=32), min_size=3, max_size=3),
        min_size=1, max_size=12,
    ),
    radius=st.floats(0.1, 2.5),
)
def test_radius_ball_matches_bruteforce(spark_global, vecs, radius):
    """Ball membership == driver-side exact filter, any data, any radius."""
    import math

    from vectordb_from_scratch_spark.operators import knn

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark_global.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = spark_global.createDataFrame(
        [rows[0]], "query_id long, query_embedding array<double>"
    )
    got = {r.id for r in knn.radius_search(
        df, probes, radius=radius, strategy="window").collect()}
    q = rows[0][1]
    want = {
        i for i, v in rows
        if math.sqrt(sum((a - b) ** 2 for a, b in zip(v, q))) <= radius
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=0, max_size=20
    )
)
def test_triangle_count_matches_bruteforce(spark_global, edges):
    """Per-vertex counts == itertools enumeration on arbitrary small
    graphs (self-loops and duplicate/mirrored edges included)."""
    from itertools import combinations

    from vectordb_from_scratch_spark.operators import graph

    undirected = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in undirected for n in e}
    want = {n: 0 for n in nodes}
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (a, c), (b, c)} <= undirected:
            for n in (a, b, c):
                want[n] += 1
    if not edges:
        edges = [(0, 0)]  # createDataFrame needs ≥0 rows with schema; keep a loop row
    df = spark_global.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in graph.triangle_count(df).collect()}
    assert got == want
