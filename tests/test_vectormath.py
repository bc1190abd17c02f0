"""Known-answer vector math tests — mirrors the reference's epsilon tests
(src/vector.rs:124-187, src/distance.rs:75-144; FIXTURES.md §3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import vectormath as vm

EPS = 1e-6


@pytest.fixture(scope="module")
def lit_df(spark):
    rows = [
        ("basic", [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        ("identical", [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        ("orthogonal", [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        ("opposite", [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]),
        ("zero", [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),
        ("threefour", [3.0, 4.0], [0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "name string, a array<double>, b array<double>")


def _by_name(df, cols):
    return {r["name"]: r for r in df.select("name", *cols).collect()}


def test_euclidean_known_value(lit_df):
    # reference: euclid([1,2,3],[4,5,6]) = 5.196152 (src/distance.rs:81-86)
    r = _by_name(lit_df.withColumn("d", vm.euclidean_distance("a", "b")), ["d"])
    assert abs(r["basic"]["d"] - 5.196152) < 1e-5
    assert r["identical"]["d"] == 0.0


def test_dot_product_known_value(lit_df):
    # reference: dot([1,2,3],[4,5,6]) = 32.0 (src/distance.rs:96-101)
    r = _by_name(lit_df.withColumn("d", vm.dot_product("a", "b")), ["d"])
    assert abs(r["basic"]["d"] - 32.0) < EPS
    assert abs(r["orthogonal"]["d"]) < EPS


def test_cosine_known_values(lit_df):
    # identical→0, orthogonal→1, opposite→2 (src/distance.rs:104-125)
    r = _by_name(lit_df.withColumn("d", vm.cosine_distance("a", "b")), ["d"])
    assert abs(r["identical"]["d"] - 0.0) < EPS
    assert abs(r["orthogonal"]["d"] - 1.0) < EPS
    assert abs(r["opposite"]["d"] - 2.0) < EPS


def test_cosine_zero_vector_is_null(lit_df):
    # reference raises on zero vector (src/distance.rs:51-55); ours → NULL
    r = _by_name(lit_df.withColumn("d", vm.cosine_distance("a", "b")), ["d"])
    assert r["zero"]["d"] is None


def test_norm_and_normalize(lit_df):
    # norm([3,4]) = 5; normalized([3,4]) = [0.6, 0.8] (src/vector.rs:137-149)
    r = _by_name(
        lit_df.withColumn("n", vm.norm("a")).withColumn("u", vm.normalize("a")), ["n", "u"]
    )
    assert abs(r["threefour"]["n"] - 5.0) < EPS
    assert all(abs(x - y) < EPS for x, y in zip(r["threefour"]["u"], [0.6, 0.8]))
    assert r["zero"]["u"] is None  # zero vector → NULL (ref raises, src/vector.rs:42-45)


def test_negated_dot_metric(lit_df):
    # DotProduct distance is negated so smaller = closer (src/distance.rs:31)
    r = _by_name(lit_df.withColumn("d", vm.distance("dot", "a", "b")), ["d"])
    assert abs(r["basic"]["d"] + 32.0) < EPS


def test_parse_vector(spark):
    df = spark.createDataFrame([("1.0, 2.5 ,3",), ("bad,2.0",)], "s string")
    got = df.select(vm.parse_vector("s").alias("v")).collect()
    assert got[0]["v"] == [1.0, 2.5, 3.0]
    assert got[1]["v"][0] is None  # bad float → NULL element (ref raises)


def test_add_sub_scale(lit_df):
    r = _by_name(
        lit_df.select(
            "name",
            vm.vec_add("a", "b").alias("s"),
            vm.vec_sub("a", "b").alias("m"),
            vm.vec_scale("a", 2.0).alias("x"),
        ),
        ["s", "m", "x"],
    )
    assert r["basic"]["s"] == [5.0, 7.0, 9.0]
    assert r["basic"]["m"] == [-3.0, -3.0, -3.0]
    assert r["basic"]["x"] == [2.0, 4.0, 6.0]


def test_norm_matches_python(embeddings):
    row = embeddings.select("embedding", vm.norm("embedding").alias("n")).first()
    expect = math.sqrt(sum(float(x) * float(x) for x in row.embedding))
    assert abs(row.n - expect) < 1e-9


class TestSQ8:
    def _staged(self, spark, rows):
        from vectordb_from_scratch_spark.functions import vectormath as vm

        df = spark.createDataFrame(rows, "id long, v array<double>")
        v = F.col("v")
        return df.select(
            "id", "v",
            F.array_min(v).alias("vmin"),
            F.array_max(v).alias("vmax"),
            vm.sq8_scale(v).alias("scale"),
        )

    def test_codes_range_and_extremes(self, spark):
        from vectordb_from_scratch_spark.functions import vectormath as vm

        s = self._staged(spark, [(1, [-2.0, 0.0, 1.0, 6.0])])
        r = s.select(
            vm.sq8_encode("v", F.col("vmin"), F.col("scale")).alias("codes")
        ).first()
        assert r.codes[0] == 0 and r.codes[-1] == 255
        assert all(0 <= c <= 255 for c in r.codes)

    def test_roundtrip_error_bounded_by_half_step(self, spark):
        from vectordb_from_scratch_spark.functions import vectormath as vm

        rows = [(i, [float(j * i % 17) - 8.0 for j in range(32)]) for i in range(1, 40)]
        s = self._staged(spark, rows)
        dec = s.withColumn(
            "dec",
            vm.sq8_decode(
                vm.sq8_encode("v", F.col("vmin"), F.col("scale")),
                F.col("vmin"), F.col("scale"),
            ),
        )
        bad = dec.select(
            F.array_max(
                F.zip_with("v", "dec", lambda a, b: F.abs(a - b))
            ).alias("err"),
            (F.col("scale") / 2 + 1e-12).alias("bound"),
        ).filter(F.col("err") > F.col("bound"))
        assert bad.isEmpty()

    def test_constant_vector_decodes_exactly(self, spark):
        from vectordb_from_scratch_spark.functions import vectormath as vm

        s = self._staged(spark, [(1, [3.5, 3.5, 3.5])])
        r = s.select(
            vm.sq8_decode(
                vm.sq8_encode("v", F.col("vmin"), F.col("scale")),
                F.col("vmin"), F.col("scale"),
            ).alias("dec")
        ).first()
        assert r.dec == [3.5, 3.5, 3.5]


def test_bq_encode_words_matches_reference_packing(spark):
    from vectordb_from_scratch_spark.functions import vectormath as vm

    vec = [1.0, -2.0, 0.0, 3.0] + [-1.0] * 28 + [5.0] + [-1.0] * 31
    # bits set where v[j] > 0: j=0, j=3 in word0 -> 1 + 8 = 9; j=32 -> bit 0 of word1
    df = spark.createDataFrame([(1, vec)], "id long, v array<double>")
    w = vm.bq_encode_words("v")
    r = df.select(w[0].alias("w0"), w[1].alias("w1")).collect()[0]
    assert r.w0 == 0b1001
    assert r.w1 == 1


def test_hamming_words_counts_bit_flips(spark):
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.functions import vectormath as vm

    df = spark.createDataFrame([(0b1010, 0b0110, 0, 1)], "a0 long, b0 long, a1 long, b1 long")
    h = vm.hamming_words([F.col("a0"), F.col("a1")], [F.col("b0"), F.col("b1")])
    assert df.select(h.alias("h")).collect()[0].h == 3  # 2 flips in w0 + 1 in w1
