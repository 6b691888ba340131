"""Round-8 hardening pins: the hot-label cap on the blocking-key
similarity join (VERDICT r7 item 3) and the cached-persist slot
discriminator (ADVICE r7)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cap_hot_groups_drops_only_the_hot_label(spark):
    from go_integ_spark.operators.similarity import cap_hot_groups

    rows = [("hot", i) for i in range(9)] + [("cold", i) for i in range(3)]
    df = spark.createDataFrame(rows, "label string, vec_id int")
    out = cap_hot_groups(df, "label", cap=8).collect()
    assert {r["label"] for r in out} == {"cold"}
    assert sorted(r["vec_id"] for r in out) == [0, 1, 2]
    # at the cap exactly -> kept
    out2 = cap_hot_groups(df, "label", cap=9)
    assert out2.count() == 12


def test_threshold_join_cap_never_binds_on_gate_corpora(spark):
    """The exact-pair oracle contract holds only while no gate label
    exceeds the cap — pin the headroom so a testdata refresh that
    grows a label past it fails here, not as a driver hash-red."""
    from go_integ_spark.operators.similarity import THRESHOLD_JOIN_MAX_LABEL

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        biggest = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"))
            .collect()[0]["mx"]
        )
        assert biggest * 4 <= THRESHOLD_JOIN_MAX_LABEL, (
            f"{sf_dir}: largest label {biggest} is within 4x of the "
            f"{THRESHOLD_JOIN_MAX_LABEL} hot-label cap"
        )


def test_threshold_join_with_injected_hot_label(spark, tmp_path):
    """End-to-end: a label pushed past the cap contributes NO pairs,
    while the healthy labels' exact pair set is unchanged."""
    import numpy as np

    from go_integ_spark.operators import similarity as S

    rng = np.random.RandomState(7)
    n_hot = 40
    rows = []
    for i in range(n_hot):
        rows.append((i, 0, rng.normal(0, 1, 8).astype("float32").tolist()))
    for i in range(6):
        rows.append((n_hot + i, 1, rng.normal(0, 1, 8).astype("float32").tolist()))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    path = str(tmp_path / "embeddings.parquet")
    df.write.parquet(path)

    orig = S.THRESHOLD_JOIN_MAX_LABEL
    S.THRESHOLD_JOIN_MAX_LABEL = 32
    try:
        out = S.similarity_threshold_join(spark, str(tmp_path)).collect()
    finally:
        S.THRESHOLD_JOIN_MAX_LABEL = orig
    assert all(r["label"] == 1 for r in out)
    # the uncapped run over label 1 alone gives the same pairs
    S_pairs = {(r["vec_a"], r["vec_b"]) for r in out}
    full = S.similarity_threshold_join(spark, str(tmp_path)).collect()
    full_pairs = {(r["vec_a"], r["vec_b"]) for r in full if r["label"] == 1}
    assert S_pairs == full_pairs
