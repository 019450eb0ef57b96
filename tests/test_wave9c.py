"""Unit tests for the round-9 embedding wave: scalar-quantization
audit and matryoshka prefix energy."""

import pytest

from mdataframe_spark.operators.similarity import (
    matryoshka_energy,
    scalar_quantization_report,
)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )


def test_sq_error_bounded_by_half_step(spark):
    vecs = [[0.0, -1.0, 5.0], [1.0, 1.0, 5.0], [0.37, 0.22, 5.0]]
    df = _emb(spark, vecs)
    out = {r["p"]: r for r in scalar_quantization_report(df).collect()}
    assert set(out) == {0, 1, 2}
    # dim 0 spans [0, 1]: step = 1/255, max error <= step/2
    step0 = 1.0 / 255
    assert out[0]["x_min"] == 0.0 and out[0]["x_max"] == 1.0
    assert out[0]["max_abs_err"] <= step0 / 2 + 1e-12
    assert out[0]["mean_abs_err"] <= out[0]["max_abs_err"]
    # constant dimension quantizes losslessly
    assert out[2]["x_min"] == 5.0 and out[2]["x_max"] == 5.0
    assert out[2]["max_abs_err"] == 0.0
    assert out[2]["mean_abs_err"] == 0.0
    assert all(r["n"] == 3 for r in out.values())


def test_sq_endpoints_are_exact(spark):
    # min and max of each dimension reconstruct exactly (codes 0/255)
    vecs = [[-2.0], [3.0], [0.5]]
    out = scalar_quantization_report(_emb(spark, vecs)).collect()[0]
    # only the interior point can carry error; 0.5 sits EXACTLY on a
    # half-step tie, so the 9-dp rounded error can exceed step/2 by up
    # to 5e-10
    step = 5.0 / 255
    assert out["max_abs_err"] <= step / 2 + 1e-9
    assert out["n"] == 3


def test_sq_empty_input_yields_empty_frame(spark):
    out = scalar_quantization_report(_emb(spark, []).limit(0))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "p", "x_min", "x_max", "n", "mean_abs_err", "max_abs_err",
    ]


def test_matryoshka_energy_exact_fixture(spark):
    vecs = [
        [3.0, 4.0, 0.0, 0.0],  # all energy in the first 2 dims
        [0.0, 0.0, 3.0, 4.0],  # none of it
        [1.0, 1.0, 1.0, 1.0],  # half
    ]
    df = _emb(spark, vecs)
    out = {
        r["dim"]: r
        for r in matryoshka_energy(df, dims=(2, 4), full_dim=4).collect()
    }
    assert out[2]["n_vectors"] == 3
    assert out[2]["mean_energy"] == pytest.approx((1.0 + 0.0 + 0.5) / 3, abs=1e-6)
    assert out[2]["min_energy"] == 0.0
    assert out[2]["frac_above_90"] == pytest.approx(1 / 3, abs=1e-6)
    # full prefix is always lossless
    assert out[4]["mean_energy"] == pytest.approx(1.0, abs=1e-9)
    assert out[4]["min_energy"] == pytest.approx(1.0, abs=1e-9)


def test_matryoshka_zero_vectors_are_excluded(spark):
    df = _emb(spark, [[0.0, 0.0], [3.0, 4.0]])
    out = matryoshka_energy(df, dims=(1,), full_dim=2).collect()
    assert len(out) == 1
    assert out[0]["n_vectors"] == 1
    assert out[0]["mean_energy"] == pytest.approx(9 / 25, abs=1e-6)


def test_matryoshka_rejects_bad_dims(spark):
    df = _emb(spark, [[1.0, 2.0]])
    with pytest.raises(ValueError, match="outside"):
        matryoshka_energy(df, dims=(3,), full_dim=2)
