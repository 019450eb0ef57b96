import pytest

from mdataframe_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("mdataframe_spark_tests", shuffle_partitions=4)
    yield spark


@pytest.fixture
def test_frame(spark):
    """The reference's canonical 4-gene × 6-sample count fixture
    (reference: tests/conftest.py:44-57), as a Spark DataFrame with an
    explicit __row_id index column."""
    rows = [
        ("genA", 23, 2, 21, 23, 3, 4),
        ("genB", 12, 14, 14, 4, 4, 5),
        ("genC", 9, 6, 6, 21, 22, 23),
        ("genD", 40, 80, 80, 90, 90, 80),
    ]
    cols = ["__row_id", "sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3"]
    return spark.createDataFrame(rows, cols)


@pytest.fixture
def samples_to_group():
    return {
        "sampleA_1": "A",
        "sampleA_2": "A",
        "sampleA_3": "A",
        "sampleB_1": "B",
        "sampleB_2": "B",
        "sampleB_3": "B",
    }


@pytest.fixture
def stats_frame(spark):
    """Filter-DSL fixture (reference: tests/test_filter.py:10-20)."""
    rows = [
        ("A", 2.0, 0.1, "A", 3.0),
        ("B", 1.0, 0.001, "B", 2.0),
        ("C", -9.0, 0.4, "A", -8.0),
        ("D", 0.0, 0.2, "C", 0.0),
    ]
    return spark.createDataFrame(rows, ["__row_id", "log", "fdr", "type", "cnt"])
