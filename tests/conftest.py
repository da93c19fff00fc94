import json
import math
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def json_subset_eq(expected, actual, path="$"):
    """Subset equality as implemented by the reference's tests/json_eq.c:
    objects compare the EXPECTED keys only (extra actual keys tolerated),
    arrays compare exact length element-wise."""
    if isinstance(expected, dict):
        assert isinstance(actual, dict), f"{path}: expected object, got {type(actual).__name__}: {actual!r}"
        for k, v in expected.items():
            assert k in actual, f"{path}.{k}: missing (actual: {actual!r})"
            json_subset_eq(v, actual[k], f"{path}.{k}")
        return
    if isinstance(expected, list):
        assert isinstance(actual, list), f"{path}: expected array, got {actual!r}"
        assert len(expected) == len(actual), f"{path}: array length {len(actual)} != {len(expected)}"
        for i, (e, a) in enumerate(zip(expected, actual)):
            json_subset_eq(e, a, f"{path}[{i}]")
        return
    if isinstance(expected, float) or isinstance(actual, float):
        assert isinstance(actual, (int, float)) and isinstance(expected, (int, float)), (
            f"{path}: {actual!r} != {expected!r}"
        )
        assert math.isclose(float(expected), float(actual), rel_tol=1e-9), (
            f"{path}: {actual!r} != {expected!r}"
        )
        return
    assert expected == actual, f"{path}: {actual!r} != {expected!r}"


@pytest.fixture(scope="session")
def corpus():
    with open(os.path.join(os.path.dirname(__file__), "corpus", "cases.json")) as f:
        return json.load(f)


_spark_singleton = None


@pytest.fixture(scope="session")
def spark():
    global _spark_singleton
    if _spark_singleton is None:
        from liblognorm_spark.session import get_spark

        _spark_singleton = get_spark(app="tests", cpus=4, shuffle_partitions=8)
    return _spark_singleton
