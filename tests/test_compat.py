"""satya-compatible facade: the reference's own validator-API usage
patterns (tests/test_validator.py:13-168) run unchanged against the
Spark-backed StreamValidator."""

from __future__ import annotations

import pytest

from satya_spark.compat import StreamValidator


@pytest.fixture()
def validator(spark):
    v = StreamValidator(spark)
    v.add_field("name", "str", required=True)
    v.add_field("age", "int", required=True)
    v.add_field("email", "email", required=False)
    v.set_constraints("name", min_length=2, max_length=10)
    v.set_constraints("age", ge=0, le=150)
    return v


def test_validate_single(validator):
    ok = validator.validate({"name": "ann", "age": 30})
    assert ok.is_valid and ok.value == {"name": "ann", "age": 30}
    bad = validator.validate({"name": "x", "age": -1, "email": "nope"})
    assert not bad.is_valid
    assert {e.field for e in bad.errors} == {"name", "age", "email"}
    with pytest.raises(ValueError):
        _ = bad.value


def test_validate_batch_bools(validator):
    out = validator.validate_batch(
        [
            {"name": "ann", "age": 30},
            {"name": "x", "age": 30},
            {"age": 30},  # missing required name
            {"name": "bob", "age": 200},
        ]
    )
    assert out == [True, False, False, False]


def test_validate_stream_lazy(validator):
    items = ({"name": f"user{i}", "age": i % 100} for i in range(25))
    results = list(validator.validate_stream(items, batch_size=10))
    assert len(results) == 25 and all(r.is_valid for r in results)


def test_unknown_constraint_rejected(validator):
    with pytest.raises(ValueError, match="unknown constraints"):
        validator.set_constraints("name", sparkle=True)


def test_enum_and_pattern_via_compat(spark):
    v = StreamValidator(spark)
    v.add_field("status", "str")
    v.set_constraints("status", enum=["active", "inactive"])
    assert v.validate_batch([{"status": "active"}, {"status": "zz"}]) == [
        True,
        False,
    ]
