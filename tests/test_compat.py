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


def test_type_mismatch_is_error_not_crash(validator):
    # ADVICE r1: validate({'age': 'thirty'}) must return a type
    # ValidationError, not abort the batch with a PySparkTypeError
    res = validator.validate({"name": "ok", "age": "thirty"})
    assert not res.is_valid
    errs = {(e.field, e.constraint) for e in res.errors}
    assert ("age", "type") in errs
    # one bad record must not poison its neighbours
    bools = validator.validate_batch(
        [{"name": "ok", "age": 30}, {"name": "ok", "age": "thirty"}, {"name": "ok", "age": 31}]
    )
    assert bools == [True, False, True]


def test_bool_is_not_int(validator):
    # src/lib.rs:614,804-807: bool must not satisfy an int field
    res = validator.validate({"name": "ok", "age": True})
    assert not res.is_valid
    assert any(e.constraint == "type" and e.field == "age" for e in res.errors)


def test_type_error_skips_value_rules(validator):
    # a type-mismatched value reports ONLY the type error, not
    # downstream constraint noise on the nulled value
    res = validator.validate({"name": 123, "age": 30})
    cons = [e.constraint for e in res.errors]
    assert cons == ["type"]


def test_validation_error_fidelity(validator):
    # path/constraint/suggestion fields (src/satya/__init__.py:20-48)
    res = validator.validate({"name": "", "age": 500})
    by_field = {e.field: e for e in res.errors}
    e = by_field["age"]
    assert e.constraint in ("le", "max_value") and e.path == ["age"]
    assert e.suggestion and "decrease" in e.suggestion
    assert "age" in str(e) and "Constraint" in str(e)


def test_datetime_string_coerces(spark):
    v = StreamValidator(spark)
    v.add_field("ts", "datetime")
    assert v.validate({"ts": "2024-01-01T10:00:00Z"}).is_valid
    bad = v.validate({"ts": "not a date"})
    assert not bad.is_valid and bad.errors[0].constraint == "type"


def test_secret_masked_in_type_errors(spark):
    v = StreamValidator(spark)
    v.add_field("token", "SecretStr")
    res = v.validate({"token": 12345})
    assert not res.is_valid
    err = res.errors[0]
    assert err.constraint == "type" and err.value == "**********"
    assert "12345" not in str(err)
