"""Example: @field_validator / @model_validator decorator syntax —
the reference's Pydantic-compat registration
(examples/pydantic_compatibility_showcase.py:99-155) running through
both the per-record path and the columnar validate_df path. Custom
Python validators execute as Arrow-batched pandas UDFs at scale —
never row-at-a-time F.udf.
"""

import sys

from satya_spark import (
    Field,
    Model,
    ModelValidationError,
    field_validator,
    model_validator,
)
from satya_spark.session import get_spark


class User(Model):
    name: str
    age: int = Field(ge=0)

    @field_validator("name")
    def validate_name(cls, v, info):
        if not v.strip():
            raise ValueError("Name cannot be empty")
        return v.title()

    @field_validator("age")
    def validate_age(cls, v, info):
        if v > 150:
            raise ValueError("Age seems unrealistic")
        return v


class LegacyCode(Model):
    """mode='wrap': the validator wraps standard validation — the
    handler RUNS the field's value kernels (pykernels twins); skipping
    it bypasses them (here: grandfathered legacy codes)."""

    code: str = Field(pattern=r"^[A-Z]{3}$")

    @field_validator("code", mode="wrap")
    def grandfather_legacy(cls, v, handler, info):
        if v.startswith("legacy:"):
            return v  # pre-migration codes skip the pattern kernel
        return handler(v.strip().upper())


class PasswordReset(Model):
    password: str
    password_confirm: str

    @model_validator(mode="after")
    def check_passwords_match(self):
        if self.password != self.password_confirm:
            raise ValueError("Passwords do not match")
        return self


def main() -> int:
    spark = get_spark(app_name="example-decorators", cpus=4)

    # per-record: transforms apply, exceptions accumulate as errors
    u = User(name="john doe", age=25)
    assert u.name == "John Doe"
    try:
        User(name="  ", age=25)
        return 1
    except ModelValidationError as e:
        assert any("empty" in err.message for err in e.errors)
    try:
        PasswordReset(password="a", password_confirm="b")
        return 1
    except ModelValidationError:
        pass

    # wrap mode: handler runs the standard kernels; the sentinel
    # branch bypasses them
    assert LegacyCode(code=" abc ").code == "ABC"
    assert LegacyCode(code="legacy:07").code == "legacy:07"
    try:
        LegacyCode(code="nope!")
        return 1
    except ModelValidationError as e:
        assert any("pattern" in err.message for err in e.errors)

    # columnar: the SAME class; validators run as pandas UDFs and
    # their verdicts join the violations array
    df = spark.createDataFrame(
        [("john doe", 25), ("", 30), ("Ada", 200)], "name string, age long"
    )
    rows = User.validate_df(df).orderBy("age").collect()
    assert rows[0]["name"] == "John Doe" and rows[0]["valid"]
    assert not rows[1]["valid"] and not rows[2]["valid"]
    print("decorator validators: per-record and validate_df paths agree")

    df2 = spark.createDataFrame(
        [("x", "x"), ("x", "y")], "password string, password_confirm string"
    )
    n_bad = PasswordReset.validate_df(df2).filter("NOT valid").count()
    assert n_bad == 1
    print("model validator at scale: 1 mismatched row flagged")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
