"""Decorator-syntax validators (@field_validator / @model_validator) —
the reference's Pydantic-compat registration surface
(src/satya/validators.py:66-140), exercised the way
examples/pydantic_compatibility_showcase.py:99-155 does, through BOTH
paths: Model(**data) (small-batch) and validate_df (columnar scale).
"""

from __future__ import annotations

import pytest

from satya_spark import (
    Field,
    Model,
    ModelValidationError,
    field_validator,
    model_validator,
)


# --- showcase shapes (pydantic_compatibility_showcase.py) -------------------

class User(Model):
    name: str
    age: int

    @field_validator("name")
    def validate_name(cls, v, info):
        if not v.strip():
            raise ValueError("Name cannot be empty")
        return v.title()

    @field_validator("age")
    def validate_age(cls, v, info):
        if v < 0:
            raise ValueError("Age cannot be negative")
        if v > 150:
            raise ValueError("Age seems unrealistic")
        return v


class PasswordReset(Model):
    password: str
    password_confirm: str

    @model_validator(mode="after")
    def check_passwords_match(self):
        if self.password != self.password_confirm:
            raise ValueError("Passwords do not match")
        return self


@pytest.fixture(autouse=True)
def _attach(spark):
    for cls in (User, PasswordReset):
        cls.validator(spark)
    yield


# --- small-batch path -------------------------------------------------------

def test_field_validator_after_transforms(spark):
    u = User(name="john doe", age=25)
    assert u.name == "John Doe"  # title-cased by the validator
    assert u.age == 25


def test_field_validator_after_raises(spark):
    with pytest.raises(ModelValidationError) as ei:
        User(name="   ", age=25)
    assert any(
        e.field == "name" and "empty" in e.message for e in ei.value.errors
    )
    with pytest.raises(ModelValidationError) as ei:
        User(name="Jane", age=200)
    assert any(
        e.field == "age" and "unrealistic" in e.message for e in ei.value.errors
    )


def test_model_validator_after(spark):
    ok = PasswordReset(password="secret123", password_confirm="secret123")
    assert ok.password == ok.password_confirm
    with pytest.raises(ModelValidationError) as ei:
        PasswordReset(password="secret123", password_confirm="different")
    assert any("do not match" in e.message for e in ei.value.errors)
    assert any(e.constraint == "check_passwords_match" for e in ei.value.errors)


def test_before_mode_runs_ahead_of_kernels(spark):
    class Code(Model):
        code: str = Field(pattern=r"^[A-Z]{3}$")

        @field_validator("code", mode="before")
        def upcase(cls, v, info):
            return v.strip().upper()

    Code.validator(spark)
    assert Code(code=" abc ").code == "ABC"  # passes pattern only post-transform


def test_plain_mode_replaces_standard_kernels(spark):
    class Odd(Model):
        n: int = Field(ge=100)  # standard rule would reject 3

        @field_validator("n", mode="plain")
        def must_be_odd(cls, v, info):
            if v % 2 == 0:
                raise ValueError("must be odd")
            return v

    Odd.validator(spark)
    assert Odd(n=3).n == 3  # ge=100 replaced by the plain validator
    with pytest.raises(ModelValidationError):
        Odd(n=4)


def test_model_validator_before_rewrites_dict(spark):
    class Pair(Model):
        lo: int
        hi: int

        @model_validator(mode="before")
        def swap_if_needed(cls, values):
            if values.get("lo") is not None and values.get("hi") is not None:
                if values["lo"] > values["hi"]:
                    values = {**values, "lo": values["hi"], "hi": values["lo"]}
            return values

    Pair.validator(spark)
    p = Pair(lo=9, hi=2)
    assert (p.lo, p.hi) == (2, 9)


def test_validators_inherit(spark):
    class Child(User):
        email: str = Field(email=True)

    Child.validator(spark)
    c = Child(name="ada lovelace", age=36, email="ada@math.org")
    assert c.name == "Ada Lovelace"
    with pytest.raises(ModelValidationError):
        Child(name="x", age=-1, email="ada@math.org")


def test_validator_override_replaces_base(spark):
    """A subclass redefining a validator by name REPLACES the base
    version (standard override semantics) — it must not run both."""

    class Base(Model):
        x: int

        @field_validator("x", mode="before")
        def vx(cls, v, info):
            return v + 1

    class Child(Base):
        @field_validator("x", mode="before")
        def vx(cls, v, info):
            return v * 2

    for c in (Base, Child):
        c.validator(spark)
    assert Base(x=1).x == 2
    assert Child(x=1).x == 2  # override alone: 1*2, not (1+1)*2

    class Disabled(Base):
        def vx(self):  # undecorated shadow deactivates the base one
            return None

    Disabled.validator(spark)
    assert Disabled(x=1).x == 1


def test_check_fields_rejects_unknown_names():
    with pytest.raises(TypeError, match="unknown"):
        class Bad(Model):
            name: str

            @field_validator("nmae")  # typo caught at class creation
            def v(cls, v, info):
                return v

    class Allowed(Model):
        name: str

        @field_validator("whatever", check_fields=False)
        def v(cls, v, info):
            return v


def test_wrap_mode_handler_runs_standard_kernels(spark):
    """mode='wrap' (reference src/satya/validators.py:143-202): the
    validator REPLACES standard validation; handler(v) runs it. Our
    handler actually executes the field's value kernels (pykernels
    twins) — the reference's own runner passes identity."""

    class Wrapped(Model):
        code: str = Field(pattern=r"^[A-Z]{3}$")

        @field_validator("code", mode="wrap")
        def normalize_then_validate(cls, v, handler, info):
            return handler(v.strip().upper())

    Wrapped.validator(spark)
    assert Wrapped(code=" abc ").code == "ABC"  # handler passed post-normalize
    with pytest.raises(ModelValidationError) as ei:
        Wrapped(code="nope!")
    assert "pattern" in str(ei.value)


def test_wrap_mode_skipping_handler_bypasses_kernels(spark):
    class Escape(Model):
        n: int = Field(ge=100)

        @field_validator("n", mode="wrap")
        def allow_sentinel(cls, v, handler):  # 3-arg shape, no info
            if v == -1:
                return v  # sentinel skips standard validation entirely
            return handler(v)

    Escape.validator(spark)
    assert Escape(n=-1).n == -1  # ge=100 never ran
    assert Escape(n=150).n == 150
    with pytest.raises(ModelValidationError):
        Escape(n=3)  # handler re-imposed ge=100
    # presence is NOT replaced by wrap (same rule as plain)
    with pytest.raises(ModelValidationError):
        Escape()


def test_validate_df_wrap_mode(spark):
    """Scale-path wrap: handler ships inside the Arrow-batched UDF
    closure; verdicts land in violations as (field, validator, msg)."""

    class EscapeDf(Model):
        n: int = Field(ge=100)

        @field_validator("n", mode="wrap")
        def allow_sentinel(cls, v, handler, info):
            if v == -1:
                return v
            return handler(v)

    df = spark.createDataFrame([(-1,), (150,), (3,), (None,)], "n long")
    rows = EscapeDf.validate_df(df).orderBy("n", ascending=False).collect()
    by_n = {r["n"]: r for r in rows}
    assert by_n[-1]["valid"]  # sentinel bypassed ge
    assert by_n[150]["valid"]
    assert not by_n[3]["valid"]
    v3 = by_n[3]["violations"][0]
    assert v3["constraint_name"] == "allow_sentinel" and "ge" in v3["offending_value"]
    # null: wrap skipped, required kernel still fires
    vnull = {(v["field"], v["constraint_name"]) for v in by_n[None]["violations"]}
    assert vnull == {("n", "required")}


def test_two_arg_signature_supported(spark):
    class TwoArg(Model):
        name: str

        @field_validator("name")
        def strip_it(cls, v):
            return v.strip()

    TwoArg.validator(spark)
    assert TwoArg(name="  a  ").name == "a"


def test_validate_assignment_runs_decorators(spark):
    class VA(Model):
        model_config = {"validate_assignment": True}
        name: str = Field(min_length=2)

        @field_validator("name")
        def title_it(cls, v, info):
            if not v.strip():
                raise ValueError("Name cannot be empty")
            return v.title()

    VA.validator(spark)
    m = VA(name="ada lovelace")
    assert m.name == "Ada Lovelace"
    m.name = "grace hopper"  # assignment re-validates AND transforms
    assert m.name == "Grace Hopper"
    with pytest.raises(ModelValidationError):
        m.name = "   "
    with pytest.raises(ModelValidationError):
        m.name = "x"  # min_length kernel still applies on assignment
    assert m.name == "Grace Hopper"  # failed assignments don't stick


# --- scale path (validate_df) ----------------------------------------------

def test_validate_df_applies_field_validators(spark):
    df = spark.createDataFrame(
        [("john doe", 25), ("   ", 30), ("Jane", 200), (None, 40)],
        "name string, age long",
    )
    rows = User.validate_df(df).orderBy("age").collect()
    # transform applied to the output column
    assert rows[0]["name"] == "John Doe" and rows[0]["valid"]
    # raised messages become violation rows (field, validator, message)
    v30 = {(v["field"], v["constraint_name"]) for v in rows[1]["violations"]}
    assert ("name", "validate_name") in v30 and not rows[1]["valid"]
    assert any(
        "empty" in v["offending_value"] for v in rows[1]["violations"]
    )
    # nulls skip the validator (required kernel still fires)
    v40 = {(v["field"], v["constraint_name"]) for v in rows[2]["violations"]}
    assert v40 == {("name", "required")}
    v200 = {(v["field"], v["constraint_name"]) for v in rows[3]["violations"]}
    assert ("age", "validate_age") in v200


def test_validate_df_applies_model_validators(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "password string, password_confirm string"
    )
    rows = PasswordReset.validate_df(df).orderBy("password_confirm").collect()
    assert rows[0]["valid"]
    assert not rows[1]["valid"]
    assert [
        (v["field"], v["constraint_name"]) for v in rows[1]["violations"]
    ] == [("<row>", "check_passwords_match")]
    assert "do not match" in rows[1]["violations"][0]["offending_value"]


def test_validate_df_plain_mode_drops_standard_kernels(spark):
    class Odd2(Model):
        n: int = Field(ge=100)

        @field_validator("n", mode="plain")
        def must_be_odd(cls, v, info):
            if v % 2 == 0:
                raise ValueError("must be odd")
            return v

    df = spark.createDataFrame([(3,), (4,)], "n long")
    rows = Odd2.validate_df(df).orderBy("n").collect()
    assert rows[0]["valid"]  # ge=100 replaced
    assert not rows[1]["valid"]
    assert rows[1]["violations"][0]["constraint_name"] == "must_be_odd"


def test_validate_df_before_mode_feeds_kernels(spark):
    class Code2(Model):
        code: str = Field(pattern=r"^[A-Z]{3}$")

        @field_validator("code", mode="before")
        def upcase(cls, v, info):
            return v.strip().upper()

    df = spark.createDataFrame([(" abc ",), ("nope",)], "code string")
    rows = Code2.validate_df(df).orderBy("code").collect()
    by_code = {r["code"]: r for r in rows}
    assert by_code["ABC"]["valid"]  # transformed, then pattern passes
    assert not by_code["NOPE"]["valid"]  # transformed, pattern fails


def test_showcase_combined_example(spark):
    """The showcase's combined e-commerce shape
    (pydantic_compatibility_showcase.py:158-180), trimmed to the
    columnar vocabulary."""

    class OrderItem(Model):
        product_id: str = Field(to_upper=True, strip_whitespace=True)
        quantity: int = Field(ge=1)

        @field_validator("product_id")
        def validate_product_id(cls, v, info):
            if not v.strip().upper().startswith("PROD-"):
                raise ValueError("Product ID must start with PROD-")
            return v

    OrderItem.validator(spark)
    ok = OrderItem(product_id="  prod-77  ", quantity=2)
    assert ok.product_id.strip().upper() == "PROD-77"
    with pytest.raises(ModelValidationError):
        OrderItem(product_id="SKU-1", quantity=2)


# --- dotted paths into nested models (both paths) ---------------------------

class _Inner(Model):
    email: str = Field(pattern=r"^[a-z]+@[a-z]+\.[a-z]+$")
    code: str = Field(min_length=3)


def test_dotted_before_transform_small_batch(spark):
    class Account(Model):
        name: str
        inner: _Inner

        @field_validator("inner.email", mode="before")
        def normalize(cls, v, info):
            return v.strip().lower()

    for c in (_Inner, Account):
        c.validator(spark)
    raw = {"email": "  ADA@MATH.ORG ", "code": "xyz"}
    a = Account(name="x", inner=raw)
    assert a.inner.email == "ada@math.org"
    # copy-on-write: the caller's nested dict is untouched
    assert raw["email"] == "  ADA@MATH.ORG "


def test_dotted_plain_replaces_exact_leaf(spark):
    class Outer(Model):
        inner: _Inner

        @field_validator("inner.email", mode="plain")
        def any_at(cls, v, info):
            if "@" not in v:
                raise ValueError("needs @")
            return v

    for c in (_Inner, Outer):
        c.validator(spark)
    # pattern kernel replaced for inner.email only
    o = Outer(inner={"email": "WEIRD@X", "code": "abc"})
    assert o.inner.email == "WEIRD@X"
    # the SIBLING leaf's kernel survives
    with pytest.raises(ModelValidationError):
        Outer(inner={"email": "WEIRD@X", "code": "a"})
    # the plain validator's own verdict still applies
    with pytest.raises(ModelValidationError):
        Outer(inner={"email": "nope", "code": "abc"})


def test_plain_on_whole_nested_field_is_verbatim(spark):
    class Outer2(Model):
        inner: _Inner

        @field_validator("inner", mode="plain")
        def take(cls, v, info):
            return v

    for c in (_Inner, Outer2):
        c.validator(spark)
    # Pydantic plain semantics: the validator's return IS the value
    o = Outer2(inner={"email": "not-an-email", "code": ""})
    assert o.inner == {"email": "not-an-email", "code": ""}
    assert o.model_dump()["inner"]["code"] == ""


def test_dotted_after_transform_small_batch(spark):
    class Outer3(Model):
        inner: _Inner

        @field_validator("inner.email", mode="after")
        def tag(cls, v, info):
            return v + "!"

    for c in (_Inner, Outer3):
        c.validator(spark)
    o = Outer3(inner={"email": "ada@math.org", "code": "xyz"})
    assert o.inner.email == "ada@math.org!"


def test_validate_df_dotted_plain_parity(spark):
    class Outer4(Model):
        inner: _Inner

        @field_validator("inner.email", mode="plain")
        def any_at(cls, v, info):
            if "@" not in v:
                raise ValueError("needs @")
            return v

    for c in (_Inner, Outer4):
        c.validator(spark)
    df = spark.createDataFrame(
        [
            (("WEIRD@X", "abc"),),  # plain passes, sibling kernel passes
            (("WEIRD@X", "a"),),    # sibling min_length survives
            (("nope", "abc"),),     # plain's own verdict
        ],
        "inner struct<email:string,code:string>",
    )
    rows = Outer4.validate_df(df).orderBy("inner.email", "inner.code").collect()
    verdicts = [(r["inner"]["email"], r["inner"]["code"], r["valid"]) for r in rows]
    assert verdicts == [
        ("WEIRD@X", "a", False),
        ("WEIRD@X", "abc", True),
        ("nope", "abc", False),
    ]


def test_aliased_validator_runs_once(spark):
    """`inc_alias = inc` must not double-apply the transform."""

    class M(Model):
        x: int

        @field_validator("x", mode="before")
        def inc(cls, v, info):
            return v + 1

        inc_alias = inc

    M.validator(spark)
    assert M(x=1).x == 2  # once, not (1+1)+1


class _LeafC(Model):
    c: str = Field(min_length=4)


class _BoxB(Model):
    b: _LeafC


class _BoxX(Model):
    b: _LeafC


class _G(Model):
    m: _BoxB
    x: _BoxX  # sibling containing the same sub-path name

    @field_validator("m.b.c", mode="plain")
    def any_c(cls, v, info):
        return v


def test_suppression_does_not_leak_to_siblings(spark):
    """A dotted plain validator on one nested field must not disable
    the SAME leaf path inside a sibling nested field."""
    G = _G
    for k in (_LeafC, _BoxB, _BoxX, _G):
        k.validator(spark)
    # plain target passes with a too-short value; the SIBLING's
    # identical path keeps its kernel
    G(m={"b": {"c": "x"}}, x={"b": {"c": "long-enough"}})
    with pytest.raises(ModelValidationError):
        G(m={"b": {"c": "x"}}, x={"b": {"c": "z"}})


class _Inner2(Model):
    email: str


class _Outer5(Model):
    inner: _Inner2

    @field_validator("inner.email", mode="before")
    def up(cls, v, info):
        return v.upper()


def test_dotted_transform_does_not_mutate_model_instance_input(spark):
    Inner2, Outer5 = _Inner2, _Outer5
    for k in (Inner2, Outer5):
        k.validator(spark)
    i = Inner2(email="ada@math.org")
    o = Outer5(inner=i)
    assert i.email == "ada@math.org"  # caller's instance untouched
    assert o.inner.email == "ADA@MATH.ORG"
