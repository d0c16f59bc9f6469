"""Reference public-API parity surfaces added in r4: serializer
decorators (consumed, unlike the reference), scalar/array validators,
the JSON Schema compiler, load_json, the ABSENT sentinel, and the
BaseModel alias (reference src/satya/__init__.py:1361-1412 exports)."""

from __future__ import annotations

import pytest

import satya_spark as s
from satya_spark import (
    ABSENT,
    ArrayValidator,
    BaseModel,
    BooleanValidator,
    Field,
    IntValidator,
    Model,
    ModelValidationError,
    NumberValidator,
    StringValidator,
    compile_json_schema,
    computed_field,
    field_serializer,
    filter_absent,
    is_absent,
    load_json,
    model_serializer,
)


# --- serializer decorators (reference serializers.py; consumed here) --------

class Account(Model):
    user: str
    password: str
    first: str
    last: str

    @field_serializer("password")
    def mask(self, value):
        return "***"

    @computed_field
    def full_name(self) -> str:
        return f"{self.first} {self.last}"


def test_field_serializer_and_computed_field(spark):
    Account.validator(spark)
    a = Account(user="u1", password="hunter2", first="Ada", last="Lovelace")
    d = a.model_dump()
    assert d["password"] == "***"
    assert d["full_name"] == "Ada Lovelace"
    assert a.password == "hunter2"  # stored value untouched
    assert a.full_name == "Ada Lovelace"  # property access works
    assert "hunter2" not in a.model_dump_json()


def test_field_serializer_when_used_json(spark):
    class T(Model):
        n: int

        @field_serializer("n", when_used="json")
        def as_str(self, value):
            return f"n={value}"

    T.validator(spark)
    t = T(n=5)
    assert t.model_dump()["n"] == 5  # python mode: untouched
    assert '"n=5"' in t.model_dump_json()  # json mode: serializer fires


def test_field_serializer_unless_none(spark):
    class T2(Model):
        n: int | None = Field(required=False)

        @field_serializer("n", when_used="unless-none")
        def double(self, value):
            return value * 2

    T2.validator(spark)
    assert T2(n=4).model_dump()["n"] == 8
    assert T2(n=None).model_dump()["n"] is None  # serializer skipped


def test_model_serializer_replaces_dump(spark):
    class T3(Model):
        a: int
        b: int

        @model_serializer
        def ser(self):
            return {"sum": self.a + self.b}

    T3.validator(spark)
    assert T3(a=1, b=2).model_dump() == {"sum": 3}

    class T4(Model):
        a: int

        @model_serializer(mode="wrap")
        def ser(self, handler):
            d = handler()
            d["wrapped"] = True
            return d

    T4.validator(spark)
    assert T4(a=1).model_dump() == {"a": 1, "wrapped": True}


# --- scalar / array validators ----------------------------------------------

def test_scalar_validators_shapes():
    sv = StringValidator(min_length=3, pattern=r"^[a-z]+$")
    assert sv.validate("hello").is_valid
    r = sv.validate("Hi")
    assert not r.is_valid and {e.constraint for e in r.errors} >= {"min_length"}
    assert not sv.validate(42).is_valid  # type gate

    iv = IntValidator(ge=0, le=100, multiple_of=5)
    assert iv.validate(40).is_valid
    assert not iv.validate(41).is_valid
    assert not iv.validate(True).is_valid  # bool is NOT an int

    nv = NumberValidator(gt=0.0)
    assert nv.validate(0.5).is_valid and nv.validate(3).is_valid
    assert not nv.validate(0.0).is_valid

    bv = BooleanValidator()
    assert bv.validate(False).is_valid and not bv.validate("true").is_valid

    av = ArrayValidator("integer", min_items=1, max_items=3, unique_items=True)
    assert av.validate([1, 2]).is_valid
    assert not av.validate([1, 1]).is_valid
    assert not av.validate([1, "x"]).is_valid
    assert av.validate_batch([[1], []]) and not av.validate([]).is_valid


def test_scalar_validator_scale_path(spark):
    """with_validation compiles the SAME constraints to Catalyst
    kernels — verdict parity with the per-value path on a column."""
    sv = StringValidator(min_length=3, pattern=r"^[a-z]+$")
    vals = ["hello", "Hi", "ok", "worlds", "nope!"]
    rows = (
        sv.with_validation(
            spark.createDataFrame([(v,) for v in vals], "s string"), "s"
        )
        .select("s", "valid")
        .collect()
    )
    got = {r["s"]: r["valid"] for r in rows}
    for v in vals:
        assert got[v] == sv.validate(v).is_valid, v


# --- JSON Schema compiler + loader ------------------------------------------

def test_compile_json_schema_scalars():
    v = compile_json_schema(
        {"type": "integer", "minimum": 0, "maximum": 10, "multipleOf": 2}
    )
    assert v.validate(4).is_valid and not v.validate(3).is_valid
    av = compile_json_schema(
        {"type": "array", "items": {"type": "string"}, "minItems": 1}
    )
    assert av.validate(["x"]).is_valid and not av.validate([]).is_valid
    with pytest.raises(ValueError):
        compile_json_schema({"type": "null"})


def test_compile_json_schema_object(spark):
    ov = compile_json_schema(
        {
            "type": "object",
            "properties": {
                "name": {"type": "string", "minLength": 2},
                "age": {"type": "integer", "minimum": 0},
            },
            "required": ["name"],
            "additionalProperties": False,
        }
    )
    assert ov.validate({"name": "ok", "age": 3}).is_valid
    assert not ov.validate({"name": "x"}).is_valid
    assert not ov.validate({"name": "ok", "zz": 1}).is_valid
    assert not ov.validate({"age": 3}).is_valid
    # scale path: same spec compiled over a DataFrame
    df = spark.createDataFrame(
        [("ok", 3), ("x", 1), ("fine", -1)], "name string, age long"
    )
    got = {r["name"]: r["valid"] for r in ov.with_validation(df).collect()}
    assert got == {"ok": True, "x": False, "fine": False}


def test_load_json():
    assert load_json('{"a": [1, 2]}') == {"a": [1, 2]}
    with pytest.raises(ValueError):
        load_json("{nope")


# --- ABSENT sentinel ---------------------------------------------------------

def test_absent_reference_example(spark):
    """The reference's own docstring example (absent.py:22-39)."""

    class Config(Model):
        name: str
        version: str
        python: str | type[ABSENT] = ABSENT
        markers: str = ""

    Config.validator(spark)
    c = Config(name="pkg", version="1.0")
    assert c.model_dump() == {"name": "pkg", "version": "1.0", "markers": ""}
    with pytest.raises(AttributeError):
        c.python
    assert Config(name="p", version="2", python="3.11").model_dump()[
        "python"
    ] == "3.11"
    # ABSENT-valued input behaves exactly like a missing key
    assert "python" not in Config(
        name="p", version="2", python=ABSENT
    ).model_dump()


def test_absent_helpers():
    assert is_absent(ABSENT) and not is_absent(None) and not is_absent(0)
    assert filter_absent({"a": 1, "b": ABSENT, "c": None}) == {"a": 1, "c": None}
    assert not ABSENT and repr(ABSENT) == "ABSENT"


def test_required_field_still_required_with_absent_input(spark):
    class R(Model):
        name: str

    R.validator(spark)
    with pytest.raises(ModelValidationError):
        R(name=ABSENT)  # ABSENT ≡ missing, and name is required


def test_basemodel_alias():
    assert BaseModel is Model
    assert set(
        n
        for n in (
            "field_serializer", "model_serializer", "computed_field",
            "StringValidator", "ArrayValidator", "ABSENT",
            "compile_json_schema", "JSONSchemaCompiler", "load_json",
            "SecretBytes", "FilePath", "DirectoryPath", "NewPath",
        )
    ) <= set(s.__all__)


# --- profiling (reference src/satya/profiling.py) ----------------------------

def test_validation_profiler_track(spark):
    from satya_spark.profiling import ValidationProfiler

    class P(Model):
        name: str
        age: int = Field(ge=0)

    P.validator(spark)
    prof = ValidationProfiler()
    prof.track(P)
    P.model_validate({"name": "a", "age": 1})
    with pytest.raises(Exception):
        P.model_validate({"name": "a", "age": -1})
    st = prof.get_stats()
    assert st.total_validations == 2
    assert st.successful_validations == 1 and st.failed_validations == 1
    assert st.avg_time_us > 0 and st.median_time_us > 0
    assert "Total Validations: 2" in prof.report()
    d = st.to_dict()
    assert d["success_rate"] == 50.0
    prof.reset()
    assert prof.get_stats().total_validations == 0


def test_validation_profiler_profile_df(spark):
    from satya_spark.profiling import ValidationProfiler

    class Q(Model):
        name: str = Field(min_length=2)
        age: int = Field(ge=0)

    df = spark.createDataFrame(
        [("ok", 1), ("x", -1)], "name string, age long"
    )
    prof = ValidationProfiler()
    st = prof.profile_df(df, Q)
    assert set(st.field_stats) == {"name", "age"}
    assert st.field_stats["name"].errors == 1
    assert st.field_stats["age"].errors == 1
    assert st.field_stats["name"].validation_count == 2
    assert st.slowest_field in ("name", "age")


def test_profile_field_wrapper():
    from satya_spark.profiling import ValidationProfiler

    prof = ValidationProfiler()

    def check(v):
        if v < 0:
            raise ValueError("neg")
        return v

    wrapped = prof.profile_field("n", check)
    assert wrapped(3) == 3
    with pytest.raises(ValueError):
        wrapped(-1)
    st = prof.get_stats().field_stats["n"]
    assert st.validation_count == 2 and st.errors == 1


# --- review regression pins (r4 code-review findings) ------------------------

def test_scalar_zero_bound_survives_scale_path(spark):
    """ge=0 must NOT vanish on the DataFrame path (0 == False trap)."""
    iv = IntValidator(ge=0)
    df = spark.createDataFrame([(-5,), (0,), (3,)], "n long")
    got = {r["n"]: r["valid"] for r in iv.with_validation(df, "n").collect()}
    assert got == {-5: False, 0: True, 3: True}


def test_array_validator_unsupported_item_type_is_valueerror():
    with pytest.raises(ValueError, match="unsupported array item type"):
        ArrayValidator("object")
    with pytest.raises(ValueError):
        compile_json_schema({"type": "array", "items": {"type": "object"}})


def test_profiler_track_dispatches_on_subclass(spark):
    from satya_spark.profiling import ValidationProfiler

    class P2(Model):
        a: int

    class C2(P2):
        b: int

    for c in (P2, C2):
        c.validator(spark)
    ValidationProfiler().track(P2)
    inst = C2.model_validate({"a": 1, "b": 2})
    assert type(inst) is C2 and inst.b == 2


class NInner(Model):
    n: int

    @field_serializer("n", when_used="json")
    def as_str(self, value):
        return f"n={value}"


class NOuter(Model):
    inner: NInner


def test_nested_json_serializers_fire_through_dump():
    """mode propagates into nested models so when_used='json' fires."""
    o = NOuter.model_construct(inner=NInner.model_construct(n=5))
    assert o.model_dump()["inner"]["n"] == 5
    assert '"n=5"' in o.model_dump_json()


def test_field_serializer_override_and_deactivation():
    class SBase(Model):
        a: int
        b: int

        @field_serializer("a")
        def ser(self, value):
            return f"base:{value}"

    class SOverride(SBase):
        @field_serializer("b")
        def ser(self, value):  # redefinition MOVES the serializer to b
            return f"child:{value}"

    class SDisabled(SBase):
        def ser(self):  # undecorated shadow deactivates it
            return None

    base = SBase.model_construct(a=1, b=2)
    assert base.model_dump() == {"a": "base:1", "b": 2}
    ov = SOverride.model_construct(a=1, b=2)
    assert ov.model_dump() == {"a": 1, "b": "child:2"}
    dis = SDisabled.model_construct(a=1, b=2)
    assert dis.model_dump() == {"a": 1, "b": 2}
