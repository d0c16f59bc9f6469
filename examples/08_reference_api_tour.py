"""Example: the reference's full public API surface, drop-in
(reference src/satya/__init__.py:1361-1412 exports) — scalar/array
validators, the JSON Schema compiler, load_json, serializer
decorators, the ABSENT sentinel, and profiling. Everything below the
DataFrame section runs JVM-free (pykernel twins); the scale section
compiles the SAME constraints to Catalyst kernels.
"""

from satya_spark import (
    ABSENT,
    ArrayValidator,
    BaseModel,
    Field,
    IntValidator,
    Model,
    StringValidator,
    compile_json_schema,
    computed_field,
    field_serializer,
    load_json,
)
from satya_spark.profiling import ValidationProfiler

# --- scalar / array validators (no Spark needed) ---------------------------
username = StringValidator(min_length=3, max_length=20, pattern=r"^[a-z_]+$")
assert username.validate("ada_l").is_valid
assert not username.validate("A!").is_valid

port = IntValidator(ge=1, le=65535)
assert port.validate(8080).is_valid and not port.validate(0).is_valid

tags = ArrayValidator("string", min_items=1, unique_items=True)
assert tags.validate(["etl", "nightly"]).is_valid
assert not tags.validate(["dup", "dup"]).is_valid

# --- JSON Schema → validator (fastjsonschema-style entry) ------------------
score = compile_json_schema({"type": "number", "minimum": 0, "maximum": 1})
assert score.validate(0.7).is_valid and not score.validate(1.5).is_valid

cfg_schema = compile_json_schema(
    {
        "type": "object",
        "properties": {
            "name": {"type": "string", "minLength": 1},
            "retries": {"type": "integer", "minimum": 0},
        },
        "required": ["name"],
        "additionalProperties": False,
    }
)
assert cfg_schema.validate(load_json('{"name": "job", "retries": 3}')).is_valid
assert not cfg_schema.validate({"retries": -1}).is_valid

# --- ABSENT: present-vs-absent on the facade --------------------------------
# (the reference absent.py docstring example, verbatim)


class PackageConfig(Model):
    name: str
    version: str
    python: str | type[ABSENT] = ABSENT  # stays absent unless provided
    markers: str = ""


# --- serializer decorators (registered AND consumed) -------------------------


class Account(BaseModel):  # BaseModel is the Model alias, like the reference
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


def main() -> None:
    from satya_spark.session import get_spark

    spark = get_spark(app_name="reference-api-tour", cpus=4)
    for cls in (PackageConfig, Account):
        cls.validator(spark)

    cfg = PackageConfig(name="pkg", version="1.0")
    assert cfg.model_dump() == {"name": "pkg", "version": "1.0", "markers": ""}
    print("ABSENT:", cfg.model_dump())

    prof = ValidationProfiler()
    prof.track(Account)
    acct = Account.model_validate(
        {"user": "u1", "password": "hunter2", "first": "Ada", "last": "Lovelace"}
    )
    d = acct.model_dump()
    assert d["password"] == "***" and d["full_name"] == "Ada Lovelace"
    print("serialized:", d)

    # --- the scale path: the SAME scalar constraints over a column ----------
    df = spark.createDataFrame(
        [("ada_l",), ("A!",), ("ok_name",)], "username string"
    )
    verdicts = {
        r["username"]: r["valid"]
        for r in username.with_validation(df, "username").collect()
    }
    assert verdicts == {"ada_l": True, "A!": False, "ok_name": True}
    print("scale verdicts:", verdicts)
    print(prof.report(verbose=False))
    spark.stop()


if __name__ == "__main__":
    main()
