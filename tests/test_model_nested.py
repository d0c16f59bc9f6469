"""Nested Model composition in the facade — ports the shapes of the
reference's tests/test_nested_models.py (Dict[str, Model], deep
nesting) and tests/test_field_constraints.py:311-393 (nested model
constraints, List[Model] with container constraints), plus
default_factory / mutable-default isolation
(tests/test_edge_cases.py:46-64) — through BOTH ``model_validate``
(recursive small-batch path) and ``validate_df`` (struct-kernel scale
path)."""

from __future__ import annotations

from typing import Dict, List, Optional

import pytest

from satya_spark.model import Field, Model, ModelValidationError


# --- reference test_nested_models.py shapes --------------------------------

class SystemConfig(Model):
    buffer_size: int = Field(ge=256, le=100000)
    learning_rate: float = Field(ge=0.0, le=1.0)
    max_epochs: int = Field(ge=1, le=1000)


class ArchiveEntry(Model):
    config: SystemConfig = Field(description="System configuration")
    performance: float = Field(ge=-1000.0, le=100000.0)
    generation: int = Field(ge=0)


class MapElitesArchive(Model):
    resolution: int = Field(ge=1, le=20)
    archive: Dict[str, ArchiveEntry] = Field(description="Archive entries")


class Address(Model):
    street: str = Field(min_length=5)
    zipcode: str = Field(pattern=r"^\d{5}$")


class Person(Model):
    name: str = Field(min_length=2)
    address: Address = Field(description="Home address")


class Tag(Model):
    name: str = Field(min_length=1, max_length=20)
    color: str = Field(enum=("red", "blue", "green"))


class Post(Model):
    title: str = Field(min_length=5)
    tags: List[Tag] = Field(min_items=1, max_items=3)


@pytest.fixture(autouse=True)
def _attach_spark(spark):
    for cls in (SystemConfig, ArchiveEntry, MapElitesArchive, Address,
                Person, Tag, Post):
        cls.validator(spark)
    yield


def test_optional_nested_explicit_none_stays_none(spark):
    # an optional nested field passed explicitly as None keeps None —
    # only an ABSENT key falls back to the declared default (matches
    # the scalar path and exclude_unset semantics)
    class WithOpt(Model):
        name: str = Field(min_length=2)
        address: Optional[Address] = Field(
            required=False, default={"street": "5 Main Street", "zipcode": "12345"}
        )

    WithOpt.validator(spark)
    explicit = WithOpt(name="Ada", address=None)
    assert explicit.address is None
    assert "address" in explicit.__fields_set__
    absent = WithOpt(name="Ada")
    assert absent.address == {"street": "5 Main Street", "zipcode": "12345"}
    assert "address" not in absent.__fields_set__


def test_simple_dict_of_models(spark):
    data = {
        "resolution": 5,
        "archive": {
            "cell_1_2": {
                "config": {"buffer_size": 1024, "learning_rate": 0.01,
                           "max_epochs": 100},
                "performance": 95.5,
                "generation": 10,
            },
            "cell_2_3": {
                "config": {"buffer_size": 2048, "learning_rate": 0.001,
                           "max_epochs": 200},
                "performance": 97.2,
                "generation": 15,
            },
        },
    }
    archive = MapElitesArchive(**data)
    assert archive.resolution == 5
    assert len(archive.archive) == 2
    assert isinstance(archive.archive["cell_1_2"], ArchiveEntry)
    assert archive.archive["cell_1_2"].performance == 95.5
    assert archive.archive["cell_1_2"].config.buffer_size == 1024
    # round-trips through model_dump recursively
    assert (
        archive.model_dump()["archive"]["cell_1_2"]["config"]["buffer_size"]
        == 1024
    )


def test_nested_dict_validation_errors(spark):
    data = {
        "resolution": 5,
        "archive": {
            "cell_1_2": {
                "config": {"buffer_size": 100, "learning_rate": 0.01,
                           "max_epochs": 100},  # buffer_size < 256
                "performance": 95.5,
                "generation": 10,
            }
        },
    }
    with pytest.raises(ModelValidationError) as ei:
        MapElitesArchive(**data)
    paths = [str(e) for e in ei.value.errors]
    assert any("buffer_size" in p for p in paths)


def test_empty_dict_of_models(spark):
    archive = MapElitesArchive(resolution=5, archive={})
    assert archive.resolution == 5 and len(archive.archive) == 0


# --- reference test_field_constraints.py:311-355 ---------------------------

def test_nested_model_constraints(spark):
    valid = Person(name="John",
                   address={"street": "123 Main Street", "zipcode": "12345"})
    assert valid.name == "John"
    assert valid.address.street == "123 Main Street"
    with pytest.raises(ModelValidationError):
        Person(name="John", address={"street": "St", "zipcode": "12345"})
    with pytest.raises(ModelValidationError):
        Person(name="John",
               address={"street": "123 Main Street", "zipcode": "1234"})


# --- reference test_field_constraints.py:355-393 ---------------------------

def test_list_of_models_with_constraints(spark):
    valid = Post(title="My First Post",
                 tags=[{"name": "python", "color": "blue"},
                       {"name": "tutorial", "color": "green"}])
    assert len(valid.tags) == 2 and valid.tags[0].name == "python"
    with pytest.raises(ModelValidationError):
        Post(title="My Post", tags=[])  # min_items
    with pytest.raises(ModelValidationError):
        Post(title="My Post",
             tags=[{"name": "t1", "color": "red"},
                   {"name": "t2", "color": "blue"},
                   {"name": "t3", "color": "green"},
                   {"name": "t4", "color": "red"}])  # max_items
    with pytest.raises(ModelValidationError):
        Post(title="My Post", tags=[{"name": "", "color": "blue"}])


# --- default_factory + mutable-default isolation ---------------------------

def test_mutable_defaults_are_isolated(spark):
    class DefaultModel(Model):
        tags: List[str] = Field(default=[])
        metadata: Dict[str, str] = Field(default={})
        active: bool = Field(default=True)

    DefaultModel.validator(spark)
    m = DefaultModel()
    assert m.tags == [] and m.metadata == {} and m.active is True
    m1, m2 = DefaultModel(), DefaultModel()
    m1.tags.append("test")
    assert len(m1.tags) == 1 and len(m2.tags) == 0


def test_default_factory_runs_per_record(spark):
    calls = []

    def make():
        calls.append(1)
        return ["seeded"]

    class F2(Model):
        xs: Optional[List[str]] = Field(default_factory=make)

    F2.validator(spark)
    a, b = F2(), F2()
    assert a.xs == ["seeded"] and b.xs == ["seeded"]
    assert a.xs is not b.xs and len(calls) == 2


# --- the scale path: the SAME declarations as struct kernels --------------

def test_validate_df_nested_model(spark):
    df = spark.createDataFrame(
        [
            ("John", ("123 Main Street", "12345")),
            ("Jane", ("St", "12345")),       # street too short
            ("Jim", ("456 Oak Avenue", "1234")),  # bad zipcode
            ("Jo", None),                    # missing required struct
        ],
        "name string, address struct<street:string,zipcode:string>",
    )
    out = Person.validate_df(df).collect()
    by_name = {r["name"]: r for r in out}
    assert by_name["John"]["valid"]
    viols = {
        (v["field"], v["constraint_name"])
        for r in out
        for v in r["violations"]
    }
    assert ("address.street", "min_length") in viols
    assert ("address.zipcode", "pattern") in viols
    # missing struct → ONE violation (the parent's), not a cascade
    jo = [
        (v["field"], v["constraint_name"]) for v in by_name["Jo"]["violations"]
    ]
    assert jo == [("address", "required")]


def test_validate_df_list_of_models(spark):
    df = spark.createDataFrame(
        [
            ("My First Post", [("python", "blue"), ("tutorial", "green")]),
            ("My Post", []),                      # min_items
            ("My Other Post", [("", "mauve")]),   # min_length + enum
        ],
        "title string, tags array<struct<name:string,color:string>>",
    )
    out = Post.validate_df(df).collect()
    by_title = {r["title"]: r for r in out}
    assert by_title["My First Post"]["valid"]
    assert not by_title["My Post"]["valid"]
    viols = {
        (v["field"], v["constraint_name"])
        for v in by_title["My Other Post"]["violations"]
    }
    assert viols == {("tags[].name", "min_length"), ("tags[].color", "enum")}


def test_validate_df_dict_of_models_matches_duckdb(spark):
    """Dict[str, Model] struct kernels AND their SQL twins agree —
    the differential oracle extends to model composition."""
    import duckdb

    compiled_sql = None
    from satya_spark.compiler import compile_spec

    spec = MapElitesArchive.spec()
    compiled = compile_spec(spec)
    df = spark.createDataFrame(
        [
            (1, 5, {"cell": ((1024, 0.01, 100), 95.5, 10)}),
            (2, 30, {"cell": ((100, 2.0, 100), 95.5, -1)}),  # 4 violations
        ],
        "i int, resolution int, archive map<string,struct<"
        "config:struct<buffer_size:bigint,learning_rate:double,"
        "max_epochs:bigint>,performance:double,generation:bigint>>",
    )
    srows = sorted(
        (r["i"], r["field"], r["constraint_name"], r["offending_value"])
        for r in compiled.violations_df(df, ["i"]).collect()
    )
    con = duckdb.connect()
    con.execute(
        """CREATE TABLE t AS SELECT * FROM (VALUES
        (1, 5, MAP(['cell'], [{'config': {'buffer_size': 1024,
            'learning_rate': 0.01, 'max_epochs': 100},
            'performance': 95.5, 'generation': 10}])),
        (2, 30, MAP(['cell'], [{'config': {'buffer_size': 100,
            'learning_rate': 2.0, 'max_epochs': 100},
            'performance': 95.5, 'generation': -1}]))
        ) AS v(i, resolution, archive)"""
    )
    drows = sorted(
        tuple(r) for r in con.execute(compiled.violations_sql("t", ["i"])).fetchall()
    )
    assert srows == drows
    assert {(f, c) for _, f, c, _ in srows} == {
        ("resolution", "le"),
        ("archive[].config.buffer_size", "ge"),
        ("archive[].config.learning_rate", "le"),
        ("archive[].generation", "ge"),
    }


def test_model_json_schema_includes_nesting():
    """model_json_schema (src/satya/__init__.py:882-918) emits the
    nested structure; feeding it back through from_json_schema yields
    an equivalent validating spec."""
    from satya_spark.spec_json import from_json_schema

    js = Person.model_json_schema()
    assert js["properties"]["address"]["properties"]["street"]["minLength"] == 5
    assert js["properties"]["address"]["properties"]["zipcode"]["pattern"] == r"^\d{5}$"
    assert "name" in js["required"] and "address" in js["required"]

    js2 = Post.model_json_schema()
    assert js2["properties"]["tags"]["minItems"] == 1
    assert js2["properties"]["tags"]["items"]["properties"]["color"]["enum"] == [
        "red", "blue", "green",
    ]

    spec = from_json_schema(js)
    assert spec.field("address.street").min_length == 5
    assert spec.field("address").dtype.startswith("struct<")


# module scope: under `from __future__ import annotations` the
# metaclass resolves string annotations against the MODULE namespace,
# so function-local Model classes can't reference each other (the
# same constraint pydantic has)
class Inner(Model):
    x: int = Field(ge=0)


class BaseM(Model):
    inner: Inner


class Child(BaseM):
    extra_f: str = Field(min_length=1)


def test_inherited_nested_model_fields(spark):
    """Nested fields declared on a BASE class flow through inheritance:
    the child's spec carries the flattened dotted paths and both
    validation paths enforce them."""
    Child.validator(spark)
    c = Child(inner={"x": 1}, extra_f="a")
    assert c.inner.x == 1 and c.__fields_set__ == {"inner", "extra_f"}
    with pytest.raises(ModelValidationError):
        Child(inner={"x": -1}, extra_f="a")
    names = [f.name for f in Child.spec().fields]
    assert "inner" in names and "inner.x" in names and "extra_f" in names
    df = spark.createDataFrame(
        [((0,), "a"), ((-3,), "b")],
        "inner struct<x:bigint>, extra_f string",
    )
    rows = Child.validate_df(df).collect()
    assert rows[0]["valid"] and not rows[1]["valid"]
    assert [
        (v["field"], v["constraint_name"]) for v in rows[1]["violations"]
    ] == [("inner.x", "ge")]
