"""satya-compatible facade — the literal switching surface.

A user of the reference drives it through ``StreamValidator``
(``add_field`` / ``set_constraints`` / ``validate`` /
``validate_batch`` / ``validate_stream``, reference
``src/satya/validator.py:10-21,178-390``) or a ``Model`` subclass.
This module reproduces that call shape on top of the Spark engine so
existing satya call sites port mechanically; under the hood every
call compiles to the same Column kernels the DataFrame API uses.

Scale note: these entry points exist for COMPATIBILITY and small
batches (they round-trip python objects through createDataFrame).
The native surface — DataFrames in, DataFrames out — is the 100 TB
path; this facade is the on-ramp.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Iterator, List, Optional

from .compiler import compile_spec
from .spec import FieldSpec, TableSpec

_TYPE_MAP = {
    "str": "string",
    "string": "string",
    "int": "long",
    "integer": "long",
    "float": "double",
    "bool": "bool",
    "boolean": "bool",
    "datetime": "timestamp",
    "date-time": "timestamp",
    "email": "string",
    "url": "string",
    "list[str]": "array<string>",
}

_CONSTRAINT_KEYS = (
    "min_length", "max_length", "pattern", "email", "url", "enum",
    "ge", "le", "gt", "lt", "min_value", "max_value", "multiple_of",
    "min_items", "max_items", "unique_items",
)


class ValidationError:
    """ValidationError shape (src/satya/__init__.py:20-48)."""

    __slots__ = ("field", "message", "value")

    def __init__(self, field: str, message: str, value: Any = None):
        self.field = field
        self.message = message
        self.value = value

    def __repr__(self) -> str:  # pragma: no cover
        return f"ValidationError(field={self.field!r}, message={self.message!r})"


class ValidationResult:
    """ValidationResult shape (src/satya/__init__.py:50-73)."""

    def __init__(self, value: Any = None, errors: Optional[List[ValidationError]] = None):
        self._value = value
        self.errors = errors or []

    @property
    def is_valid(self) -> bool:
        return not self.errors

    @property
    def value(self) -> Any:
        if self.errors:
            raise ValueError(f"Cannot get value from invalid result: {self.errors}")
        return self._value


class StreamValidator:
    """Drop-in call shape for satya's StreamValidator
    (``src/satya/validator.py``): declare fields + constraints, then
    validate dicts/batches/streams. Spark-backed; compiled once."""

    def __init__(self, spark=None):
        self._spark = spark
        self._fields: Dict[str, dict] = {}
        self._compiled = None

    # -- declaration (add_field/set_constraints, validator.py:98-176) --
    def add_field(self, name: str, field_type: str = "str", required: bool = True) -> None:
        ftype = field_type if isinstance(field_type, str) else getattr(
            field_type, "__name__", "str"
        ).lower()
        kwargs: Dict[str, Any] = {}
        if ftype in ("email", "url"):
            kwargs[ftype] = True
        self._fields[name] = {
            "dtype": _TYPE_MAP.get(ftype.lower(), "string"),
            "required": required,
            **kwargs,
        }
        self._compiled = None

    def set_constraints(self, name: str, **constraints: Any) -> None:
        unknown = set(constraints) - set(_CONSTRAINT_KEYS)
        if unknown:
            raise ValueError(f"unknown constraints: {sorted(unknown)}")
        if "enum" in constraints and constraints["enum"] is not None:
            constraints["enum"] = tuple(constraints["enum"])
        self._fields[name].update(constraints)
        self._compiled = None

    # -- compilation (compile once, validator cache analog) ----------
    def _ensure(self):
        if self._compiled is None:
            spec = TableSpec(
                name="compat",
                fields=tuple(
                    FieldSpec(name=n, **kw) for n, kw in self._fields.items()
                ),
            )
            self._compiled = compile_spec(spec)
            self._spec = spec
        if self._spark is None:
            from .session import get_spark

            self._spark = get_spark(app_name="satya-compat", cpus=4)
        return self._compiled

    def _schema(self) -> str:
        from .coerce import spark_type

        return ", ".join(
            f"`{n}` {spark_type(kw['dtype'])}" for n, kw in self._fields.items()
        )

    def _rows(self, items: List[dict]):
        # missing key ≡ null (SURVEY.md §2.2)
        return [tuple(i.get(n) for n in self._fields) for i in items]

    # -- validation entry points ----------------------------------------
    def validate(self, item: dict) -> ValidationResult:
        res = self.validate_batch_results([item])
        return res[0]

    def validate_batch(self, items: List[dict]) -> List[bool]:
        """list of dicts → list of bool (src/lib.rs:359-392)."""
        compiled = self._ensure()
        df = self._spark.createDataFrame(self._rows(items), self._schema())
        return [r["valid"] for r in compiled.with_validation(df).collect()]

    def validate_batch_results(self, items: List[dict]) -> List[ValidationResult]:
        compiled = self._ensure()
        df = self._spark.createDataFrame(self._rows(items), self._schema())
        out = []
        for item, row in zip(items, compiled.with_validation(df).collect()):
            errs = [
                ValidationError(
                    v["field"],
                    f"{v['constraint_name']} violated",
                    v["offending_value"],
                )
                for v in row["violations"]
            ]
            out.append(ValidationResult(value=item if not errs else None, errors=errs))
        return out

    def validate_stream(
        self, items: Iterable[dict], batch_size: int = 10_000
    ) -> Iterator[ValidationResult]:
        """lazy iterator → iterator (validator.py:376-390), micro-batched."""
        buf: List[dict] = []
        for it in items:
            buf.append(it)
            if len(buf) >= batch_size:
                yield from self.validate_batch_results(buf)
                buf = []
        if buf:
            yield from self.validate_batch_results(buf)
