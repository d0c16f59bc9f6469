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
from .spec import SECRET_MASK, FieldSpec, TableSpec

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

# special-type presets (src/satya/special_types.py:139-238): usable as
# the field_type in add_field, e.g. add_field("age", "PositiveInt").
# Single source of truth: special_types.PRESETS.
from .special_types import PRESETS as _PRESETS  # noqa: E402

_CONSTRAINT_KEYS = (
    "min_length", "max_length", "pattern", "email", "url", "enum",
    "ge", "le", "gt", "lt", "min_value", "max_value", "multiple_of",
    "min_items", "max_items", "unique_items",
)


_SUGGESTIONS = {
    "required": "provide a non-null value",
    "type": "pass a value of the declared type",
    "min_length": "lengthen the value (whitespace is trimmed first)",
    "max_length": "shorten the value",
    "pattern": "match the declared regex",
    "email": "use a valid email address (max 254 chars)",
    "url": "use an http(s):// URL",
    "enum": "use one of the allowed values",
    "ge": "increase the value",
    "gt": "increase the value",
    "le": "decrease the value",
    "lt": "decrease the value",
    "min_value": "increase the value",
    "max_value": "decrease the value",
    "multiple_of": "use a multiple of the declared step",
    "min_items": "add items",
    "max_items": "remove items",
    "unique_items": "remove duplicate items",
}


class ValidationError:
    """ValidationError shape (src/satya/__init__.py:20-48): field,
    message, dotted ``path``, offending ``value``, ``constraint`` name
    and a human ``suggestion``."""

    __slots__ = ("field", "message", "path", "value", "constraint", "suggestion")

    def __init__(
        self,
        field: str,
        message: str,
        value: Any = None,
        path: Optional[List[str]] = None,
        constraint: Optional[str] = None,
        suggestion: Optional[str] = None,
    ):
        self.field = field
        self.message = message
        self.path = path if path is not None else field.split(".")
        self.value = value
        self.constraint = constraint
        self.suggestion = (
            suggestion
            if suggestion is not None
            else _SUGGESTIONS.get(constraint or "", None)
        )

    def __str__(self) -> str:
        loc = ".".join(self.path) if self.path else self.field
        parts = [f"{loc}: {self.message}"]
        if self.value is not None:
            parts.append(f"  Value: {self.value!r}")
        if self.constraint:
            parts.append(f"  Constraint: {self.constraint}")
        if self.suggestion:
            parts.append(f"  Suggestion: {self.suggestion}")
        return "\n".join(parts)

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
        if ftype.lower() in _PRESETS:
            dtype, preset_kw = _PRESETS[ftype.lower()]
            kwargs.update(preset_kw)
        else:
            dtype = _TYPE_MAP.get(ftype.lower(), "string")
        self._fields[name] = {
            "dtype": dtype,
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

    @staticmethod
    def _type_check(v: Any, dtype: str):
        """Strict type conformance (bool ≠ int, src/lib.rs:614,804-807).
        Returns (ok_value_for_df, error_message|None). A mismatch is a
        per-field ValidationError — NOT a batch-aborting exception
        (reference StreamValidator accumulates it like any other
        failure)."""
        import datetime as _dt

        if v is None:
            return None, None
        if dtype == "string":
            return (v, None) if isinstance(v, str) else (None, "str")
        if dtype in ("long", "int"):
            if isinstance(v, int) and not isinstance(v, bool):
                return v, None
            return None, "int"
        if dtype == "double":
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return float(v), None
            return None, "float"
        if dtype == "bool":
            return (v, None) if isinstance(v, bool) else (None, "bool")
        if dtype == "timestamp":
            if isinstance(v, _dt.datetime):
                return v, None
            if isinstance(v, str):
                try:  # ISO with Z→+00:00, the coercion-tier rule
                    return _dt.datetime.fromisoformat(v.replace("Z", "+00:00")), None
                except ValueError:
                    return None, "datetime"
            return None, "datetime"
        if dtype.startswith("decimal"):
            import decimal as _dec

            if isinstance(v, _dec.Decimal):
                return v, None
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return _dec.Decimal(str(v)), None
            if isinstance(v, str):
                try:
                    return _dec.Decimal(v), None
                except _dec.InvalidOperation:
                    return None, "Decimal"
            return None, "Decimal"
        if dtype.startswith("array"):
            if not isinstance(v, (list, tuple)):
                return None, "list"
            inner = dtype[dtype.index("<") + 1 : dtype.rindex(">")]
            out = []
            for item in v:
                ok_item, want = StreamValidator._type_check(item, inner)
                if want is not None:
                    return None, f"list[{want}]"
                out.append(ok_item)
            return out, None
        if dtype.startswith("map"):
            if not isinstance(v, dict):
                return None, "dict"
            vt = dtype[dtype.index("<") + 1 : dtype.rindex(">")].split(",", 1)[1].strip()
            out = {}
            for k, item in v.items():
                if not isinstance(k, str):
                    return None, "dict[str,...]"
                ok_item, want = StreamValidator._type_check(item, vt)
                if want is not None:
                    return None, f"dict[str,{want}]"
                out[k] = ok_item
            return out, None
        return v, None

    def _ingest(self, items: List[dict]):
        """(rows for createDataFrame, per-item type errors). Missing
        key ≡ null (SURVEY.md §2.2); type-mismatched values become
        null in the frame (value rules skip them) and carry a type
        ValidationError."""
        rows, type_errs = [], []
        for item in items:
            vals, errs = [], []
            for n, kw in self._fields.items():
                ok_v, want = self._type_check(item.get(n), kw["dtype"])
                vals.append(ok_v)
                if want is not None:
                    errs.append(
                        ValidationError(
                            n,
                            f"Expected {want}, got {type(item.get(n)).__name__}",
                            # secret fields never surface their value,
                            # in the type-error path either
                            value=SECRET_MASK if kw.get("secret") else item.get(n),
                            constraint="type",
                        )
                    )
            rows.append(tuple(vals))
            type_errs.append(errs)
        return rows, type_errs

    # -- validation entry points ----------------------------------------
    def validate(self, item: dict) -> ValidationResult:
        res = self.validate_batch_results([item])
        return res[0]

    def validate_batch(self, items: List[dict]) -> List[bool]:
        """list of dicts → list of bool (src/lib.rs:359-392)."""
        compiled = self._ensure()
        rows, type_errs = self._ingest(items)
        df = self._spark.createDataFrame(rows, self._schema())
        return [
            bool(r["valid"]) and not errs
            for r, errs in zip(compiled.with_validation(df).collect(), type_errs)
        ]

    def validate_batch_results(self, items: List[dict]) -> List[ValidationResult]:
        compiled = self._ensure()
        rows, type_errs = self._ingest(items)
        df = self._spark.createDataFrame(rows, self._schema())
        out = []
        for item, row, terrs in zip(
            items, compiled.with_validation(df).collect(), type_errs
        ):
            # a mistyped value was PRESENT: suppress the 'required'
            # violation its null placeholder would otherwise raise
            mistyped = {e.field for e in terrs}
            errs = list(terrs) + [
                ValidationError(
                    v["field"],
                    f"{v['constraint_name']} violated",
                    value=v["offending_value"],
                    constraint=v["constraint_name"],
                )
                for v in row["violations"]
                if not (v["constraint_name"] == "required" and v["field"] in mistyped)
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
