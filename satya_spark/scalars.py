"""Scalar + array validators — the reference's non-object validation
surface (``src/satya/scalar_validators.py``,
``src/satya/array_validator.py``): standalone validators for a single
string/int/number/bool/array value.

Spark-first re-architecture: the reference wraps its Rust core by
building a one-field object schema per validator. Spinning a Spark
job per scalar would be absurd, so single values run through
:mod:`satya_spark.pykernels` — the pure-Python kernel twins that are
hypothesis-fuzz-pinned against the compiled Catalyst kernels
(tests/test_property.py), i.e. semantics identical to the scale path
by construction, JVM-free. The SCALE path is first-class: every
validator exposes ``with_validation(df, column)`` that compiles the
same one-field spec to codegen'd kernels over a DataFrame column.
"""

from __future__ import annotations

from typing import Any, List, Optional, Union

from .compat import ValidationError, ValidationResult
from .pykernels import value_violations
from .spec import FieldSpec, TableSpec


class _ScalarValidator:
    """Shared machinery: one FieldSpec named ``value``, a Python type
    gate, pykernel verdicts for scalars, compiled kernels for frames."""

    _dtype = "string"

    def _init_spec(self, **constraints: Any) -> None:
        kept = {}
        for k, v in constraints.items():
            if v is None:
                continue
            # keep ge=0 / gt=0.0 (0 == False in Python); drop only
            # literal False flags — same rule as model.Field
            if isinstance(v, bool) and not v:
                continue
            kept[k] = v
        self._spec = FieldSpec("value", self._dtype, required=True, **kept)

    def _type_error(self, value: Any) -> Optional[str]:  # pragma: no cover
        raise NotImplementedError

    def validate(self, value: Any) -> ValidationResult:
        terr = self._type_error(value)
        if terr is not None:
            return ValidationResult(
                value=None,
                errors=[
                    ValidationError(
                        "value", terr, value=value, constraint="type"
                    )
                ],
            )
        bad = value_violations(self._spec, value)
        if bad:
            return ValidationResult(
                value=None,
                errors=[
                    ValidationError(
                        "value", f"{c} violated", value=value, constraint=c
                    )
                    for c in bad
                ],
            )
        return ValidationResult(value=value, errors=[])

    def validate_batch(self, values: List[Any]) -> List[ValidationResult]:
        return [self.validate(v) for v in values]

    def is_valid(self, value: Any) -> bool:
        return self.validate(value).is_valid

    # --- scale path -----------------------------------------------------
    def with_validation(self, df, column: str):
        """The same constraint set compiled to Catalyst kernels over
        ``df[column]`` — adds ``valid`` + ``violations`` columns. The
        FieldSpec is RENAMED, never re-filtered (a re-filter once
        dropped ge=0/gt=0.0 via the 0 == False trap)."""
        import dataclasses as _dc

        from .compiler import compile_spec

        spec = TableSpec(
            name="scalar", fields=(_dc.replace(self._spec, name=column),)
        )
        return compile_spec(spec).with_validation(df)


class StringValidator(_ScalarValidator):
    """src/satya/scalar_validators.py:15-98."""

    _dtype = "string"

    def __init__(
        self,
        *,
        min_length: Optional[int] = None,
        max_length: Optional[int] = None,
        pattern: Optional[str] = None,
        email: bool = False,
        url: bool = False,
        enum: Optional[List[str]] = None,
    ):
        self._init_spec(
            min_length=min_length,
            max_length=max_length,
            pattern=pattern,
            email=email,
            url=url,
            enum=tuple(enum) if enum else None,
        )

    def _type_error(self, value: Any) -> Optional[str]:
        if not isinstance(value, str):
            return f"Expected string, got {type(value).__name__}"
        return None


class IntValidator(_ScalarValidator):
    """src/satya/scalar_validators.py:100-178 (bool is NOT an int,
    matching the reference's explicit exclusion)."""

    _dtype = "long"

    def __init__(
        self,
        *,
        ge: Optional[int] = None,
        le: Optional[int] = None,
        gt: Optional[int] = None,
        lt: Optional[int] = None,
        multiple_of: Optional[int] = None,
        enum: Optional[List[int]] = None,
    ):
        self._init_spec(
            ge=ge, le=le, gt=gt, lt=lt, multiple_of=multiple_of,
            enum=tuple(enum) if enum else None,
        )

    def _type_error(self, value: Any) -> Optional[str]:
        if not isinstance(value, int) or isinstance(value, bool):
            return f"Expected integer, got {type(value).__name__}"
        return None


class NumberValidator(_ScalarValidator):
    """src/satya/scalar_validators.py:180-260 — float OR int."""

    _dtype = "double"

    def __init__(
        self,
        *,
        ge: Optional[float] = None,
        le: Optional[float] = None,
        gt: Optional[float] = None,
        lt: Optional[float] = None,
        multiple_of: Optional[float] = None,
    ):
        self._init_spec(ge=ge, le=le, gt=gt, lt=lt, multiple_of=multiple_of)

    def _type_error(self, value: Any) -> Optional[str]:
        if not isinstance(value, (int, float)) or isinstance(value, bool):
            return f"Expected number, got {type(value).__name__}"
        return None


class BooleanValidator(_ScalarValidator):
    """src/satya/scalar_validators.py (strict: only True/False)."""

    _dtype = "bool"

    def __init__(self) -> None:
        self._init_spec()

    def _type_error(self, value: Any) -> Optional[str]:
        if not isinstance(value, bool):
            return f"Expected boolean, got {type(value).__name__}"
        return None


_ITEM_TYPES = {
    "string": ("string", str),
    "integer": ("long", int),
    "number": ("double", (int, float)),
    "boolean": ("bool", bool),
}


class ArrayValidator(_ScalarValidator):
    """src/satya/array_validator.py:11-120 — container rules
    (min/max/unique) plus per-item type checks."""

    def __init__(
        self,
        item_type: Union[str, type, None] = None,
        *,
        min_items: Optional[int] = None,
        max_items: Optional[int] = None,
        unique_items: bool = False,
    ):
        type_map = {str: "string", int: "integer", float: "number", bool: "boolean"}
        if isinstance(item_type, type):
            self.item_type_str = type_map.get(item_type, "string")
        else:
            self.item_type_str = item_type or "string"
        if self.item_type_str not in _ITEM_TYPES:
            raise ValueError(
                f"unsupported array item type: {self.item_type_str!r}"
                f" (supported: {sorted(_ITEM_TYPES)})"
            )
        dtype, self._py_item = _ITEM_TYPES[self.item_type_str]
        self._dtype = f"array<{dtype}>"
        self._init_spec(
            min_items=min_items, max_items=max_items, unique_items=unique_items
        )

    def _type_error(self, value: Any) -> Optional[str]:
        if not isinstance(value, (list, tuple)):
            return f"Expected array, got {type(value).__name__}"
        for i, item in enumerate(value):
            ok = isinstance(item, self._py_item) and not (
                self.item_type_str in ("integer", "number")
                and isinstance(item, bool)
            )
            if not ok:
                return (
                    f"Item {i}: expected {self.item_type_str},"
                    f" got {type(item).__name__}"
                )
        return None


__all__ = [
    "StringValidator",
    "IntValidator",
    "NumberValidator",
    "BooleanValidator",
    "ArrayValidator",
]
