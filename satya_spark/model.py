"""Model facade — the ``class User(Model)`` declaration surface
(reference ``src/satya/__init__.py:215-337`` ModelMetaclass + Model).

A satya user's primary API is a Model subclass with annotated fields
and ``Field(...)`` kwargs. This facade reproduces that declaration
shape and routes it into the Spark engine twice over:

* small-batch / single-record: ``model_validate`` /
  ``model_validate_batch`` go through the compat
  :class:`~satya_spark.compat.StreamValidator` (compiled once per
  class, cached — the ``_validator_instance`` analog);
* at scale: ``spec()`` yields the :class:`TableSpec`, so
  ``validate_df(df)`` runs the SAME declaration as one codegen'd
  DataFrame pass — the 100 TB path a reference user graduates to
  without re-declaring anything.

Supported annotation vocabulary: str, int, float, bool,
datetime.datetime, Decimal, List[str]/List[int], Dict[str, str],
Optional[T] (→ required=False), plus the marker types EmailStr /
HttpUrl / PositiveInt / NonNegativeInt / PositiveFloat /
NonNegativeFloat / SecretStr (src/satya/special_types.py analogs).
"""

from __future__ import annotations

import datetime as _dt
import json
from decimal import Decimal
from typing import Any, Dict, List, Optional, Union, get_args, get_origin

from .spec import FieldSpec, TableSpec


# --- annotation marker types (special_types analogs) -----------------------

class EmailStr(str):
    """Annotation marker: validated email (special_types.py:139-153)."""


class HttpUrl(str):
    """Annotation marker: http(s) URL (special_types.py:155-170)."""


class SecretStr(str):
    """Annotation marker: masked-in-errors string (special_types.py:17-31)."""


class PositiveInt(int):
    """Annotation marker: int > 0 (special_types.py:172-181)."""


class NegativeInt(int):
    """Annotation marker: int < 0 (special_types.py:183-192)."""


class NonNegativeInt(int):
    """Annotation marker: int >= 0 (special_types.py:194-203)."""


class PositiveFloat(float):
    """Annotation marker: float > 0 (special_types.py:205-215)."""


class NegativeFloat(float):
    """Annotation marker: float < 0 (special_types.py:217-227)."""


class NonNegativeFloat(float):
    """Annotation marker: float >= 0 (special_types.py:229-238)."""


# marker class -> special_types.PRESETS key (single source of truth)
from .special_types import PRESETS as _PRESET_TABLE  # noqa: E402

_MARKERS: Dict[type, tuple] = {
    cls: _PRESET_TABLE[cls.__name__.lower()]
    for cls in (
        EmailStr, HttpUrl, SecretStr, PositiveInt, NegativeInt,
        NonNegativeInt, PositiveFloat, NegativeFloat, NonNegativeFloat,
    )
}

_SCALARS: Dict[type, str] = {
    str: "string",
    int: "long",
    float: "double",
    bool: "bool",
    _dt.datetime: "timestamp",
    Decimal: "decimal(38,6)",
    bytes: "string",
}

_FIELD_KWARGS = (
    "min_length", "max_length", "pattern", "email", "url", "enum",
    "ge", "le", "gt", "lt", "min_value", "max_value", "multiple_of",
    "min_items", "max_items", "unique_items",
    "strip_whitespace", "to_lower", "to_upper", "alias",
)


class Field:
    """Field definition kwargs holder — reference ``Field``
    (src/satya/__init__.py:94-171). Unknown-to-columnar kwargs
    (description/example/title/repr/...) are accepted and ignored,
    so reference class bodies paste over unchanged."""

    def __init__(self, type_: Any = None, *, required: Optional[bool] = None,
                 default: Any = None, **kw: Any):
        self.type = type_
        self.required = required
        self.default = default
        self.kw = {}
        for k, v in kw.items():
            if k not in _FIELD_KWARGS:
                continue  # description/example/title/... ignored
            # keep gt=0 / ge=0.0 (0 == False in Python)
            if isinstance(v, bool):
                if v:
                    self.kw[k] = v
            elif v is not None:
                self.kw[k] = v


def _resolve(annotation: Any) -> tuple:
    """annotation → (dtype, extra_kwargs, required_default)."""
    import types as _types

    origin = get_origin(annotation)
    # typing.Optional[T] and PEP 604 `T | None` both mean optional;
    # any OTHER union (int | str) has no column type and must fail
    # loudly, not silently validate as Optional[first-arm]
    if origin is Union or isinstance(annotation, _types.UnionType):
        all_args = get_args(annotation)
        args = [a for a in all_args if a is not type(None)]
        if type(None) not in all_args or len(args) != 1:
            raise TypeError(
                f"unsupported Model annotation: {annotation!r} "
                "(only Optional[T] / T | None unions are columnar)"
            )
        dtype, extra, _ = _resolve(args[0])
        return dtype, extra, False
    if origin in (list, List):
        (inner,) = get_args(annotation) or (str,)
        idt, iextra, _ = _resolve(inner)
        return f"array<{idt}>", iextra, True
    if origin in (dict, Dict):
        args = get_args(annotation) or (str, str)
        vdt, vextra, _ = _resolve(args[1])
        return f"map<string,{vdt}>", vextra, True
    if annotation in _MARKERS:
        dtype, extra = _MARKERS[annotation]
        return dtype, dict(extra), True
    if annotation in _SCALARS:
        return _SCALARS[annotation], {}, True
    raise TypeError(f"unsupported Model annotation: {annotation!r}")


class ModelValidationError(Exception):
    """Raised when Model construction fails (src/satya/__init__.py:76-81)."""

    def __init__(self, errors: list):
        self.errors = errors
        super().__init__("; ".join(f"{e.field}: {e.message}" for e in errors))


class ModelMeta(type):
    def __new__(mcs, name, bases, ns):
        own_names = [
            n for n in ns.get("__annotations__", {}) if not n.startswith("_")
        ]
        defs = {n: ns.pop(n, Field()) for n in own_names}
        ns["_validator_instance"] = None
        cls = super().__new__(mcs, name, bases, ns)

        fields: Dict[str, Field] = {}
        for base in bases:
            fields.update(getattr(base, "__fields__", {}))
        if own_names:
            from typing import get_type_hints

            # resolves string annotations (PEP 563 / `from __future__
            # import annotations`) against the defining module
            hints = get_type_hints(cls)
        for fname in own_names:
            fdef = defs[fname]
            if not isinstance(fdef, Field):
                fdef = Field(default=fdef)
            ann = fdef.type if fdef.type is not None else hints[fname]
            dtype, extra, required = _resolve(ann)
            if fdef.required is not None:
                required = fdef.required
            if fdef.default is not None:
                required = False
            fdef._spec = FieldSpec(
                name=fname,
                dtype=dtype,
                required=required,
                default=fdef.default,
                **{**extra, **fdef.kw},
            )
            fields[fname] = fdef
        cls.__fields__ = fields
        return cls


class Model(metaclass=ModelMeta):
    """Reference-shaped Model base (src/satya/__init__.py:330-900,
    reduced to the validation/dump surface)."""

    __fields__: Dict[str, Field] = {}

    def __init__(self, **data: Any):
        errs = type(self).validator().validate(data).errors
        if errs:
            raise ModelValidationError(errs)
        self._data = {
            n: data.get(n, f.default) for n, f in type(self).__fields__.items()
        }

    def __getattr__(self, item: str) -> Any:
        d = self.__dict__.get("_data") or {}
        if item in d:
            return d[item]
        raise AttributeError(item)

    def __repr__(self) -> str:  # pragma: no cover
        inner = ", ".join(f"{k}={v!r}" for k, v in self._data.items())
        return f"{type(self).__name__}({inner})"

    # --- class-level spec / validator (compiled once, cached) ---------
    @classmethod
    def spec(cls) -> TableSpec:
        return TableSpec(
            name=cls.__name__.lower(),
            fields=tuple(f._spec for f in cls.__fields__.values()),
        )

    @classmethod
    def validator(cls, spark=None):
        """StreamValidator for this Model — the _validator_instance
        cache analog (src/satya/__init__.py:526-599)."""
        from .compat import StreamValidator

        v = cls.__dict__.get("_validator_instance")
        if v is None:
            v = StreamValidator(spark)
            for fname, fdef in cls.__fields__.items():
                s = fdef._spec
                kw = {}
                for k in _FIELD_KWARGS:
                    if k == "alias":
                        continue
                    val = getattr(s, k)
                    # NB: `val not in (None, False)` would drop gt=0 /
                    # ge=0.0 (0 == False in Python)
                    if isinstance(val, bool):
                        if val:
                            kw[k] = val
                    elif val is not None:
                        kw[k] = val
                v._fields[fname] = {
                    "dtype": s.dtype,
                    "required": s.required,
                    **kw,
                    **({"secret": True} if s.secret else {}),
                }
            cls._validator_instance = v
        return v

    # --- validation entry points (src/satya/__init__.py:607-731) ------
    @classmethod
    def model_validate(cls, data: Dict[str, Any]) -> "Model":
        return cls(**data)

    @classmethod
    def model_validate_json(cls, json_str: Union[str, bytes]) -> "Model":
        return cls(**json.loads(json_str))

    @classmethod
    def model_validate_batch(cls, items: List[dict]) -> List[bool]:
        return cls.validator().validate_batch(items)

    # --- the scale path -------------------------------------------------
    @classmethod
    def validate_df(cls, df):
        """The SAME class declaration as one codegen'd DataFrame pass:
        input + valid + violations columns. This is where a reference
        user's Model graduates to the 10^12-row path."""
        from pyspark.sql import functions as F

        from .coerce import spark_type
        from .compiler import compile_spec

        spec = cls.spec()
        out = df
        for f in spec.fields:
            if f.name not in df.columns:  # missing key ≡ null (§2.2)
                out = out.withColumn(f.name, F.lit(None).cast(spark_type(f.dtype)))
        return compile_spec(spec).with_validation(out)

    # --- dump (src/satya/__init__.py:732-794) ---------------------------
    def model_dump(
        self,
        *,
        include: Optional[set] = None,
        exclude: Optional[set] = None,
        by_alias: bool = False,
        exclude_none: bool = False,
    ) -> Dict[str, Any]:
        out = {}
        for n, f in type(self).__fields__.items():
            if include is not None and n not in include:
                continue
            if exclude and n in exclude:
                continue
            v = self._data.get(n)
            if exclude_none and v is None:
                continue
            key = f._spec.alias if (by_alias and f._spec.alias) else n
            out[key] = v
        return out

    def model_dump_json(self, **kw: Any) -> str:
        def _default(o):
            if isinstance(o, (_dt.datetime, _dt.date)):
                return o.isoformat()
            if isinstance(o, Decimal):
                return float(o)
            return str(o)

        return json.dumps(self.model_dump(**kw), default=_default)
