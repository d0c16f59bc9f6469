"""JSON Schema ↔ TableSpec, the analog of satya's two-way bridge:
``compile_json_schema`` (JSON Schema → validator,
``src/satya/json_schema_compiler.py:32-72``) and
``Model.model_json_schema()`` (model → JSON Schema,
``src/satya/__init__.py:882-918``).

Supported keyword mapping (same vocabulary the reference compiles):
type, required, minLength/maxLength, pattern, format: email|uri,
enum, minimum/maximum (ge/le), exclusiveMinimum/Maximum (gt/lt),
multipleOf, minItems/maxItems/uniqueItems — plus NESTED composition:

* object property with ``properties``          → struct column +
  dotted-path FieldSpecs (the nested-Model surface)
* array property with object ``items``         → array<struct> with
  per-element rules (``FieldSpec.item_fields``)
* object property with object
  ``additionalProperties``                     → map<string,struct>
  with per-value rules
* scalar ``items`` / ``additionalProperties``  → typed array/map with
  the item constraints applied per element (the compiler's per-item
  kernels)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

from .spec import FieldSpec, TableSpec

_JSON_TO_DTYPE = {
    "string": "string",
    "integer": "long",
    "number": "double",
    "boolean": "bool",
}
_DTYPE_TO_JSON = {
    "string": "string",
    "int": "integer",
    "long": "integer",
    "double": "number",
    "float": "number",
    "bool": "boolean",
    "timestamp": "string",
}

_SCALAR_KEYS = (
    ("minLength", "min_length"),
    ("maxLength", "max_length"),
    ("pattern", "pattern"),
    ("minimum", "ge"),
    ("maximum", "le"),
    ("exclusiveMinimum", "gt"),
    ("exclusiveMaximum", "lt"),
    ("multipleOf", "multiple_of"),
)


def _scalar_kwargs(p: Dict[str, Any]) -> Dict[str, Any]:
    kw: Dict[str, Any] = {}
    for jk, sk in _SCALAR_KEYS:
        if p.get(jk) is not None:
            kw[sk] = p[jk]
    fmt = p.get("format")
    if fmt == "email":
        kw["email"] = True
    if fmt in ("uri", "url"):
        kw["url"] = True
    if "enum" in p:
        kw["enum"] = tuple(p["enum"])
    return kw


def _scalar_dtype(p: Dict[str, Any]) -> str:
    dtype = _JSON_TO_DTYPE.get(p.get("type", "string"), "string")
    if p.get("format") == "date-time":
        dtype = "timestamp"
    return dtype


def _struct_ddl(specs: List[FieldSpec]) -> str:
    """Top-level (non-dotted) inner specs → Spark struct DDL."""
    from .coerce import spark_type

    parts = ", ".join(
        f"{s.name}:{spark_type(s.dtype)}" for s in specs if "." not in s.name
    )
    return f"struct<{parts}>"


def _object_specs(schema: Dict[str, Any]) -> List[FieldSpec]:
    """Object schema → FieldSpecs with dotted names for nesting
    (relative to the object root)."""
    props = schema.get("properties", {})
    required = set(schema.get("required", []))
    out: List[FieldSpec] = []
    for fname, p in props.items():
        out.extend(_prop_specs(fname, p, fname in required))
    return out


def _prop_specs(fname: str, p: Dict[str, Any], required: bool) -> List[FieldSpec]:
    jtype = p.get("type", "string")
    if jtype == "object" and "properties" in p:
        inner = _object_specs(p)
        main = FieldSpec(name=fname, dtype=_struct_ddl(inner), required=required)
        return [main] + [
            dataclasses.replace(s, name=f"{fname}.{s.name}") for s in inner
        ]
    if jtype == "object" and isinstance(p.get("additionalProperties"), dict):
        ap = p["additionalProperties"]
        if ap.get("type") == "object" and "properties" in ap:
            inner = _object_specs(ap)
            return [
                FieldSpec(
                    name=fname,
                    dtype=f"map<string,{_struct_ddl(inner)}>",
                    required=required,
                    item_fields=tuple(inner),
                    default=p.get("default"),
                )
            ]
        return [
            FieldSpec(
                name=fname,
                dtype=f"map<string,{_scalar_dtype(ap)}>",
                required=required,
                default=p.get("default"),
                **_scalar_kwargs(ap),
            )
        ]
    if jtype == "array":
        items = p.get("items", {})
        container = dict(
            min_items=p.get("minItems"),
            max_items=p.get("maxItems"),
            unique_items=bool(p.get("uniqueItems", False)),
        )
        if items.get("type") == "object" and "properties" in items:
            inner = _object_specs(items)
            return [
                FieldSpec(
                    name=fname,
                    dtype=f"array<{_struct_ddl(inner)}>",
                    required=required,
                    item_fields=tuple(inner),
                    default=p.get("default"),
                    **container,
                )
            ]
        return [
            FieldSpec(
                name=fname,
                dtype=f"array<{_scalar_dtype(items)}>",
                required=required,
                default=p.get("default"),
                **container,
                **_scalar_kwargs(items),
            )
        ]
    return [
        FieldSpec(
            name=fname,
            dtype=_scalar_dtype(p),
            required=required,
            default=p.get("default"),
            **_scalar_kwargs(p),
        )
    ]


def from_json_schema(schema: Dict[str, Any], name: str = "schema") -> TableSpec:
    """JSON Schema (object type) → TableSpec (nested objects → struct
    columns + dotted paths; arrays/maps of objects → per-element
    struct rules)."""
    fields = _object_specs(schema)
    extra = "ignore"
    if schema.get("additionalProperties") is False:
        extra = "forbid"
    return TableSpec(name=schema.get("title", name), fields=tuple(fields), extra=extra)


def _scalar_prop(f: FieldSpec, dtype: str | None = None) -> Dict[str, Any]:
    dtype = dtype or f.dtype
    p: Dict[str, Any] = {}
    if dtype.startswith("decimal"):
        p["type"] = "number"
    else:
        p["type"] = _DTYPE_TO_JSON.get(dtype, "string")
    if dtype == "timestamp":
        p["format"] = "date-time"
    if f.email:
        p["format"] = "email"
    if f.url:
        p["format"] = "uri"
    for jk, sk in _SCALAR_KEYS:
        v = getattr(f, sk)
        if v is not None:
            p[jk] = v
    if f.enum is not None:
        p["enum"] = list(f.enum)
    if f.default is not None:
        p["default"] = f.default
    return p


def _specs_to_object(specs: List[FieldSpec]) -> Dict[str, Any]:
    """FieldSpecs (dotted names = nesting) → JSON object schema."""
    props: Dict[str, Any] = {}
    required: List[str] = []
    for s in specs:
        if "." in s.name:
            continue  # attached under its parent below
        children = [
            dataclasses.replace(c, name=c.name[len(s.name) + 1 :])
            for c in specs
            if c.name.startswith(s.name + ".")
        ]
        props[s.name] = _prop_from_spec(s, children)
        if s.required:
            required.append(s.name)
    out: Dict[str, Any] = {"type": "object", "properties": props}
    if required:
        out["required"] = required
    return out


def _prop_from_spec(f: FieldSpec, children: List[FieldSpec]) -> Dict[str, Any]:
    if f.dtype.startswith("struct"):
        return _specs_to_object(children)
    if f.dtype.startswith("array"):
        elem = f.dtype[f.dtype.index("<") + 1 : f.dtype.rindex(">")]
        p: Dict[str, Any] = {"type": "array"}
        if f.item_fields:
            p["items"] = _specs_to_object(list(f.item_fields))
        elif elem.startswith("struct"):
            p["items"] = {"type": "object"}
        else:
            items = _scalar_prop(f, dtype=elem)
            # container-level keys stay on the array, not the items
            for k in ("minItems", "maxItems", "default"):
                items.pop(k, None)
            p["items"] = items
        if f.min_items is not None:
            p["minItems"] = f.min_items
        if f.max_items is not None:
            p["maxItems"] = f.max_items
        if f.unique_items:
            p["uniqueItems"] = True
        if f.default is not None:
            p["default"] = f.default
        return p
    if f.dtype.startswith("map"):
        vt = f.dtype[f.dtype.index("<") + 1 : f.dtype.rindex(">")].split(",", 1)[1].strip()
        p = {"type": "object"}
        if f.item_fields:
            p["additionalProperties"] = _specs_to_object(list(f.item_fields))
        elif vt.startswith("struct"):
            p["additionalProperties"] = {"type": "object"}
        else:
            ap = _scalar_prop(f, dtype=vt)
            ap.pop("default", None)
            p["additionalProperties"] = ap
        if f.default is not None:
            p["default"] = f.default
        return p
    return _scalar_prop(f)


def to_json_schema(spec: TableSpec) -> Dict[str, Any]:
    """TableSpec → JSON Schema (object type), inverse of
    :func:`from_json_schema` including nested structure."""
    out = _specs_to_object(list(spec.fields))
    out = {"title": spec.name, **out}
    if spec.extra == "forbid":
        out["additionalProperties"] = False
    return out


# --- JSON Schema -> validator compiler (reference -------------------------
# src/satya/json_schema_compiler.py): scalar/array schemas compile to
# the standalone scalar validators (pykernels single-value path +
# compiled-kernel scale path); object schemas compile through
# from_json_schema to a TableSpec-backed validator. JVM-free until a
# DataFrame is involved.

class ObjectSchemaValidator:
    """Validator for ``type: object`` schemas: dict validation via the
    fuzz-pinned pure-Python kernel twins (dotted paths navigated),
    scale via the compiled Catalyst kernels."""

    def __init__(self, spec: TableSpec):
        self.spec = spec

    def validate(self, data: Any):
        from .compat import ValidationError, ValidationResult
        from .pykernels import value_violations

        if not isinstance(data, dict):
            return ValidationResult(
                value=None,
                errors=[
                    ValidationError(
                        "<object>",
                        f"Expected object, got {type(data).__name__}",
                        constraint="type",
                    )
                ],
            )
        errors = []
        for f in self.spec.fields:
            cur: Any = data
            missing = False
            for part in f.name.split("."):
                if not isinstance(cur, dict) or part not in cur:
                    missing = True
                    break
                cur = cur[part]
            if missing or cur is None:
                if f.required:
                    errors.append(
                        ValidationError(
                            f.name, "required field missing",
                            constraint="required",
                        )
                    )
                continue
            errors.extend(
                ValidationError(
                    f.name, f"{c} violated", value=cur, constraint=c
                )
                for c in value_violations(f, cur)
            )
        if self.spec.extra == "forbid":
            tops = {f.name.split(".")[0] for f in self.spec.fields}
            errors.extend(
                ValidationError(
                    k, "extra fields not permitted", constraint="extra_field"
                )
                for k in data
                if k not in tops
            )
        from .compat import ValidationResult as VR

        return VR(value=data if not errors else None, errors=errors)

    def validate_batch(self, items):
        return [self.validate(it) for it in items]

    def with_validation(self, df):
        from .compiler import compile_spec

        return compile_spec(self.spec).with_validation(df)


class JSONSchemaCompiler:
    """reference json_schema_compiler.py:13-50 — compiles a JSON
    Schema document into the matching validator."""

    def __init__(self) -> None:
        # shape-compatible stats attribute; our "optimized" tier is
        # the compiled-kernel/pykernel path (there is no Rust here)
        self.optimization_stats = {"kernel_compiled": 0, "python_fallback": 0}

    def compile(self, schema: Dict[str, Any]):
        from .scalars import (
            ArrayValidator,
            BooleanValidator,
            IntValidator,
            NumberValidator,
            StringValidator,
        )

        if not isinstance(schema, dict):
            raise ValueError(f"schema must be a dict, got {type(schema).__name__}")
        stype = schema.get("type")
        self.optimization_stats["kernel_compiled"] += 1
        if stype == "string":
            fmt = schema.get("format")
            return StringValidator(
                min_length=schema.get("minLength"),
                max_length=schema.get("maxLength"),
                pattern=schema.get("pattern"),
                email=fmt == "email",
                url=fmt in ("uri", "url"),
                enum=schema.get("enum"),
            )
        if stype == "integer":
            return IntValidator(
                ge=schema.get("minimum"),
                le=schema.get("maximum"),
                gt=schema.get("exclusiveMinimum"),
                lt=schema.get("exclusiveMaximum"),
                multiple_of=schema.get("multipleOf"),
                enum=schema.get("enum"),
            )
        if stype == "number":
            return NumberValidator(
                ge=schema.get("minimum"),
                le=schema.get("maximum"),
                gt=schema.get("exclusiveMinimum"),
                lt=schema.get("exclusiveMaximum"),
                multiple_of=schema.get("multipleOf"),
            )
        if stype == "boolean":
            return BooleanValidator()
        if stype == "array":
            items = schema.get("items") or {}
            return ArrayValidator(
                items.get("type", "string"),
                min_items=schema.get("minItems"),
                max_items=schema.get("maxItems"),
                unique_items=schema.get("uniqueItems", False),
            )
        if stype == "object":
            return ObjectSchemaValidator(from_json_schema(schema))
        self.optimization_stats["kernel_compiled"] -= 1
        self.optimization_stats["python_fallback"] += 1
        raise ValueError(f"unsupported JSON Schema type: {stype!r}")


def compile_json_schema(schema: Dict[str, Any]):
    """reference json_schema_compiler.py module-level entry."""
    return JSONSchemaCompiler().compile(schema)


def load_json(json_str):
    """reference json_loader.py:17-44 — fastest available JSON parse
    (orjson when importable, stdlib otherwise), ValueError on bad
    input."""
    try:
        import orjson  # noqa: F401 — optional, absent in this sandbox
    except ImportError:
        orjson = None
    if orjson is not None:
        try:
            return orjson.loads(json_str)
        except Exception as e:  # noqa: BLE001
            raise ValueError(f"Failed to parse JSON: {e}") from e
    import json as _json

    try:
        return _json.loads(json_str)
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"Failed to parse JSON: {e}") from e
