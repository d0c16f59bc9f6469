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
