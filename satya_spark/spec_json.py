"""JSON Schema ↔ TableSpec, the analog of satya's two-way bridge:
``compile_json_schema`` (JSON Schema → validator,
``src/satya/json_schema_compiler.py:32-72``) and
``Model.model_json_schema()`` (model → JSON Schema,
``src/satya/__init__.py:882-918``).

Supported keyword mapping (same vocabulary the reference compiles):
type, required, minLength/maxLength, pattern, format: email|uri,
enum, minimum/maximum (ge/le), exclusiveMinimum/Maximum (gt/lt),
multipleOf, minItems/maxItems/uniqueItems.
"""

from __future__ import annotations

from typing import Any, Dict

from .spec import FieldSpec, TableSpec

_JSON_TO_DTYPE = {
    "string": "string",
    "integer": "long",
    "number": "double",
    "boolean": "bool",
    "array": "array<string>",
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


def from_json_schema(schema: Dict[str, Any], name: str = "schema") -> TableSpec:
    """JSON Schema (object type) → TableSpec."""
    props = schema.get("properties", {})
    required = set(schema.get("required", []))
    fields = []
    for fname, p in props.items():
        jtype = p.get("type", "string")
        dtype = _JSON_TO_DTYPE.get(jtype, "string")
        fmt = p.get("format")
        if fmt == "date-time":
            dtype = "timestamp"
        fields.append(
            FieldSpec(
                name=fname,
                dtype=dtype,
                required=fname in required,
                min_length=p.get("minLength"),
                max_length=p.get("maxLength"),
                pattern=p.get("pattern"),
                email=fmt == "email",
                url=fmt in ("uri", "url"),
                enum=tuple(p["enum"]) if "enum" in p else None,
                ge=p.get("minimum"),
                le=p.get("maximum"),
                gt=p.get("exclusiveMinimum"),
                lt=p.get("exclusiveMaximum"),
                multiple_of=p.get("multipleOf"),
                min_items=p.get("minItems"),
                max_items=p.get("maxItems"),
                unique_items=bool(p.get("uniqueItems", False)),
                default=p.get("default"),
            )
        )
    extra = "ignore"
    if schema.get("additionalProperties") is False:
        extra = "forbid"
    return TableSpec(name=schema.get("title", name), fields=tuple(fields), extra=extra)


def to_json_schema(spec: TableSpec) -> Dict[str, Any]:
    """TableSpec → JSON Schema (object type)."""
    props: Dict[str, Any] = {}
    required = []
    for f in spec.fields:
        p: Dict[str, Any] = {}
        if f.dtype.startswith("array"):
            p["type"] = "array"
        elif f.dtype.startswith("decimal"):
            p["type"] = "number"
        else:
            p["type"] = _DTYPE_TO_JSON.get(f.dtype, "string")
        if f.dtype == "timestamp":
            p["format"] = "date-time"
        if f.email:
            p["format"] = "email"
        if f.url:
            p["format"] = "uri"
        for k, v in (
            ("minLength", f.min_length),
            ("maxLength", f.max_length),
            ("pattern", f.pattern),
            ("minimum", f.ge),
            ("maximum", f.le),
            ("exclusiveMinimum", f.gt),
            ("exclusiveMaximum", f.lt),
            ("multipleOf", f.multiple_of),
            ("minItems", f.min_items),
            ("maxItems", f.max_items),
        ):
            if v is not None:
                p[k] = v
        if f.unique_items:
            p["uniqueItems"] = True
        if f.enum is not None:
            p["enum"] = list(f.enum)
        if f.default is not None:
            p["default"] = f.default
        props[f.name] = p
        if f.required:
            required.append(f.name)
    out: Dict[str, Any] = {
        "title": spec.name,
        "type": "object",
        "properties": props,
    }
    if required:
        out["required"] = required
    if spec.extra == "forbid":
        out["additionalProperties"] = False
    return out
