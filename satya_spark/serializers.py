"""Serialization decorators — ``@field_serializer`` /
``@model_serializer`` / ``@computed_field`` (reference
``src/satya/serializers.py``).

The reference registers the metadata but its own ``dict()`` never
consumes it (no reads of ``__field_serializer__`` outside the
decorator module); here the registrations are honored end-to-end by
``Model.model_dump`` / ``model_dump_json`` — strictly stronger, the
same stance taken for ``mode='wrap'`` field validators. At scale,
serialization is a ``select`` projection (satya_spark/serialize.py);
Python serializer functions belong to the per-record facade, and a
user who needs them columnar expresses them as Column expressions.

Shapes (all Pydantic-compatible, reference serializers.py:14-77):

* ``@field_serializer('pwd', when_used='always'|'unless-none'|'json')``
  — ``def ser(self, value)`` rewrites the field's dumped value;
  ``mode='wrap'`` receives ``(self, value, handler)`` where
  ``handler(value)`` is the standard dump of that value.
* ``@model_serializer`` — ``def ser(self)`` replaces the whole dump;
  ``mode='wrap'`` receives ``(self, handler)`` where ``handler()``
  is the standard dict.
* ``@computed_field`` (optionally ``alias=...``) on a method —
  becomes a property AND is included in dumps under its name/alias.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from .validators import _positional_arity as _arity


def field_serializer(
    *fields: str, mode: str = "plain", when_used: str = "always"
) -> Callable:
    """reference serializers.py:14-36."""
    if mode not in ("plain", "wrap"):
        raise ValueError(f"mode must be 'plain' or 'wrap', got {mode!r}")
    if when_used not in ("always", "unless-none", "json"):
        raise ValueError(
            f"when_used must be 'always', 'unless-none', or 'json',"
            f" got {when_used!r}"
        )
    if not fields:
        raise ValueError("field_serializer requires at least one field name")

    def decorator(func: Callable) -> Callable:
        func.__field_serializer__ = True
        func.__serializer_fields__ = tuple(fields)
        func.__serializer_mode__ = mode
        func.__serializer_when__ = when_used
        return func

    return decorator


def model_serializer(mode: str = "plain") -> Callable:
    """reference serializers.py:38-55. Bare usage
    (``@model_serializer`` without parentheses) is supported like the
    reference's docstring example."""
    if callable(mode):  # bare decorator
        func = mode
        func.__model_serializer__ = True
        func.__serializer_mode__ = "plain"
        return func
    if mode not in ("plain", "wrap"):
        raise ValueError(f"mode must be 'plain' or 'wrap', got {mode!r}")

    def decorator(func: Callable) -> Callable:
        func.__model_serializer__ = True
        func.__serializer_mode__ = mode
        return func

    return decorator


def computed_field(
    func: Optional[Callable] = None,
    *,
    alias: Optional[str] = None,
    return_type: Optional[type] = None,
) -> Any:
    """reference serializers.py:57-77 — returns a property; the
    metaclass additionally includes it in dumps."""

    def decorator(f: Callable) -> property:
        inner = f.fget if isinstance(f, property) else f
        inner.__computed_field__ = True
        inner.__field_alias__ = alias
        inner.__return_type__ = return_type
        return f if isinstance(f, property) else property(f)

    if func is None:
        return decorator
    return decorator(func)


def collect_serializers(cls) -> tuple:
    """Walk the MRO (bases first) collecting serializer registrations,
    keyed by ATTRIBUTE name so a subclass redefinition replaces the
    base one and an undecorated shadow deactivates it — the same rule
    as collect_validators. Returns
    (field_serializers: {field -> (func, mode, when_used, arity)},
     model_serializer: (func, mode) | None,
     computed: [(name, fget, alias)])."""
    by_name: dict = {}  # attr_name -> ('field'|'model'|'computed', inner)
    for klass in reversed(cls.__mro__):
        for attr_name, attr in vars(klass).items():
            inner = (
                attr.fget
                if isinstance(attr, property)
                else attr.__func__
                if isinstance(attr, (classmethod, staticmethod))
                else attr
            )
            if inner is None:
                continue
            if getattr(inner, "__field_serializer__", False):
                by_name[attr_name] = ("field", inner)
            elif getattr(inner, "__model_serializer__", False):
                by_name[attr_name] = ("model", inner)
            elif getattr(inner, "__computed_field__", False) and isinstance(
                attr, property
            ):
                by_name[attr_name] = ("computed", inner)
            else:
                # undecorated shadow deactivates a base registration
                by_name.pop(attr_name, None)
    fser: dict = {}
    mser = None
    computed: list = []
    for attr_name, (kind, inner) in by_name.items():
        if kind == "field":
            for fname in inner.__serializer_fields__:
                fser[fname] = (
                    inner,
                    inner.__serializer_mode__,
                    inner.__serializer_when__,
                    _arity(inner),
                )
        elif kind == "model":
            mser = (inner, inner.__serializer_mode__)
        else:
            computed.append(
                (attr_name, inner, getattr(inner, "__field_alias__", None))
            )
    return fser, mser, computed


__all__ = [
    "field_serializer",
    "model_serializer",
    "computed_field",
    "collect_serializers",
]
