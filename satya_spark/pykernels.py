"""Pure-Python twins of the compiled VALUE kernels — the engine
behind ``mode='wrap'`` validator handlers.

A wrap validator (reference ``src/satya/validators.py:143-202``)
receives ``(cls, value, handler, info)`` and decides whether/when to
invoke ``handler(value)`` — the field's standard validation. The
reference's own runner passes an IDENTITY handler
(``src/satya/validators.py:185-189``); here the handler actually runs
the field's standard value kernels, per value, in plain Python — the
Pydantic-faithful semantic (wrap REPLACES standard validation; calling
the handler is how the validator opts back in).

Why a Python twin instead of the compiled kernels: the handler runs
per value inside the caller's imperative scope — on the scale path
that scope is an executor-side Arrow batch loop where no SparkSession
exists. So each kernel is re-expressed here with EXACTLY the compiled
semantics (same trim char set, same ε-tolerant float modulo, same
regex + length rule for email), and the equivalence is pinned by the
hypothesis differential fuzz in tests/test_property.py, which imports
THESE functions as its oracle — the code that powers wrap handlers is
the code fuzzed against the Spark kernels and DuckDB.

Scope: scalar string/numeric constraints plus array
min/max_items + unique_items — the same set a wrap validator's field
can declare. Struct-element rules (``item_fields``) are a columnar
composition surface with no single-value analog; requesting a handler
for such a field raises at registration time rather than silently
checking less.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, List

from .spec import (
    EMAIL_MAX_LEN,
    EMAIL_PATTERN,
    MULTIPLE_OF_EPS,
    URL_PATTERN,
    FieldSpec,
)

# the compiled min_length kernel trims this explicit ASCII-whitespace
# char set (compiler.py: SQL trim() strips spaces only; Python
# str.strip() also strips unicode whitespace — both dialects use this
# set, so the twin must too)
_TRIM_WS = " \t\n\r\x0b\x0c"


def value_violations(f: FieldSpec, v: Any) -> List[str]:
    """Names of the field's violated VALUE constraints for one value.
    ``None`` returns ``[]`` — nulls skip value rules engine-wide
    (presence is the separate ``required`` kernel, which wrap does not
    replace). Mirrors compiler.py's scalar/array kernel builders
    one-for-one; fuzz-pinned against them in tests/test_property.py.
    """
    if v is None:
        return []
    out: List[str] = []
    is_str = isinstance(v, str)
    # --- string kernels (compiler.py "string kernels") ---
    if f.min_length is not None and is_str:
        if len(v.strip(_TRIM_WS)) < f.min_length:
            out.append("min_length")
    if f.max_length is not None and is_str:
        if len(v) > f.max_length:
            out.append("max_length")
    if f.pattern is not None and is_str:
        if not re.search(f.pattern, v):
            out.append("pattern")
    if f.email and is_str:
        if not (re.search(EMAIL_PATTERN, v) and len(v) <= EMAIL_MAX_LEN):
            out.append("email")
    if f.url and is_str:
        if not re.search(URL_PATTERN, v):
            out.append("url")
    if f.enum is not None:
        if v not in f.enum:
            out.append("enum")
    # --- numeric kernels ---
    is_num = isinstance(v, (int, float)) and not isinstance(v, bool)
    if is_num:
        for cname, ok in (
            ("ge", lambda b: v >= b),
            ("le", lambda b: v <= b),
            ("gt", lambda b: v > b),
            ("lt", lambda b: v < b),
            ("min_value", lambda b: v >= b),
            ("max_value", lambda b: v <= b),
        ):
            bound = getattr(f, cname)
            if bound is not None and not ok(bound):
                out.append(cname)
        if f.multiple_of is not None:
            m = f.multiple_of
            if isinstance(v, float) or float(m) != int(m):
                # ε-tolerant float modulo; math.fmod mirrors Spark's
                # fmod (sign of dividend) — abs() makes them agree
                r = abs(math.fmod(v, m))
                if not (r < MULTIPLE_OF_EPS or abs(r - m) < MULTIPLE_OF_EPS):
                    out.append("multiple_of")
            elif v % int(m) != 0:
                out.append("multiple_of")
    # --- array kernels ---
    if isinstance(v, (list, tuple)):
        if f.min_items is not None and len(v) < f.min_items:
            out.append("min_items")
        if f.max_items is not None and len(v) > f.max_items:
            out.append("max_items")
        if f.unique_items:
            distinct: List[Any] = []
            for item in v:
                if item not in distinct:
                    distinct.append(item)
            if len(distinct) != len(v):
                out.append("unique_items")
    return out


def standard_handler(f: FieldSpec) -> Callable[[Any], Any]:
    """The ``handler`` passed to a ``mode='wrap'`` validator for field
    ``f``: runs the field's standard value kernels on the given value,
    raising ``ValueError`` naming the violated constraints, else
    returning the value unchanged. Built once per field; safe to ship
    in a pandas-UDF closure (pure Python, no session)."""
    if f.item_fields:
        raise ValueError(
            f"mode='wrap' on {f.name!r}: struct-element rules"
            " (item_fields) have no single-value handler analog —"
            " wrap the leaf fields instead"
        )

    def handler(v: Any) -> Any:
        bad = value_violations(f, v)
        if bad:
            raise ValueError(f"{f.name}: {', '.join(bad)} violated")
        return v

    return handler
