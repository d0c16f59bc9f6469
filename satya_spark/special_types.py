"""Special-type presets — one-line FieldSpec sugar mirroring the
reference's Pydantic-compatible special types
(``src/satya/special_types.py:139-238``): each preset is the
constraint set that type enforces, expressed as a FieldSpec so it
compiles to the same Catalyst kernels + DuckDB twins as hand-written
constraints.

Path types (FilePath/DirectoryPath/NewPath,
``src/satya/special_types.py:49-137``) check *filesystem existence* at
hydrate time — an executor-side I/O effect with no columnar analog;
``PathStr`` covers the shape check and existence stays a
deployment-time concern (documented in COVERAGE.md).
"""

from __future__ import annotations

from typing import Any

from .spec import FieldSpec

# absolute-or-relative POSIX-ish path shape (no NUL, no newline)
PATH_PATTERN = r"^[^\x00\n]+$"

# The ONE canonical preset table — compat.StreamValidator.add_field
# and model's annotation markers derive from it, so a preset tweak
# lands everywhere at once.
PRESETS: dict = {
    "emailstr": ("string", {"email": True}),
    "httpurl": ("string", {"url": True}),
    "positiveint": ("long", {"gt": 0}),
    "negativeint": ("long", {"lt": 0}),
    "nonnegativeint": ("long", {"ge": 0}),
    "positivefloat": ("double", {"gt": 0.0}),
    "negativefloat": ("double", {"lt": 0.0}),
    "nonnegativefloat": ("double", {"ge": 0.0}),
    "secretstr": ("string", {"secret": True}),
    "pathstr": ("string", {"pattern": PATH_PATTERN, "min_length": 1}),
}


def _mk(name: str, preset_key: str, **kw: Any) -> FieldSpec:
    dtype, preset = PRESETS[preset_key]
    merged = {**preset, **kw}
    return FieldSpec(name, dtype, **merged)


def EmailStr(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:139-153 — validated email string."""
    return _mk(name, "emailstr", **kw)


def HttpUrl(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:155-170 — http(s) URL string."""
    return _mk(name, "httpurl", **kw)


def PositiveInt(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:172-181 — int > 0."""
    return _mk(name, "positiveint", **kw)


def NegativeInt(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:183-192 — int < 0."""
    return _mk(name, "negativeint", **kw)


def NonNegativeInt(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:194-203 — int >= 0."""
    return _mk(name, "nonnegativeint", **kw)


def PositiveFloat(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:205-215 — float > 0."""
    return _mk(name, "positivefloat", **kw)


def NegativeFloat(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:217-227 — float < 0."""
    return _mk(name, "negativefloat", **kw)


def NonNegativeFloat(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:229-238 — float >= 0."""
    return _mk(name, "nonnegativefloat", **kw)


def SecretStr(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:17-31 — string whose value is
    masked ('**********') wherever the engine would surface it
    (violation rows, compat errors)."""
    return _mk(name, "secretstr", **kw)


def PathStr(name: str, **kw: Any) -> FieldSpec:
    """Shape check for FilePath/DirectoryPath/NewPath
    (src/satya/special_types.py:49-137): non-empty, no NUL/newline.
    Filesystem existence is not a columnar property — see module
    docstring."""
    return _mk(name, "pathstr", **kw)


__all__ = [
    "EmailStr",
    "HttpUrl",
    "PositiveInt",
    "NegativeInt",
    "NonNegativeInt",
    "PositiveFloat",
    "NegativeFloat",
    "NonNegativeFloat",
    "SecretStr",
    "PathStr",
    "PATH_PATTERN",
]
