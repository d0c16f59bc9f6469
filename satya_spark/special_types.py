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


def _mk(name: str, dtype: str, preset: dict, **kw: Any) -> FieldSpec:
    merged = {**preset, **kw}
    return FieldSpec(name, dtype, **merged)


def EmailStr(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:139-153 — validated email string."""
    return _mk(name, "string", {"email": True}, **kw)


def HttpUrl(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:155-170 — http(s) URL string."""
    return _mk(name, "string", {"url": True}, **kw)


def PositiveInt(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:172-181 — int > 0."""
    return _mk(name, "long", {"gt": 0}, **kw)


def NegativeInt(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:183-192 — int < 0."""
    return _mk(name, "long", {"lt": 0}, **kw)


def NonNegativeInt(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:194-203 — int >= 0."""
    return _mk(name, "long", {"ge": 0}, **kw)


def PositiveFloat(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:205-215 — float > 0."""
    return _mk(name, "double", {"gt": 0.0}, **kw)


def NegativeFloat(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:217-227 — float < 0."""
    return _mk(name, "double", {"lt": 0.0}, **kw)


def NonNegativeFloat(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:229-238 — float >= 0."""
    return _mk(name, "double", {"ge": 0.0}, **kw)


def SecretStr(name: str, **kw: Any) -> FieldSpec:
    """src/satya/special_types.py:17-31 — string whose value is
    masked ('**********') wherever the engine would surface it
    (violation rows, compat errors)."""
    return _mk(name, "string", {"secret": True}, **kw)


def PathStr(name: str, **kw: Any) -> FieldSpec:
    """Shape check for FilePath/DirectoryPath/NewPath
    (src/satya/special_types.py:49-137): non-empty, no NUL/newline.
    Filesystem existence is not a columnar property — see module
    docstring."""
    return _mk(name, "string", {"pattern": PATH_PATTERN, "min_length": 1}, **kw)


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
