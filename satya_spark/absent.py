"""ABSENT sentinel — present-vs-absent field distinction on the
small-batch facade (reference ``src/satya/absent.py``).

The columnar engine adjudicates null ≡ absent (a DataFrame column
cannot be "missing" per row — COVERAGE.md §2.2); that adjudication
stands for the scale path. The per-record Model facade, however,
works on dicts, where the distinction is real and the reference uses
it for JSON-Schema fidelity: a field defaulted to ``ABSENT`` stays
OUT of ``model_dump()`` when the input didn't carry it, instead of
materializing as null.

Integration (model.py): ``Model(**data)`` drops ABSENT-valued inputs
before anything else (equivalent to the key being missing), and an
ABSENT default keeps the field out of ``_data`` — attribute access
raises AttributeError and dumps skip it, exactly the reference's
"missing keys stay absent" behavior.
"""

from __future__ import annotations

from typing import Any, Dict


class _AbsentType:
    """Singleton sentinel; falsy, equal only to itself."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:
        return "ABSENT"

    def __bool__(self) -> bool:
        return False

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, _AbsentType)

    def __hash__(self) -> int:
        return hash("ABSENT")


ABSENT = _AbsentType()


def is_absent(value: Any) -> bool:
    """True when the value is the ABSENT sentinel (reference
    src/satya/absent.py:60-76)."""
    return isinstance(value, _AbsentType)


def filter_absent(data: Dict[str, Any]) -> Dict[str, Any]:
    """Drop ABSENT-valued keys (reference src/satya/absent.py:79-97)."""
    return {k: v for k, v in data.items() if not is_absent(v)}


__all__ = ["ABSENT", "is_absent", "filter_absent", "_AbsentType"]
