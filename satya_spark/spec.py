"""Declarative constraint spec — the analog of satya's ``Field``.

satya declares per-field constraints as ``Field(type_, required,
min_length, max_length, pattern, email, url, ge, le, gt, lt,
min_value, max_value, multiple_of, min_items, max_items,
unique_items, enum, ...)`` (reference: ``src/satya/__init__.py:94-171``).
Here the same vocabulary is a frozen dataclass; the compiler
(:mod:`satya_spark.compiler`) turns each constraint into

* a vectorized Spark ``Column`` predicate (JVM codegen, no Python in
  the hot loop), and
* an equivalent ANSI-SQL failure predicate (used to generate the
  DuckDB differential oracle — the analog of satya's
  ``tests/test_pydantic_compatibility.py`` Pydantic oracle).

Semantics preserved from the reference (authoritative paths):

* ``min_length`` applies to the *trimmed* string, ``max_length`` to
  the raw string (``src/satya/validator.py:226-229``;
  ``tests/test_edge_cases.py:198-214``).
* ``pattern`` requires explicit anchors, matching the test corpus
  (``tests/test_field_constraints.py:105-106``); the live engines use
  real regex (``src/blaze_validator.rs:146,442-448``), not the
  substring stub in ``src/lib.rs:976-980``.
* ``email`` = simplified RFC regex + length <= 254
  (``src/lib.rs:947-951``; ``src/blaze_validator.rs:11-13``).
* ``url`` = the Blaze regex ``^https?://...``
  (``src/blaze_validator.rs:16-18``).
* bool is NOT an int (``src/lib.rs:614,804-807``); int accepted as
  float (``src/lib.rs:615,749-757``).
* errors ACCUMULATE per record — one violation row per (row,
  constraint) — matching the Python path
  (``src/satya/validator.py:219-275``;
  ``tests/test_edge_cases.py:300-324``), not Blaze fail-fast.
* ``None`` for an optional field short-circuits all value rules
  (``src/satya/validator.py:589-592``); ``None``/missing for a
  required field raises exactly the required-field error
  (``src/lib.rs:589-593``).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Optional, Sequence, Tuple, Union

# Simplified RFC email regex, verbatim from src/lib.rs:947-951 /
# src/blaze_validator.rs:11-13.
EMAIL_PATTERN = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"
EMAIL_MAX_LEN = 254

# URL regex, verbatim from src/blaze_validator.rs:16-18.
URL_PATTERN = r"^https?://[A-Za-z0-9.-]+(?::\d+)?(?:/[^\s]*)?$"

# multiple_of float tolerance (src/satya/scalar_validators.py:164-169).
MULTIPLE_OF_EPS = 1e-10

# SecretStr mask (src/satya/special_types.py SecretStr repr) — the one
# literal shared by violation rows, oracle SQL, and compat errors.
SECRET_MASK = "**********"


@dataclass(frozen=True)
class FieldSpec:
    """One column's constraint set. Mirrors satya ``Field`` kwargs
    (``src/satya/__init__.py:94-171``), including ``alias``, ``secret``
    and ``default_factory`` (per-record on the Model/compat path,
    compile-time literal on the columnar path — see the field comment).
    """

    name: str
    dtype: str = "string"  # string|int|long|double|bool|timestamp|array<string>|decimal(p,s)
    required: bool = False

    # string constraints
    min_length: Optional[int] = None   # trimmed semantics
    max_length: Optional[int] = None   # raw semantics
    pattern: Optional[str] = None      # anchored regex
    email: bool = False
    url: bool = False
    enum: Optional[Tuple[str, ...]] = None

    # numeric constraints
    ge: Optional[float] = None
    le: Optional[float] = None
    gt: Optional[float] = None
    lt: Optional[float] = None
    min_value: Optional[float] = None  # legacy inclusive (src/lib.rs:192-193)
    max_value: Optional[float] = None
    multiple_of: Optional[float] = None

    # array constraints
    min_items: Optional[int] = None
    max_items: Optional[int] = None
    unique_items: bool = False

    # per-element STRUCT rules for array<struct<...>> / map<_,struct>
    # columns — the List[Model] / Dict[str, Model] composition surface
    # (reference src/satya/validator.py:310-374): each entry is a
    # FieldSpec whose name is the (possibly dotted) path INSIDE the
    # element struct and whose scalar constraints apply to every
    # element's value at that path. Containers nested inside an
    # element support min/max_items + unique_items only (deeper
    # per-element rules are not columnar-expressible in one pass).
    item_fields: Optional[Tuple["FieldSpec", ...]] = None

    # table-level extension (north rule): max tolerated null fraction
    max_null_rate: Optional[float] = None

    # ingest-time transforms (declared on Field in the reference,
    # src/satya/__init__.py:125-127; applied by satya_spark.coerce)
    strip_whitespace: bool = False
    to_lower: bool = False
    to_upper: bool = False

    # default applied to missing/null optionals in coercion mode
    # (src/satya/__init__.py:369-381)
    default: Any = None

    # default_factory (src/satya/__init__.py:369-381): on the
    # Model/compat path the factory runs PER RECORD (mutable defaults
    # are isolated — reference tests/test_edge_cases.py:46-64); on the
    # columnar DataFrame path a per-record factory is meaningless
    # (columns have no object identity), so it is evaluated ONCE at
    # coercion-compile time and the result used as the fill literal —
    # the documented columnar stance. compare=False keeps the frozen
    # dataclass hashable.
    default_factory: Optional[Callable[[], Any]] = dc_field(
        default=None, compare=False
    )

    # output rename on dump (src/satya/__init__.py:129, 774-776)
    alias: Optional[str] = None

    # @field_validator transform slots (src/satya/validators.py:66-107):
    # 'before' — Column transform applied BEFORE coercion + kernels
    # (mode='before' semantics); 'after' — Column transform applied to
    # the validated value on output/dump (mode='after' value-rewriting
    # semantics; boolean 'after' CHECKS are RowRules). mode='plain'
    # maps to before + no other rules; mode='wrap' runs on the Model
    # decorator surface with a real handler (pykernels twins of this
    # field's value kernels — COVERAGE.md §2.8).
    # Callables take and return a pyspark Column; compare=False keeps
    # the frozen dataclass hashable/comparable.
    before: Optional[Callable[[Any], Any]] = dc_field(default=None, compare=False)
    after: Optional[Callable[[Any], Any]] = dc_field(default=None, compare=False)

    # SecretStr semantics (src/satya/special_types.py:17-47): the
    # VALUE never appears in violation rows — masked like the
    # reference's repr masking
    secret: bool = False

    def constraints(self) -> list[str]:
        """Names of active constraints, in deterministic order."""
        out: list[str] = []
        if self.required:
            out.append("required")
        for c in (
            "min_length", "max_length", "pattern", "email", "url", "enum",
            "ge", "le", "gt", "lt", "min_value", "max_value", "multiple_of",
            "min_items", "max_items", "unique_items",
        ):
            v = getattr(self, c)
            if v not in (None, False):
                out.append(c)
        return out


@dataclass(frozen=True)
class RowRule:
    """Cross-field (whole-record) rule — the ``@model_validator``
    analog (``src/satya/validators.py:110-140``): a custom boolean
    expression over multiple columns. ``fail_fn`` builds a Column
    that is TRUE on violating rows (lazy: no session needed to
    declare); it may opt in to the run-scoped ``context`` dict
    (ValidationInfo.context analog) by declaring one required
    positional parameter NAMED ``ctx`` or ``context`` — any other
    parameter name is treated as a zero-arg callable. ``fail_sql`` is the optional DuckDB twin for the
    differential oracle — a plain string, or ``callable(context) ->
    str`` for context-parameterized rules. Field-scoped custom checks
    (the ``@field_validator`` analog,
    ``src/satya/validators.py:66-107``) are the same thing with a
    single-column predicate."""

    name: str
    fail_fn: Callable[..., Any]  # () -> Column, or (context) -> Column
    fail_sql: Union[str, Callable[[dict], str], None] = None


@dataclass(frozen=True)
class TableSpec:
    """A whole-table constraint spec — the analog of a satya ``Model``
    class (``src/satya/__init__.py:215-337``): an ordered collection
    of FieldSpecs plus table-scope rules (the north-rule extensions).
    """

    name: str
    fields: Tuple[FieldSpec, ...]
    # distributed uniqueness key, generalizing unique_items
    # (src/lib.rs:894-906) from list scope to table scope
    unique_key: Optional[Tuple[str, ...]] = None
    # referential integrity: column -> catalog-table name
    references: Tuple[Tuple[str, str], ...] = ()
    # extra-field policy: 'ignore' | 'forbid' (src/satya/__init__.py:270-276)
    extra: str = "ignore"
    # custom cross-field validators (@model_validator analog)
    row_rules: Tuple[RowRule, ...] = ()

    def field(self, name: str) -> FieldSpec:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def validate(self) -> None:
        """Spec-compile-time consistency check — the analog of
        ModelRegistry's dependency resolution with cycle detection
        (``src/satya/__init__.py:1164-1196``): duplicate field names,
        unique-key/reference columns that don't exist, and a
        self-referential catalog name are rejected before any job
        runs."""
        names = self.field_names()
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise ValueError(f"duplicate field names: {sorted(dupes)}")
        declared = set(names)
        for k in self.unique_key or ():
            if k not in declared:
                raise ValueError(f"unique_key column not in spec: {k}")
        for col, cat in self.references:
            if col not in declared:
                raise ValueError(f"reference column not in spec: {col}")
            if cat == self.name:
                raise ValueError(
                    f"circular reference: table '{self.name}' references itself"
                )


def transcript_spec() -> TableSpec:
    """The flagship spec: multi-turn conversation transcripts
    (BASELINE.json input_hint) with every satya constraint class
    enabled, mapped onto the columns:

    conv_id:string turn_idx:int role:string text:string tool:string
    ts:timestamp — plus derived kernel-exercise columns meta_email,
    meta_url, score, tags added by :mod:`satya_spark.transcripts`.
    """
    return TableSpec(
        name="transcripts",
        fields=(
            FieldSpec("conv_id", "string", required=True,
                      pattern=r"^c[0-9]{1,19}$"),
            FieldSpec("turn_idx", "int", required=True, ge=0, le=10_000_000),
            FieldSpec("role", "string", required=True,
                      enum=("system", "user", "assistant", "tool")),
            FieldSpec("text", "string", required=True,
                      min_length=1, max_length=4000),
            FieldSpec("tool", "string", required=False,
                      pattern=r"^[a-z][a-z0-9_]{1,63}$",
                      max_null_rate=0.99),
            FieldSpec("ts", "timestamp", required=True),
            FieldSpec("meta_email", "string", required=False, email=True),
            FieldSpec("meta_url", "string", required=False, url=True),
            FieldSpec("score", "double", required=False,
                      ge=0.0, lt=1e9, multiple_of=0.25),
            FieldSpec("tags", "array<string>", required=False,
                      min_items=1, max_items=5, unique_items=True),
        ),
        unique_key=("conv_id", "turn_idx"),
        references=(("tool", "tool_catalog"),),
    )
