"""Output serialization — the ``model_dump`` / ``model_dump_json``
analog (reference ``src/satya/__init__.py:732-794``): select the
declared fields with include/exclude/by_alias/exclude-none handling,
optionally as one JSON document per row.

``exclude_none`` is row-shape-changing in satya (absent keys); in the
columnar world it maps to JSON serialization dropping null fields
(``ignoreNullFields``), which is exactly Spark's ``to_json`` default.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spec import TableSpec


def dump(
    df: DataFrame,
    spec: TableSpec,
    include: Optional[Sequence[str]] = None,
    exclude: Sequence[str] = (),
    by_alias: bool = False,
) -> DataFrame:
    """Projection of the declared fields, renamed to aliases when
    ``by_alias`` (Field(alias=...) semantics). Unknown include/exclude
    names are an error (silent empty projections hide typos)."""
    declared = set(spec.field_names())
    unknown = (set(include or ()) | set(exclude)) - declared
    if unknown:
        raise KeyError(f"unknown fields in include/exclude: {sorted(unknown)}")
    cols = []
    for f in spec.fields:
        if "." in f.name:
            continue  # struct paths ride inside their parent column
        if include is not None and f.name not in include:
            continue
        if f.name in exclude:
            continue
        out_name = f.alias if (by_alias and f.alias) else f.name
        c = F.col(f.name)
        if f.after is not None:
            # @field_validator(mode='after') value transform: applied
            # to the validated value on the way OUT
            c = f.after(c)
        cols.append(c.alias(out_name))
    return df.select(*cols)


def dump_json(
    df: DataFrame,
    spec: TableSpec,
    include: Optional[Sequence[str]] = None,
    exclude: Sequence[str] = (),
    by_alias: bool = False,
    exclude_none: bool = True,
) -> DataFrame:
    """One JSON document per row (model_dump_json). ``exclude_none``
    drops null fields from the document (to_json's ignoreNullFields)."""
    projected = dump(df, spec, include, exclude, by_alias)
    opts = {"ignoreNullFields": "true" if exclude_none else "false"}
    return projected.select(
        F.to_json(F.struct(*projected.columns), opts).alias("json")
    )
