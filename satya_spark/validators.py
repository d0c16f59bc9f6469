"""``@field_validator`` / ``@model_validator`` decorator surface —
the reference's Pydantic-compatible custom-validation registration
(``src/satya/validators.py:66-140``, exercised in
``examples/pydantic_compatibility_showcase.py:99-145``).

Declaration shape is identical to the reference::

    class User(Model):
        name: str
        age: int

        @field_validator('name')
        def validate_name(cls, v, info):
            if not v.strip():
                raise ValueError('Name cannot be empty')
            return v.title()

        @model_validator(mode='after')
        def check(self):
            ...
            return self

Execution is two-path, like every other Model feature here:

* **small-batch** (``Model(**data)`` / ``model_validate``): the
  decorated Python functions run directly per record —
  ``mode='before'``/``'plain'`` transforms ahead of the compiled
  kernels (plain additionally REPLACES the field's standard kernels),
  ``mode='after'`` transforms the validated value, model validators
  run on the raw dict (before) / the constructed instance (after).
  Raised exceptions become accumulated ValidationErrors.
* **scale** (``validate_df``): each validator is applied as an
  Arrow-batched pandas UDF (never a row-at-a-time ``F.udf``) that
  returns ``struct<v, err>`` — the transform rewrites the column, the
  captured exception message lands in the ``violations`` array as
  ``(field, validator_name, message)``. Model validators are applied
  check-only over a row struct (value-REWRITING model validators are
  a small-batch semantic; the columnar path records the verdict).
  On executors the first ``cls`` argument is a lightweight class
  token (``__name__`` + ``model_config``), not the class object —
  shipping the real class would drag its cached Spark-session-bound
  validator into the pickle.

``mode='wrap'`` (reference ``src/satya/validators.py:143-202``):
the validator receives ``(cls, v, handler[, info])`` and REPLACES the
field's standard value kernels; calling ``handler(v)`` runs them —
per value, in pure Python (:mod:`satya_spark.pykernels`, whose
kernel-twins are hypothesis-fuzz-pinned against the compiled kernels
in tests/test_property.py). The reference's own runner passes an
IDENTITY handler (``src/satya/validators.py:185-189``); ours is
strictly stronger — the handler actually performs the validation
Pydantic semantics promise. Works on both paths: small-batch runs it
inline, ``validate_df`` ships the handler inside the Arrow-batched
UDF closure (presence/``required`` is not replaced, matching
``plain``).
"""

# NB: no `from __future__ import annotations` — pandas_udf infers the
# eval type from REAL type hints on the wrapped functions; stringified
# hints fail its signature inference
import inspect
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Dict, List, Optional, Tuple


@dataclass
class ValidationInfo:
    """Context object passed to validators (reference
    ``src/satya/validators.py:23-37``)."""

    field_name: Optional[str] = None
    data: Optional[Dict[str, Any]] = None
    config: Optional[Dict[str, Any]] = None
    context: Optional[Dict[str, Any]] = None


@dataclass(frozen=True)
class FieldValidatorMeta:
    """Collected ``@field_validator`` registration."""

    func: Callable
    fields: Tuple[str, ...]
    mode: str  # 'before' | 'after' | 'plain'
    check_fields: bool = True
    nargs: int = 3  # (cls, v) or (cls, v, info)

    @property
    def name(self) -> str:
        return getattr(self.func, "__name__", "field_validator")


@dataclass(frozen=True)
class ModelValidatorMeta:
    """Collected ``@model_validator`` registration."""

    func: Callable
    mode: str  # 'before' | 'after'
    nargs: int = 1

    @property
    def name(self) -> str:
        return getattr(self.func, "__name__", "model_validator")


def field_validator(
    *fields: str, mode: str = "after", check_fields: bool = True
) -> Callable:
    """Register a per-field validator on a Model class (reference
    ``src/satya/validators.py:66-107``). The decorated function keeps
    its callable identity; the metaclass collects it."""
    if mode not in ("before", "after", "plain", "wrap"):
        raise ValueError(
            f"mode must be 'before', 'after', 'plain', or 'wrap', got {mode!r}"
        )
    if not fields:
        raise ValueError("field_validator requires at least one field name")

    def decorator(func: Callable) -> Callable:
        inner = func.__func__ if isinstance(func, (classmethod, staticmethod)) else func
        inner.__validator_meta__ = FieldValidatorMeta(
            func=inner,
            fields=tuple(fields),
            mode=mode,
            check_fields=check_fields,
            nargs=_positional_arity(inner),
        )
        return func

    return decorator


def model_validator(mode: str = "after") -> Callable:
    """Register a whole-record validator on a Model class (reference
    ``src/satya/validators.py:110-140``)."""
    if mode not in ("before", "after"):
        raise ValueError(f"mode must be 'before' or 'after', got {mode!r}")

    def decorator(func: Callable) -> Callable:
        inner = func.__func__ if isinstance(func, (classmethod, staticmethod)) else func
        inner.__model_validator_meta__ = ModelValidatorMeta(
            func=inner, mode=mode, nargs=_positional_arity(inner)
        )
        return func

    return decorator


def _positional_arity(func: Callable) -> int:
    try:
        params = [
            p
            for p in inspect.signature(func).parameters.values()
            if p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        return len(params)
    except (TypeError, ValueError):  # builtins / C callables
        return 3


def collect_validators(cls) -> tuple:
    """Walk the MRO (bases first, definition order within each class)
    and collect decorated validators, keyed by ATTRIBUTE name so a
    subclass method redefining a base validator replaces it (standard
    override semantics) rather than running both — even when the
    override is itself undecorated but shadows a decorated base
    attribute. An override keeps the base definition's position in
    the execution order. ``check_fields=True`` rejects names that
    resolve to no declared field — at class creation, like the rest
    of the metaclass."""
    fv_by_name: Dict[str, Optional[FieldValidatorMeta]] = {}
    mv_by_name: Dict[str, Optional[ModelValidatorMeta]] = {}
    for klass in reversed(cls.__mro__):
        for attr_name, attr in vars(klass).items():
            inner = (
                attr.__func__
                if isinstance(attr, (classmethod, staticmethod))
                else attr
            )
            fm = getattr(inner, "__validator_meta__", None)
            mm = getattr(inner, "__model_validator_meta__", None)
            if fm is not None:
                fv_by_name[attr_name] = fm
                mv_by_name.pop(attr_name, None)
            elif mm is not None:
                mv_by_name[attr_name] = mm
                fv_by_name.pop(attr_name, None)
            else:
                # plain attribute shadowing a decorated base validator
                # deactivates it (the derived class chose to redefine
                # it without @field_validator)
                if attr_name in fv_by_name:
                    fv_by_name.pop(attr_name)
                if attr_name in mv_by_name:
                    mv_by_name.pop(attr_name)
    # name-keyed for override semantics, identity-deduped so an ALIAS
    # (`inc_alias = inc`) doesn't run the same validator twice
    _seen: set = set()
    fvs: List[FieldValidatorMeta] = []
    for m in fv_by_name.values():
        if id(m) not in _seen:
            _seen.add(id(m))
            fvs.append(m)
    mvs: List[ModelValidatorMeta] = []
    for m in mv_by_name.values():
        if id(m) not in _seen:
            _seen.add(id(m))
            mvs.append(m)
    declared = set(getattr(cls, "__fields__", {}) or {})
    for fm in fvs:
        if not fm.check_fields:
            continue
        unknown = [
            f for f in fm.fields if f not in declared and f.split(".")[0] not in declared
        ]
        if unknown:
            raise TypeError(
                f"@field_validator on {cls.__name__}.{fm.name} names unknown"
                f" field(s) {unknown}; declared: {sorted(declared)}"
                " (pass check_fields=False to allow)"
            )
    return fvs, mvs


class ClsToken:
    """Lightweight ``cls`` stand-in shipped to executors in place of
    the Model class (whose cached validator holds a SparkSession and
    must never enter a pickle). Carries the attributes validators
    commonly read; heavier classmethod use belongs to the small-batch
    path."""

    def __init__(self, name: str, model_config: dict):
        self.__name__ = name
        self.model_config = dict(model_config or {})

    def __repr__(self) -> str:  # pragma: no cover
        return f"<class-token {self.__name__}>"


def call_field_validator(meta: FieldValidatorMeta, cls, value, info: ValidationInfo):
    if meta.nargs >= 3:
        return meta.func(cls, value, info)
    return meta.func(cls, value)


def call_wrap_validator(
    meta: FieldValidatorMeta, cls, value, handler, info: ValidationInfo
):
    """``mode='wrap'``: ``func(cls, v, handler[, info])`` — the
    validator decides whether/when to run the field's standard value
    kernels by calling ``handler(v)`` (reference
    ``src/satya/validators.py:185-189`` passes an identity handler;
    ours runs the real kernels via
    :func:`satya_spark.pykernels.standard_handler`)."""
    if meta.nargs >= 4:
        return meta.func(cls, value, handler, info)
    return meta.func(cls, value, handler)


def call_model_validator_before(meta: ModelValidatorMeta, cls, values: dict):
    if meta.nargs >= 3:
        return meta.func(cls, values, ValidationInfo(data=values))
    return meta.func(cls, values)


# --- scale path (validate_df) ----------------------------------------------


def _fv_pandas_udf(meta: FieldValidatorMeta, fname: str, dtype: str, token, fspec=None):
    """struct<v,err> pandas UDF applying one field validator
    elementwise (Arrow-batched; nulls skip, like every value kernel).
    For ``mode='wrap'`` the closure carries the field's pure-Python
    standard-kernel handler (:mod:`satya_spark.pykernels`) — no
    session reference ships to the executor."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .coerce import spark_type

    func, nargs, vname = meta.func, meta.nargs, meta.name
    handler = None
    if meta.mode == "wrap":
        from .pykernels import standard_handler

        handler = standard_handler(fspec)

    @pandas_udf(f"v {spark_type(dtype)}, err string")
    def _apply(s: pd.Series) -> pd.DataFrame:
        vals, errs = [], []
        for v in s:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                vals.append(None)
                errs.append(None)
                continue
            try:
                info = ValidationInfo(field_name=fname, config=token.model_config)
                if handler is not None:
                    nv = (
                        func(token, v, handler, info)
                        if nargs >= 4
                        else func(token, v, handler)
                    )
                else:
                    nv = func(token, v, info) if nargs >= 3 else func(token, v)
                vals.append(nv)
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — message IS the verdict
                vals.append(v)
                errs.append(str(e) or type(e).__name__ or vname)
        return pd.DataFrame({"v": vals, "err": errs})

    # asNondeterministic: the function IS deterministic, but the mark
    # stops the optimizer from DUPLICATING it — a filter on a column
    # derived from the UDF (e.g. the bench's filter(~valid)) is pushed
    # below the projection and re-evaluates every validator per row
    # (measured r6: 4 ArrowEvalPython nodes for 2 logical stages,
    # 2.3 s → 1.2 s at sf0.1 once deduplicated; guide §4.4 pattern)
    return _apply.asNondeterministic()


def _mv_pandas_udf(meta: ModelValidatorMeta, colnames: List[str], token):
    """string (error) pandas UDF applying one model validator over a
    row struct: 'before' sees a plain dict, 'after' an attribute
    namespace standing in for the instance. Check-only — columnar
    rows have no object identity to rewrite."""
    import types as _types

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    func, mode, nargs = meta.func, meta.mode, meta.nargs

    def _isna(v):
        return v is None or (isinstance(v, float) and pd.isna(v))

    @pandas_udf("string")
    def _apply(pdf: pd.DataFrame) -> pd.Series:
        errs = []
        for row in pdf.itertuples(index=False):
            d = {c: (None if _isna(v) else v) for c, v in zip(colnames, row)}
            try:
                if mode == "before":
                    if nargs >= 3:
                        func(token, d, ValidationInfo(data=d))
                    else:
                        func(token, d)
                else:
                    ns = _types.SimpleNamespace(**d)
                    func(ns)
                errs.append(None)
            except Exception as e:  # noqa: BLE001
                errs.append(str(e) or meta.name)
        return pd.Series(errs)

    # same duplication guard as _fv_pandas_udf (guide §4.4)
    return _apply.asNondeterministic()


def apply_validators_df(cls, df):
    """The validate_df integration: apply decorated validators around
    the compiled kernel pass and fold their verdicts into the
    ``violations`` array / ``valid`` flag.

    Pipeline (mirrors the small-batch order):
      1. before/plain field transforms rewrite the input columns
         (kernels then see the transformed values);
      2. the compiled kernels run (``plain`` fields' standard kernels
         are dropped — plain REPLACES validation);
      3. after-mode field transforms rewrite the validated values;
      4. model validators append row-scope verdicts;
      5. every captured error joins ``violations`` as
         ``(field, validator_name, message)`` and ``valid`` is
         recomputed.
    """
    from pyspark.sql import functions as F

    from .compiler import CompiledSpec, compile_spec

    fvs: List[FieldValidatorMeta] = getattr(cls, "__field_validators__", [])
    mvs: List[ModelValidatorMeta] = getattr(cls, "__model_validators__", [])
    spec = cls.spec()
    compiled = compile_spec(spec)
    if not fvs and not mvs:
        return compiled.with_validation(df)

    token = ClsToken(cls.__name__, getattr(cls, "model_config", {}) or {})
    dtypes = {f.name: f.dtype for f in spec.fields}
    err_specs: List[tuple] = []  # (err_col, field_label, validator_name)
    out = df
    idx = 0

    fspecs = {f.name: f for f in spec.fields}

    def _apply_field(out, meta: FieldValidatorMeta, fname: str, gate=None):
        nonlocal idx
        udf = _fv_pandas_udf(meta, fname, dtypes[fname], token, fspecs.get(fname))
        tmp, err = f"__fv{idx}", f"__fverr{idx}"
        idx += 1
        out = out.withColumn(tmp, udf(F.col(fname)))
        v, e = F.col(f"{tmp}.v"), F.col(f"{tmp}.err")
        if gate is not None:
            # after-mode gate: the transform takes effect (and its
            # verdict counts) only where standard validation and every
            # earlier validator passed — matching the small-batch
            # order, where construction raises before 'after' runs
            v = F.when(gate, v).otherwise(F.col(fname))
            e = F.when(gate, e)
        if "." in fname:
            parent, path = fname.split(".", 1)
            out = out.withColumn(parent, F.col(parent).withField(path, v))
        else:
            out = out.withColumn(fname, v)
        out = out.withColumn(err, e).drop(tmp)
        err_specs.append((err, fname, meta.name))
        return out

    plain_fields = set()
    for meta in fvs:
        if meta.mode not in ("before", "plain", "wrap"):
            continue
        for fname in meta.fields:
            if fname in dtypes:
                out = _apply_field(out, meta, fname)
                if meta.mode in ("plain", "wrap"):
                    # both REPLACE the field's standard value kernels —
                    # wrap's handler is how the validator opts back in
                    plain_fields.add(fname)

    if plain_fields:
        # plain/wrap replace VALUE kernels; presence (required)
        # survives. A plain field drops its own rules — matched on the
        # FULL (possibly dotted) rule path as well as the top-level
        # prefix, so @field_validator('meta.email', mode='plain')
        # drops exactly the meta.email kernels while plain on 'meta'
        # drops every rule under it.
        def _replaced(rule_field: str) -> bool:
            return (
                rule_field in plain_fields
                or rule_field.split(".")[0].split("[")[0] in plain_fields
            )

        compiled = CompiledSpec(
            spec,
            [
                r
                for r in compiled.rules
                if r.constraint == "required" or not _replaced(r.field)
            ],
        )
    out = compiled.with_validation(out)

    # row-cleanliness gate for the 'after' stage (small-batch parity:
    # Model.__init__ raises on any kernel or before/plain/wrap verdict
    # BEFORE after-transforms or the after-model-validator run)
    clean = F.size("violations") == 0
    for ec, _, _ in err_specs:
        clean = clean & F.col(ec).isNull()
    out = out.withColumn("__clean", clean)
    pre_n = len(err_specs)

    for meta in fvs:
        if meta.mode != "after":
            continue
        for fname in meta.fields:
            if fname in dtypes:
                out = _apply_field(out, meta, fname, gate=F.col("__clean"))

    # after-mode model validators additionally require every 'after'
    # field transform to have passed (small-batch raises after_errs
    # before running them); before-mode model validators are
    # unconditional on both paths
    mv_gate = F.col("__clean")
    for ec, _, _ in err_specs[pre_n:]:
        mv_gate = mv_gate & F.col(ec).isNull()

    top_cols = [c for c in df.columns if c in dtypes or "." not in c]
    for meta in mvs:
        udf = _mv_pandas_udf(meta, top_cols, token)
        err = f"__mverr{idx}"
        idx += 1
        raw = udf(F.struct(*[F.col(c) for c in top_cols]))
        out = out.withColumn(
            err, raw if meta.mode == "before" else F.when(mv_gate, raw)
        )
        err_specs.append((err, "<row>", meta.name))

    if err_specs:
        empty = F.array().cast(CompiledSpec.VIOLATION_TYPE)
        parts = [
            F.when(
                F.col(err).isNotNull(),
                F.array(
                    F.struct(
                        F.lit(fld).alias("field"),
                        F.lit(vname).alias("constraint_name"),
                        F.col(err).alias("offending_value"),
                    )
                ),
            ).otherwise(empty)
            for err, fld, vname in err_specs
        ]
        out = (
            out.withColumn("violations", F.concat(F.col("violations"), *parts))
            .withColumn("valid", F.size("violations") == 0)
            .drop(*[e for e, _, _ in err_specs])
        )
    return out.drop("__clean")


__all__ = [
    "ValidationInfo",
    "field_validator",
    "model_validator",
    "collect_validators",
    "apply_validators_df",
]
