"""Validation profiling — the reference's ``satya.profiling`` surface
(``src/satya/profiling.py``): FieldStats / ValidationStats /
ValidationProfiler with ``track()``-wrapped model validation and a
formatted report.

Spark twist: besides the per-record stopwatch the reference keeps,
:meth:`ValidationProfiler.profile_df` folds the DISTRIBUTED per-field
timings from :meth:`satya_spark.engine.ValidationEngine.profile_kernels`
(one timed aggregation pass per field over a DataFrame) into the same
FieldStats — so one report covers both the facade and the scale path.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field as dc_field
from statistics import median, stdev
from typing import Any, Callable, Dict, List, Optional


@dataclass
class FieldStats:
    """reference src/satya/profiling.py:15-40."""

    field_name: str
    validation_count: int = 0
    total_time_us: float = 0.0
    min_time_us: float = float("inf")
    max_time_us: float = 0.0
    errors: int = 0

    @property
    def avg_time_us(self) -> float:
        if self.validation_count <= 0:
            return 0.0
        return self.total_time_us / self.validation_count

    def to_dict(self) -> dict:
        return {
            "field_name": self.field_name,
            "validation_count": self.validation_count,
            "avg_time_us": round(self.avg_time_us, 2),
            "min_time_us": round(self.min_time_us, 2),
            "max_time_us": round(self.max_time_us, 2),
            "total_time_us": round(self.total_time_us, 2),
            "errors": self.errors,
        }


@dataclass
class ValidationStats:
    """reference src/satya/profiling.py:42-104."""

    total_validations: int = 0
    successful_validations: int = 0
    failed_validations: int = 0
    total_time_us: float = 0.0
    field_stats: Dict[str, FieldStats] = dc_field(default_factory=dict)
    validation_times: List[float] = dc_field(default_factory=list)

    @property
    def avg_time_us(self) -> float:
        if self.total_validations <= 0:
            return 0.0
        return self.total_time_us / self.total_validations

    @property
    def median_time_us(self) -> float:
        return median(self.validation_times) if self.validation_times else 0.0

    @property
    def stddev_time_us(self) -> float:
        if len(self.validation_times) > 1:
            return stdev(self.validation_times)
        return 0.0

    @property
    def success_rate(self) -> float:
        if self.total_validations <= 0:
            return 0.0
        return self.successful_validations / self.total_validations

    @property
    def slowest_field(self) -> Optional[str]:
        if not self.field_stats:
            return None
        return max(self.field_stats.items(), key=lambda x: x[1].avg_time_us)[0]

    def to_dict(self) -> dict:
        return {
            "total_validations": self.total_validations,
            "successful_validations": self.successful_validations,
            "failed_validations": self.failed_validations,
            "success_rate": round(self.success_rate * 100, 2),
            "avg_time_us": round(self.avg_time_us, 2),
            "median_time_us": round(self.median_time_us, 2),
            "stddev_time_us": round(self.stddev_time_us, 2),
            "slowest_field": self.slowest_field,
            "field_stats": {
                name: st.to_dict() for name, st in self.field_stats.items()
            },
        }

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent)


class ValidationProfiler:
    """reference src/satya/profiling.py:106-230."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stats = ValidationStats()
        self._tracked_models: Dict[str, Any] = {}

    def track(self, model_cls):
        """Wrap ``model_cls.model_validate`` with a stopwatch
        (reference profiling.py:115-147)."""
        if not self.enabled:
            return model_cls
        self._tracked_models[model_cls.__name__] = model_cls
        # the UNBOUND function, so the wrapper dispatches on the class
        # it's invoked through — a subclass inheriting the wrapper must
        # construct the subclass, not the tracked parent
        original = model_cls.model_validate.__func__
        profiler = self

        def profiled(cls, data):
            start = time.perf_counter()
            success = False
            try:
                result = original(cls, data)
                success = True
                return result
            finally:
                elapsed_us = (time.perf_counter() - start) * 1e6
                profiler.stats.total_validations += 1
                profiler.stats.total_time_us += elapsed_us
                profiler.stats.validation_times.append(elapsed_us)
                if success:
                    profiler.stats.successful_validations += 1
                else:
                    profiler.stats.failed_validations += 1

        model_cls.model_validate = classmethod(profiled)
        return model_cls

    def profile_field(self, field_name: str, validation_func: Callable):
        """Per-call stopwatch around one field's validation function
        (reference profiling.py:149-177)."""

        def wrapper(value: Any):
            start = time.perf_counter()
            success = False
            try:
                result = validation_func(value)
                success = True
                return result
            finally:
                elapsed_us = (time.perf_counter() - start) * 1e6
                st = self.stats.field_stats.setdefault(
                    field_name, FieldStats(field_name)
                )
                st.validation_count += 1
                st.total_time_us += elapsed_us
                st.min_time_us = min(st.min_time_us, elapsed_us)
                st.max_time_us = max(st.max_time_us, elapsed_us)
                if not success:
                    st.errors += 1

        return wrapper

    # --- scale path (Spark-first addition) -------------------------------
    def profile_df(self, df, spec_or_model) -> ValidationStats:
        """Fold the distributed per-field timings
        (engine.profile_kernels: one timed aggregation pass per field)
        into this profiler's FieldStats, so the report covers the
        DataFrame path too."""
        from .engine import ValidationEngine
        from .spec import TableSpec

        spec = (
            spec_or_model
            if isinstance(spec_or_model, TableSpec)
            else spec_or_model.spec()
        )
        for row in ValidationEngine(spec).profile_kernels(df):
            st = self.stats.field_stats.setdefault(
                row["field_name"], FieldStats(row["field_name"])
            )
            st.validation_count += row["validation_count"]
            st.total_time_us += row["total_time_us"]
            st.min_time_us = min(st.min_time_us, row["total_time_us"])
            st.max_time_us = max(st.max_time_us, row["total_time_us"])
            st.errors += row.get("errors", 0) or 0
        return self.stats

    def get_stats(self) -> ValidationStats:
        return self.stats

    def reset(self) -> None:
        self.stats = ValidationStats()

    def report(self, verbose: bool = True) -> str:
        """Formatted report (reference profiling.py:188-230)."""
        s = self.stats
        lines = [
            "=" * 60,
            "satya_spark Validation Performance Report",
            "=" * 60,
            "",
            f"Total Validations: {s.total_validations:,}",
            f"Successful: {s.successful_validations:,}"
            f" ({s.success_rate * 100:.2f}%)",
            f"Failed: {s.failed_validations:,}",
            f"Avg Time: {s.avg_time_us:.2f} µs"
            f" (median {s.median_time_us:.2f}, σ {s.stddev_time_us:.2f})",
        ]
        if s.field_stats and verbose:
            lines += ["", "Per-field:"]
            for name, st in sorted(
                s.field_stats.items(), key=lambda x: -x[1].avg_time_us
            ):
                lines.append(
                    f"  {name}: n={st.validation_count:,}"
                    f" avg={st.avg_time_us:.2f}µs errors={st.errors:,}"
                )
        if s.slowest_field:
            lines += ["", f"Slowest field: {s.slowest_field}"]
        return "\n".join(lines)


__all__ = ["FieldStats", "ValidationStats", "ValidationProfiler"]
