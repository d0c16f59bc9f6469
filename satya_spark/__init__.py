"""satya_spark — a from-scratch PySpark-native schema + constraint
validation engine with the semantics of justrach/satya (reference at
/root/reference, v0.4.2), re-architected for Spark: declarative specs
compile to Catalyst Column expressions (whole-stage codegen), cross-row
rules (uniqueness, referential integrity, drift) run as skew-aware
distributed aggregations, and runs are checkpoint-resumable via a
per-partition manifest. See SURVEY.md for the full design mapping.
"""

from .spec import FieldSpec, TableSpec, transcript_spec
from .compiler import compile_spec, CompiledSpec, CompiledRule
from .validators import ValidationInfo, field_validator, model_validator
from .model import Field, Model, ModelValidationError
from .engine import ValidationEngine, TableValidationError

__all__ = [
    "Field",
    "Model",
    "ModelValidationError",
    "ValidationEngine",
    "TableValidationError",
    "FieldSpec",
    "TableSpec",
    "transcript_spec",
    "compile_spec",
    "CompiledSpec",
    "CompiledRule",
    "ValidationInfo",
    "field_validator",
    "model_validator",
]

__version__ = "0.1.0"
