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
from .model import (
    DirectoryPath,
    EmailStr,
    Field,
    FilePath,
    HttpUrl,
    Model,
    ModelValidationError,
    NegativeFloat,
    NegativeInt,
    NewPath,
    NonNegativeFloat,
    NonNegativeInt,
    PositiveFloat,
    PositiveInt,
    SecretBytes,
    SecretStr,
)
from .engine import ValidationEngine, TableValidationError
from .compat import ValidationError, ValidationResult, StreamValidator
from .serializers import computed_field, field_serializer, model_serializer
from .scalars import (
    ArrayValidator,
    BooleanValidator,
    IntValidator,
    NumberValidator,
    StringValidator,
)
from .absent import ABSENT, filter_absent, is_absent
from .spec_json import JSONSchemaCompiler, compile_json_schema, load_json
from . import profiling  # reference exports the module (profiling tools)

# Pydantic-compat alias, like the reference's `BaseModel = Model`
# (src/satya/__init__.py exports both names)
BaseModel = Model

__all__ = [
    # core classes (reference src/satya/__init__.py:1361-1368)
    "Field",
    "Model",
    "BaseModel",
    "ModelValidationError",
    "ValidationError",
    "ValidationResult",
    "StreamValidator",
    "ValidationEngine",
    "TableValidationError",
    "FieldSpec",
    "TableSpec",
    "transcript_spec",
    "compile_spec",
    "CompiledSpec",
    "CompiledRule",
    # validation decorators
    "ValidationInfo",
    "field_validator",
    "model_validator",
    # serialization decorators
    "field_serializer",
    "model_serializer",
    "computed_field",
    # scalar/array validators
    "StringValidator",
    "IntValidator",
    "NumberValidator",
    "BooleanValidator",
    "ArrayValidator",
    # ABSENT sentinel
    "ABSENT",
    "is_absent",
    "filter_absent",
    # JSON Schema compiler + JSON loader
    "compile_json_schema",
    "JSONSchemaCompiler",
    "load_json",
    # profiling tools (FieldStats/ValidationStats/ValidationProfiler)
    "profiling",
    # special types
    "EmailStr",
    "HttpUrl",
    "SecretStr",
    "SecretBytes",
    "FilePath",
    "DirectoryPath",
    "NewPath",
    "PositiveInt",
    "NegativeInt",
    "NonNegativeInt",
    "PositiveFloat",
    "NegativeFloat",
    "NonNegativeFloat",
]

__version__ = "0.1.0"
