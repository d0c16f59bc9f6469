"""Example: web-framework parameter presets (reference
src/satya/web.py:14-272) — QueryParam/PathParam/HeaderParam/FormField
with the same constraint kwargs as Field, validating one value at a
time (the HTTP-handler facade) AND a whole request-log DataFrame
columnar-side (the analytics path: same semantics, zero shuffles).
"""

import sys

from satya_spark.session import get_spark
from satya_spark.web import (
    FormField,
    HeaderParam,
    PathParam,
    QueryParam,
    violations_df,
)

# --- declare the endpoint's parameters (FastAPI-style) -------------------

params = {
    "user_id": PathParam(pattern=r"u[0-9]+"),
    "limit": QueryParam(10, ge=1, le=100, description="page size"),
    "trace": HeaderParam("x_trace_id", min_length=8),
    "email": FormField(None, email=True),
}

# --- facade: one request at a time ---------------------------------------

assert params["limit"].validate(None) == 10  # default applied
assert params["limit"].validate(25) == 25
try:
    params["limit"].validate(500)
    sys.exit("should have raised")
except ValueError as e:
    print("facade rejects limit=500:", e)

print("json schema for limit:", params["limit"].to_json_schema())
print("header alias (derived from default):", params["trace"].alias)

# --- columnar: a day of access logs in one pass ---------------------------

spark = get_spark(app_name="web-params-example", cpus=4)
log = spark.createDataFrame(
    [
        ("u1", 25, "trace-12345", "a@b.co"),
        ("u2", 500, "short", "not-an-email"),   # limit, trace, email bad
        # user_id bad; limit missing is FINE — it has a default
        ("nope", None, "trace-67890", None),
    ],
    "user_id string, limit int, trace string, email string",
)
viol = violations_df(log, params, key_cols=["user_id"])
viol.show(truncate=False)
n = viol.count()
assert n == 4, n  # le, min_length, email, pattern
print("columnar violations:", n)
spark.stop()
