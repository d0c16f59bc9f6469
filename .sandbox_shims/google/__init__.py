"""Sandbox-only shim: `google.protobuf` via the Cloud SDK's bundled copy.

This container has no `protobuf` wheel (and no network to install
one), but transformWithStateInPandas' state-server protocol needs it
(pyspark/sql/streaming/proto/StateMessage_pb2.py). The box DOES ship
protobuf 6.32 inside the (public) google-cloud-sdk appengine platform
— this package redirects `google.*` there and relaxes the
gencode(6.33)>runtime(6.32) version gate, which rejects a one-minor
skew this message set doesn't actually depend on.

Activation is OPT-IN and guarded: tests/bench only prepend
`.sandbox_shims` to PYTHONPATH when `import google.protobuf` fails
AND the SDK copy exists (see satya_spark/streaming/tws_support.py).
With a real protobuf installed this directory is never on the path.
"""

_SDK_GOOGLE = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"

import os  # noqa: E402

if os.path.isdir(_SDK_GOOGLE):
    __path__ = [_SDK_GOOGLE]
    from google.protobuf import runtime_version as _rv  # noqa: E402

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
