"""Auto-applied (via PYTHONPATH) in every Python process of the test
run — including the PySpark executor workers, which the driver cannot
otherwise reach — to make the vendored ``google.protobuf`` usable.

The vendored runtime is 6.32.0; PySpark's generated
``StateMessage_pb2`` declares gencode 6.33.0, and protobuf's strict
check refuses any runtime older than the gencode. The two are one
minor version apart and the messages round-trip correctly (pinned by
the TWS test this shim exists for), so the validator is relaxed to
tolerate exactly that case: same major, runtime minor >= gencode
minor - 1. Anything further apart still raises.
"""

try:
    from google.protobuf import runtime_version as _rv

    _orig = _rv.ValidateProtobufRuntimeVersion

    def _relaxed(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
        if gen_major == _rv.MAJOR and _rv.MINOR >= gen_minor - 1:
            return
        _orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)

    _rv.ValidateProtobufRuntimeVersion = _relaxed
except Exception:  # no protobuf anywhere: leave the import error intact
    pass
