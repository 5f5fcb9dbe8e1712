"""Port of s2error_test.cc: the S2Error value type, the factory codes,
and the bidirectional absl::Status mapping (ToS2Error / ToStatus),
plus the engine-side classification of validation messages onto
reference codes."""

from s2geometry_spark.kernel.error import (
    Code,
    S2Error,
    Status,
    StatusCode,
    classify_validation_message,
    to_s2error,
    to_status,
)


def test_basic():
    # s2error_test.cc TEST(S2Error, Basic): construct, then prepend context.
    error = S2Error(Code.DUPLICATE_VERTICES, "Vertex 23 is the same as vertex 47")
    error = S2Error(error.code, f"Loop {5}: {error.message}")
    assert error.code == Code.DUPLICATE_VERTICES
    assert error.message == "Loop 5: Vertex 23 is the same as vertex 47"


def test_constructor():
    error = S2Error(Code.RESOURCE_EXHAUSTED, "Memory limit exceeded (100 vs 50)")
    assert error.code == Code.RESOURCE_EXHAUSTED
    assert error.message == "Memory limit exceeded (100 vs 50)"


def test_ok_is_ok():
    assert S2Error.Ok().ok()
    assert S2Error.Ok().code == Code.OK


def test_factory_codes():
    # The nine per-code factory tests, one assertion each.
    assert S2Error.Unknown("").code == Code.UNKNOWN
    assert S2Error.Unimplemented("").code == Code.UNIMPLEMENTED
    assert S2Error.OutOfRange("").code == Code.OUT_OF_RANGE
    assert S2Error.InvalidArgument("").code == Code.INVALID_ARGUMENT
    assert S2Error.FailedPrecondition("").code == Code.FAILED_PRECONDITION
    assert S2Error.Internal("").code == Code.INTERNAL
    assert S2Error.ResourceExhausted("").code == Code.RESOURCE_EXHAUSTED
    assert S2Error.Cancelled("").code == Code.CANCELLED


def test_to_s2error():
    assert to_s2error(Status()).code == Code.OK

    exact = [
        (StatusCode.CANCELLED, Code.CANCELLED, "cancelled"),
        (StatusCode.INVALID_ARGUMENT, Code.INVALID_ARGUMENT, "invalid_argument"),
        (StatusCode.DATA_LOSS, Code.DATA_LOSS, "data_loss"),
        (StatusCode.RESOURCE_EXHAUSTED, Code.RESOURCE_EXHAUSTED, "resource_exhausted"),
        (StatusCode.FAILED_PRECONDITION, Code.FAILED_PRECONDITION, "failed_precondition"),
        (StatusCode.OUT_OF_RANGE, Code.OUT_OF_RANGE, "out_of_range"),
        (StatusCode.UNIMPLEMENTED, Code.UNIMPLEMENTED, "unimplemented"),
        (StatusCode.INTERNAL, Code.INTERNAL, "internal"),
        (StatusCode.UNKNOWN, Code.UNKNOWN, "unknown"),
    ]
    for status_code, s2_code, msg in exact:
        err = to_s2error(Status(status_code, msg))
        assert err.code == s2_code
        assert err.message == msg

    # Status codes without an exact S2Error mapping collapse to UNKNOWN.
    for status_code in (
        StatusCode.ABORTED,
        StatusCode.ALREADY_EXISTS,
        StatusCode.DEADLINE_EXCEEDED,
        StatusCode.NOT_FOUND,
        StatusCode.PERMISSION_DENIED,
        StatusCode.UNAUTHENTICATED,
        StatusCode.UNAVAILABLE,
    ):
        other = to_s2error(Status(status_code, "other"))
        assert other.code == Code.UNKNOWN
        assert other.message == "other"


def test_to_status():
    assert to_status(S2Error()).code == StatusCode.OK

    exact = [
        (S2Error.Cancelled("cancelled"), StatusCode.CANCELLED),
        (S2Error.InvalidArgument("invalid_argument"), StatusCode.INVALID_ARGUMENT),
        (S2Error.DataLoss("data_loss"), StatusCode.DATA_LOSS),
        (S2Error.ResourceExhausted("resource_exhausted"), StatusCode.RESOURCE_EXHAUSTED),
        (S2Error.FailedPrecondition("failed_precondition"), StatusCode.FAILED_PRECONDITION),
        (S2Error.OutOfRange("out_of_range"), StatusCode.OUT_OF_RANGE),
        (S2Error.Unimplemented("unimplemented"), StatusCode.UNIMPLEMENTED),
        (S2Error.Internal("internal"), StatusCode.INTERNAL),
        (S2Error.Unknown("unknown"), StatusCode.UNKNOWN),
    ]
    for err, status_code in exact:
        status = to_status(err)
        assert status.code == status_code
        assert err.message in status.message

    # Every geometry-specific code maps to INVALID_ARGUMENT.
    for code in (
        Code.NOT_UNIT_LENGTH,
        Code.DUPLICATE_VERTICES,
        Code.ANTIPODAL_VERTICES,
        Code.LOOP_NOT_ENOUGH_VERTICES,
        Code.LOOP_SELF_INTERSECTION,
        Code.POLYGON_LOOPS_SHARE_EDGE,
        Code.POLYGON_LOOPS_CROSS,
        Code.POLYGON_EMPTY_LOOP,
        Code.POLYGON_EXCESS_FULL_LOOP,
        Code.POLYGON_INCONSISTENT_LOOP_ORIENTATIONS,
        Code.POLYGON_INVALID_LOOP_DEPTH,
        Code.POLYGON_INVALID_LOOP_NESTING,
        Code.BUILDER_SNAP_RADIUS_TOO_SMALL,
        Code.BUILDER_MISSING_EXPECTED_SIBLING_EDGES,
        Code.BUILDER_UNEXPECTED_DEGENERATE_EDGE,
        Code.BUILDER_EDGES_DO_NOT_FORM_LOOPS,
        Code.BUILDER_EDGES_DO_NOT_FORM_POLYLINE,
        Code.BUILDER_IS_FULL_PREDICATE_NOT_SPECIFIED,
    ):
        other = to_status(S2Error(code, "other_invalid_argument"))
        assert other.code == StatusCode.INVALID_ARGUMENT
        assert "other_invalid_argument" in other.message

    # The user-defined range maps to UNKNOWN, not INVALID_ARGUMENT.
    for code in (Code.USER_DEFINED_START, Code.USER_DEFINED_END):
        other = to_status(S2Error(code, "other"))
        assert other.code == StatusCode.UNKNOWN
        assert "other" in other.message


def test_str():
    assert str(S2Error.Ok()) == "OK"
    assert "DUPLICATE_VERTICES" in str(S2Error(Code.DUPLICATE_VERTICES, "x"))


def test_classify_validation_messages_live():
    """classify_validation_message over the ACTUAL strings produced by
    find_loop/polygon_validation_error, so the mapping can't drift from
    the validation module."""
    import numpy as np

    from s2geometry_spark.kernel.contains import Loop, Polygon
    from s2geometry_spark.kernel.coords import latlng_to_xyz
    from s2geometry_spark.kernel.validation import (
        find_loop_validation_error,
        find_polygon_validation_error,
    )

    def ring(coords):
        lat = np.array([c[0] for c in coords], dtype=np.float64)
        lng = np.array([c[1] for c in coords], dtype=np.float64)
        return np.stack(latlng_to_xyz(lat, lng), axis=-1)

    # LOOP_NOT_ENOUGH_VERTICES
    msg = find_loop_validation_error(ring([(0, 0), (0, 1)]))
    assert classify_validation_message(msg).code == Code.LOOP_NOT_ENOUGH_VERTICES

    # NOT_UNIT_LENGTH
    bad = ring([(0, 0), (0, 1), (1, 1)])
    bad[0] *= 2.0
    msg = find_loop_validation_error(bad)
    assert classify_validation_message(msg).code == Code.NOT_UNIT_LENGTH

    # DUPLICATE_VERTICES
    msg = find_loop_validation_error(ring([(0, 0), (0, 0), (0, 1), (1, 1)]))
    assert classify_validation_message(msg).code == Code.DUPLICATE_VERTICES

    # ANTIPODAL_VERTICES (the check is exact bitwise antipodality)
    anti = np.array([[1.0, 0, 0], [-1.0, 0, 0], [0.0, 1, 0]])
    msg = find_loop_validation_error(anti)
    assert classify_validation_message(msg).code == Code.ANTIPODAL_VERTICES

    # LOOP_SELF_INTERSECTION (bowtie)
    msg = find_loop_validation_error(ring([(0, 0), (1, 1), (0, 1), (1, 0)]))
    assert classify_validation_message(msg).code == Code.LOOP_SELF_INTERSECTION

    # POLYGON_LOOPS_CROSS: two loops that properly cross
    a = ring([(0, 0), (0, 2), (2, 2), (2, 0)])
    b = ring([(1, 1), (1, 3), (3, 3), (3, 1)])
    poly = Polygon([Loop(a), Loop(b)])
    msg = find_polygon_validation_error(poly)
    assert classify_validation_message(msg, polygon=True).code == Code.POLYGON_LOOPS_CROSS

    # OK passthrough
    assert classify_validation_message(None).ok()
