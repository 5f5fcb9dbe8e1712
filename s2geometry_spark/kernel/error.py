"""S2Error port (s2error.h:15-120): typed error codes + message, the
status-code mapping used by every FindValidationError-style API in the
reference, and the absl::Status interconversion (ToS2Error / ToStatus,
s2error.h:200-260 + s2error.cc).

The reference couples S2Error to absl::Status; here the Status analog is
a tiny (StatusCode, message) value type so the bidirectional mapping —
including the "every geometry-specific code collapses to
INVALID_ARGUMENT" rule — is testable without absl.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum


class Code(IntEnum):
    """S2Error::Code (s2error.h:17-106)."""

    OK = 0

    # Generic errors, not specific to geometric objects.
    UNKNOWN = 1000
    UNIMPLEMENTED = 1001
    OUT_OF_RANGE = 1002
    INVALID_ARGUMENT = 1003
    FAILED_PRECONDITION = 1004
    INTERNAL = 1005
    DATA_LOSS = 1006
    RESOURCE_EXHAUSTED = 1007
    CANCELLED = 1008

    # Client-defined code range.
    USER_DEFINED_START = 1000000
    USER_DEFINED_END = 9999999

    # Errors that apply to more than one type of geometry.
    NOT_UNIT_LENGTH = 1
    DUPLICATE_VERTICES = 2
    ANTIPODAL_VERTICES = 3
    NOT_CONTINUOUS = 4
    INVALID_VERTEX = 5

    # S2Loop errors.
    LOOP_NOT_ENOUGH_VERTICES = 100
    LOOP_SELF_INTERSECTION = 101

    # S2Polygon/S2Shape errors.
    POLYGON_LOOPS_SHARE_EDGE = 200
    POLYGON_LOOPS_CROSS = 201
    POLYGON_EMPTY_LOOP = 202
    POLYGON_EXCESS_FULL_LOOP = 203
    POLYGON_INCONSISTENT_LOOP_ORIENTATIONS = 204
    POLYGON_INVALID_LOOP_DEPTH = 205
    POLYGON_INVALID_LOOP_NESTING = 206
    INVALID_DIMENSION = 207
    SPLIT_INTERIOR = 208
    OVERLAPPING_GEOMETRY = 209

    # S2Builder errors.
    BUILDER_SNAP_RADIUS_TOO_SMALL = 300
    BUILDER_MISSING_EXPECTED_SIBLING_EDGES = 301
    BUILDER_UNEXPECTED_DEGENERATE_EDGE = 302
    BUILDER_EDGES_DO_NOT_FORM_LOOPS = 303
    BUILDER_EDGES_DO_NOT_FORM_POLYLINE = 304
    BUILDER_IS_FULL_PREDICATE_NOT_SPECIFIED = 305


class StatusCode(IntEnum):
    """absl::StatusCode analog (only the members S2Error maps to/from)."""

    OK = 0
    CANCELLED = 1
    UNKNOWN = 2
    INVALID_ARGUMENT = 3
    NOT_FOUND = 5
    ALREADY_EXISTS = 6
    PERMISSION_DENIED = 7
    RESOURCE_EXHAUSTED = 8
    FAILED_PRECONDITION = 9
    ABORTED = 10
    OUT_OF_RANGE = 11
    UNIMPLEMENTED = 12
    INTERNAL = 13
    UNAVAILABLE = 14
    DATA_LOSS = 15
    UNAUTHENTICATED = 16
    DEADLINE_EXCEEDED = 4


@dataclass(frozen=True)
class Status:
    """(code, message) value — the absl::Status stand-in."""

    code: StatusCode = StatusCode.OK
    message: str = ""

    def ok(self) -> bool:
        return self.code == StatusCode.OK


@dataclass(frozen=True)
class S2Error:
    """S2Error value type: code + human message (s2error.h:108-170)."""

    code: Code = Code.OK
    message: str = ""

    def ok(self) -> bool:
        return self.code == Code.OK

    def __str__(self) -> str:  # operator<< (s2error.h:250)
        return f"{self.code.name}: {self.message}" if not self.ok() else "OK"

    # Factory methods (s2error.h:120-150).
    @staticmethod
    def Ok() -> "S2Error":
        return S2Error()

    @staticmethod
    def Unknown(msg: str) -> "S2Error":
        return S2Error(Code.UNKNOWN, msg)

    @staticmethod
    def Unimplemented(msg: str) -> "S2Error":
        return S2Error(Code.UNIMPLEMENTED, msg)

    @staticmethod
    def OutOfRange(msg: str) -> "S2Error":
        return S2Error(Code.OUT_OF_RANGE, msg)

    @staticmethod
    def InvalidArgument(msg: str) -> "S2Error":
        return S2Error(Code.INVALID_ARGUMENT, msg)

    @staticmethod
    def FailedPrecondition(msg: str) -> "S2Error":
        return S2Error(Code.FAILED_PRECONDITION, msg)

    @staticmethod
    def Internal(msg: str) -> "S2Error":
        return S2Error(Code.INTERNAL, msg)

    @staticmethod
    def DataLoss(msg: str) -> "S2Error":
        return S2Error(Code.DATA_LOSS, msg)

    @staticmethod
    def ResourceExhausted(msg: str) -> "S2Error":
        return S2Error(Code.RESOURCE_EXHAUSTED, msg)

    @staticmethod
    def Cancelled(msg: str) -> "S2Error":
        return S2Error(Code.CANCELLED, msg)


# Status → S2Error (ToS2Error, s2error.cc): exact mappings for the nine
# generic codes; everything else collapses to UNKNOWN.
_STATUS_TO_S2: dict[StatusCode, Code] = {
    StatusCode.OK: Code.OK,
    StatusCode.CANCELLED: Code.CANCELLED,
    StatusCode.INVALID_ARGUMENT: Code.INVALID_ARGUMENT,
    StatusCode.DATA_LOSS: Code.DATA_LOSS,
    StatusCode.RESOURCE_EXHAUSTED: Code.RESOURCE_EXHAUSTED,
    StatusCode.FAILED_PRECONDITION: Code.FAILED_PRECONDITION,
    StatusCode.OUT_OF_RANGE: Code.OUT_OF_RANGE,
    StatusCode.UNIMPLEMENTED: Code.UNIMPLEMENTED,
    StatusCode.INTERNAL: Code.INTERNAL,
    StatusCode.UNKNOWN: Code.UNKNOWN,
}


def to_s2error(status: Status) -> S2Error:
    return S2Error(_STATUS_TO_S2.get(status.code, Code.UNKNOWN), status.message)


def to_status(error: S2Error) -> Status:
    """S2Error → Status: generic codes map 1:1; every geometry-specific
    code becomes INVALID_ARGUMENT; the user-defined range becomes
    UNKNOWN (s2error_test.cc ToStatus loops)."""
    if Code.USER_DEFINED_START <= int(error.code) <= Code.USER_DEFINED_END:
        return Status(StatusCode.UNKNOWN, error.message)
    reverse = {
        Code.OK: StatusCode.OK,
        Code.CANCELLED: StatusCode.CANCELLED,
        Code.INVALID_ARGUMENT: StatusCode.INVALID_ARGUMENT,
        Code.DATA_LOSS: StatusCode.DATA_LOSS,
        Code.RESOURCE_EXHAUSTED: StatusCode.RESOURCE_EXHAUSTED,
        Code.FAILED_PRECONDITION: StatusCode.FAILED_PRECONDITION,
        Code.OUT_OF_RANGE: StatusCode.OUT_OF_RANGE,
        Code.UNIMPLEMENTED: StatusCode.UNIMPLEMENTED,
        Code.INTERNAL: StatusCode.INTERNAL,
        Code.UNKNOWN: StatusCode.UNKNOWN,
    }
    return Status(reverse.get(error.code, StatusCode.INVALID_ARGUMENT), error.message)


# Message-pattern → code classification for the existing string-message
# validation APIs (find_loop/polygon_validation_error return the
# reference's message text; this maps them onto the reference codes so
# callers get S2Error values without changing the string API).
_MESSAGE_CODES: tuple[tuple[str, Code], ...] = (
    ("fewer than 3 vertices", Code.LOOP_NOT_ENOUGH_VERTICES),
    ("not unit length", Code.NOT_UNIT_LENGTH),
    ("duplicate adjacent vertices", Code.DUPLICATE_VERTICES),
    ("antipodal", Code.ANTIPODAL_VERTICES),
    ("cross", Code.LOOP_SELF_INTERSECTION),  # "edges i and j cross"
    ("duplicate edge", Code.POLYGON_LOOPS_SHARE_EDGE),
)


def classify_validation_message(msg: str | None, *, polygon: bool = False) -> S2Error:
    """Map a find_*_validation_error message to a coded S2Error.

    Polygon-level cross messages ("loops i and j cross") map to
    POLYGON_LOOPS_CROSS; loop-level ones to LOOP_SELF_INTERSECTION
    (s2loop.cc / s2polygon.cc FindValidationError code choices).
    """
    if msg is None:
        return S2Error.Ok()
    if polygon and msg.startswith("loops ") and "cross" in msg:
        return S2Error(Code.POLYGON_LOOPS_CROSS, msg)
    for pat, code in _MESSAGE_CODES:
        if pat in msg:
            return S2Error(code, msg)
    return S2Error(Code.UNKNOWN, msg)
