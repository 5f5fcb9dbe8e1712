"""Scalar S2CellId as plain Python ints — driver-side helper.

The NumPy kernel (cellid.py) is for data-plane batches; this class is for
driver-side algorithms over handfuls of cells (the region coverer, cell
unions for query shapes).  Same bit-level semantics (s2cell_id.h:57-76).
"""

from __future__ import annotations

M64 = (1 << 64) - 1
MAX_LEVEL = 30
POS_BITS = 61
NUM_FACES = 6
MAX_SIZE = 1 << 30


class CID:
    __slots__ = ("id",)

    def __init__(self, cid: int):
        self.id = cid & M64

    # ---- comparisons: unsigned order
    def __eq__(self, o):
        return isinstance(o, CID) and self.id == o.id

    def __lt__(self, o):
        return self.id < o.id

    def __le__(self, o):
        return self.id <= o.id

    def __gt__(self, o):
        return self.id > o.id

    def __ge__(self, o):
        return self.id >= o.id

    def __hash__(self):
        return hash(self.id)

    def __repr__(self):
        return f"CID({self.token()})"

    # ---- structure
    def lsb(self) -> int:
        return self.id & (-self.id & M64)

    @staticmethod
    def lsb_for_level(level: int) -> int:
        return 1 << (2 * (MAX_LEVEL - level))

    def level(self) -> int:
        return MAX_LEVEL - ((self.lsb().bit_length() - 1) >> 1)

    def face(self) -> int:
        return self.id >> POS_BITS

    def is_leaf(self) -> bool:
        return bool(self.id & 1)

    def is_face(self) -> bool:
        return (self.id & (self.lsb_for_level(0) - 1)) == 0

    def is_valid(self) -> bool:
        return (self.id >> POS_BITS) < NUM_FACES and bool(
            self.lsb() & 0x1555555555555555
        )

    @staticmethod
    def from_face(face: int) -> "CID":
        return CID((face << POS_BITS) + CID.lsb_for_level(0))

    # ---- hierarchy
    def parent(self, level: int | None = None) -> "CID":
        nlsb = self.lsb() << 2 if level is None else self.lsb_for_level(level)
        return CID((self.id & (-nlsb & M64)) | nlsb)

    def child(self, k: int) -> "CID":
        nlsb = self.lsb() >> 2
        return CID(self.id + (2 * k - 3) * nlsb)

    def child_begin(self, level: int | None = None) -> "CID":
        old = self.lsb()
        nlsb = old >> 2 if level is None else self.lsb_for_level(level)
        return CID(self.id - old + nlsb)

    def child_end(self, level: int | None = None) -> "CID":
        old = self.lsb()
        nlsb = old >> 2 if level is None else self.lsb_for_level(level)
        return CID(self.id + old + nlsb)

    def next(self) -> "CID":
        return CID(self.id + (self.lsb() << 1))

    def prev(self) -> "CID":
        return CID(self.id - (self.lsb() << 1))

    def range_min(self) -> "CID":
        return CID(self.id - (self.lsb() - 1))

    def range_max(self) -> "CID":
        return CID(self.id + (self.lsb() - 1))

    def contains(self, o: "CID") -> bool:
        return self.range_min().id <= o.id <= self.range_max().id

    def intersects(self, o: "CID") -> bool:
        return (
            o.range_min().id <= self.range_max().id
            and o.range_max().id >= self.range_min().id
        )

    def common_ancestor_level(self, o: "CID") -> int:
        bits = max(self.id ^ o.id, max(self.lsb(), o.lsb()))
        return max(61 - bits.bit_length(), -1) >> 1

    def child_position(self, level: int) -> int:
        return (self.id >> (2 * (MAX_LEVEL - level) + 1)) & 3

    # ---- position field / curve iteration (s2cell_id.h:117-132,
    # 360-365, 736-746)
    FACE_BITS = 3
    MAX_POSITION = M64 >> 3

    def pos(self) -> int:
        """The 61-bit Hilbert curve position within the face."""
        return self.id & (M64 >> CID.FACE_BITS)

    @staticmethod
    def from_face_pos_level(face: int, pos: int, level: int) -> "CID":
        return CID(((face << POS_BITS) + (pos | 1)) & M64).parent(level)

    @staticmethod
    def begin(level: int) -> "CID":
        return CID.from_face(0).child_begin(level)

    @staticmethod
    def end(level: int) -> "CID":
        return CID.from_face(5).child_end(level)

    def distance_from_begin(self) -> int:
        """Number of level-`level()` steps from Begin(level())
        (s2cell_id.cc:139-142)."""
        return self.id >> (2 * (MAX_LEVEL - self.level()) + 1)

    def advance(self, steps: int) -> "CID":
        step_shift = 2 * (MAX_LEVEL - self.level()) + 1
        return CID((self.id + (steps << step_shift)) & M64)

    def center_si_ti(self) -> tuple[int, int, int]:
        """GetCenterSiTi (s2cell_id.h:555-581): (face, si, ti) of the
        cell center; always odd multiples of the cell size."""
        import numpy as np

        from .cellid import to_face_ij_orientation

        f, i, j, _ = to_face_ij_orientation(
            np.array([self.id], dtype=np.uint64)
        )
        i, j = int(i[0]), int(j[0])
        if self.is_leaf():
            delta = 1
        else:
            delta = 2 if ((i ^ (self.id >> 2)) & 1) else 0
        return int(f[0]), 2 * i + delta, 2 * j + delta

    # ---- tokens / numpy interop
    def token(self) -> str:
        if self.id == 0:
            return "X"
        return format(self.id, "016x").rstrip("0")

    @staticmethod
    def from_token(tok: str) -> "CID":
        if tok == "X":
            return CID(0)
        return CID(int(tok, 16) << (4 * (16 - len(tok))))

    @staticmethod
    def none() -> "CID":
        return CID(0)

    @staticmethod
    def sentinel() -> "CID":
        return CID(M64)

    # ---- wire coding (s2cell_id.cc Encode/Decode + the legacy
    # token Coder: nul-terminated token, <= 16 hex chars)
    def encode(self, enc) -> None:
        enc.put64(self.id)

    @staticmethod
    def decode(dec) -> "CID":
        return CID(dec.get64())

    def coder_encode(self, enc) -> None:
        for ch in self.token().encode("ascii"):
            enc.put8(ch)
        enc.put8(0)

    @staticmethod
    def coder_decode(dec) -> "CID":
        """Raises ValueError on a missing nul terminator or an
        over-long token (S2CellId::Coder semantics)."""
        tok = bytearray()
        while True:
            if dec.avail() <= 0:
                raise ValueError("cell id token: missing nul terminator")
            b = dec.get8()
            if b == 0:
                break
            tok.append(b)
            if len(tok) > 16:
                raise ValueError("cell id token too long")
        return CID.from_token(tok.decode("ascii"))
