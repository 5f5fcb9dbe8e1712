"""SequenceLexicon / ValueLexicon (sequence_lexicon.h:35-120,
value_lexicon.h:33-110): dedupe-and-number interning containers.

SequenceLexicon maps distinct value sequences to sequentially
increasing uint32 ids; ValueLexicon does the same for single values.
Together with IdSetLexicon (kernel/id_set_lexicon.py) these are the
reference's compact-id building blocks for builder layers and encoded
shape indexes.

The re-derivation interns by a caller-supplied key function instead of
the reference's Hasher/KeyEqual template parameters — `key=` plays the
same role (e.g. FloatEquality uses numeric equality, where 0.0 == -0.0
interns to one id while preserving the FIRST representation added,
exactly the dense_hash_set behavior the reference tests pin)."""

from __future__ import annotations


class SequenceLexicon:
    """sequence_lexicon.h:64-120: Add(seq) -> uint32 id (sequential from
    0, duplicates collapse); sequence(id) -> the interned tuple."""

    def __init__(self, key=None) -> None:
        self._key = key or (lambda seq: tuple(seq))
        self._sequences: list[tuple] = []
        self._index: dict = {}

    def clear(self) -> None:
        self._sequences.clear()
        self._index.clear()

    def add(self, values) -> int:
        values = tuple(values)
        k = self._key(values)
        sid = self._index.get(k)
        if sid is None:
            sid = len(self._sequences)
            self._sequences.append(values)
            self._index[k] = sid
        return sid

    def size(self) -> int:
        return len(self._sequences)

    def __len__(self) -> int:
        return len(self._sequences)

    def sequence(self, sid: int) -> tuple:
        return self._sequences[sid]


class ValueLexicon:
    """value_lexicon.h:47-110: Add(value) -> uint32 id; value(id) keeps
    the FIRST representation added among key-equal values."""

    def __init__(self, key=None) -> None:
        self._key = key or (lambda v: v)
        self._values: list = []
        self._index: dict = {}

    def clear(self) -> None:
        self._values.clear()
        self._index.clear()

    def add(self, value) -> int:
        k = self._key(value)
        vid = self._index.get(k)
        if vid is None:
            vid = len(self._values)
            self._values.append(value)
            self._index[k] = vid
        return vid

    def size(self) -> int:
        return len(self._values)

    def __len__(self) -> int:
        return len(self._values)

    def value(self, vid: int):
        return self._values[vid]
