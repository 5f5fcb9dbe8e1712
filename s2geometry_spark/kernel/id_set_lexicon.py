"""IdSetLexicon (id_set_lexicon.h/.cc): compactly-numbered sets of
non-negative int32 ids.  Singleton sets are represented by the id
itself; multi-element sets get ~sequence_index; the empty set is
int32-min.  This is the set-id scheme the builder's graph uses for
input-edge-id sets and label sets (graph.py stores the flattened form;
this class is the standalone API surface)."""

from __future__ import annotations

EMPTY_SET_ID = -(1 << 31)  # kEmptySetId (id_set_lexicon.h:141)


class IdSetLexicon:
    def __init__(self) -> None:
        self._sets: list[tuple[int, ...]] = []
        self._index: dict[tuple[int, ...], int] = {}

    def clear(self) -> None:
        self._sets.clear()
        self._index.clear()

    def add(self, ids) -> int:
        """Sorts, dedupes, and interns; returns the set id
        (id_set_lexicon.cc:44-66)."""
        ids = sorted(set(int(i) for i in ids))
        if not ids:
            return EMPTY_SET_ID
        if len(ids) == 1:
            assert ids[0] >= 0
            return ids[0]
        key = tuple(ids)
        seq = self._index.get(key)
        if seq is None:
            seq = len(self._sets)
            self._sets.append(key)
            self._index[key] = seq
        return ~seq

    def add_singleton(self, single_id: int) -> int:
        assert 0 <= single_id < (1 << 31)
        return int(single_id)

    @staticmethod
    def empty_set_id() -> int:
        return EMPTY_SET_ID

    def id_set(self, set_id: int) -> tuple[int, ...]:
        """The sorted tuple for a set id (id_set_lexicon.cc:68-80)."""
        if set_id >= 0:
            return (set_id,)
        if set_id == EMPTY_SET_ID:
            return ()
        return self._sets[~set_id]
