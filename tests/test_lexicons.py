"""Ports of sequence_lexicon_test.cc and value_lexicon_test.cc."""

from __future__ import annotations

import copy
import struct

import numpy as np

from s2geometry_spark.kernel.lexicons import SequenceLexicon, ValueLexicon


def test_sequence_lexicon_int64():
    # sequence_lexicon_test.cc:44-61
    lex = SequenceLexicon()
    assert lex.add([]) == 0
    assert lex.add([5]) == 1
    assert lex.add([]) == 0
    assert lex.add([5, 5]) == 2
    assert lex.add([5, 0, -3]) == 3
    assert lex.add([5]) == 1
    assert lex.add([0x7FFFFFFFFFFFFFFF]) == 4
    assert lex.add([5, 0, -3]) == 3
    assert lex.add([]) == 0
    assert lex.size() == 5
    assert lex.sequence(0) == ()
    assert lex.sequence(1) == (5,)
    assert lex.sequence(2) == (5, 5)
    assert lex.sequence(3) == (5, 0, -3)
    assert lex.sequence(4) == (0x7FFFFFFFFFFFFFFF,)


def test_sequence_lexicon_clear():
    # sequence_lexicon_test.cc:63-71
    lex = SequenceLexicon()
    assert lex.add([1]) == 0
    assert lex.add([2]) == 1
    lex.clear()
    assert lex.add([2]) == 0
    assert lex.add([1]) == 1


def test_sequence_lexicon_copy_keeps_state():
    # sequence_lexicon_test.cc CopyConstructor/assignment semantics:
    # a copy carries the interned sequences and keeps numbering from there
    original = SequenceLexicon()
    assert original.add([1, 2]) == 0
    lex = copy.deepcopy(original)
    del original
    assert lex.add([3, 4]) == 1
    assert lex.sequence(0) == (1, 2)
    assert lex.sequence(1) == (3, 4)


def test_value_lexicon_duplicate_values():
    # value_lexicon_test.cc:36-54
    lex = ValueLexicon()
    assert lex.add(5) == 0
    assert lex.add(0) == 1
    assert lex.add(-3) == 2
    assert lex.add(5) == 0
    assert lex.add(0) == 1
    assert lex.add(0x7FFFFFFFFFFFFFFF) == 3
    assert lex.add(-0x8000000000000000) == 4
    assert lex.add(0x7FFFFFFFFFFFFFFF) == 3
    assert lex.add(-0x8000000000000000) == 4
    assert lex.size() == 5
    assert lex.value(0) == 5
    assert lex.value(1) == 0
    assert lex.value(2) == -3
    assert lex.value(3) == 0x7FFFFFFFFFFFFFFF
    assert lex.value(4) == -0x8000000000000000


def test_value_lexicon_clear():
    # value_lexicon_test.cc:56-65
    lex = ValueLexicon()
    assert lex.add(1) == 0
    assert lex.add(2) == 1
    assert lex.add(1) == 0
    lex.clear()
    assert lex.add(2) == 0
    assert lex.add(1) == 1
    assert lex.add(2) == 0


def test_value_lexicon_float_equality():
    # value_lexicon_test.cc:67-80: points (1,0,0), (1,-0,0), (1,0,-0)
    # differ bitwise but compare equal; all intern to id 0 and value(0)
    # is bit-identical to the FIRST one added
    lex = ValueLexicon(key=lambda p: tuple(p))  # tuple equality: -0.0 == 0.0
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([1.0, -0.0, 0.0])
    c = np.array([1.0, 0.0, -0.0])
    assert a.tobytes() != b.tobytes()
    assert a.tobytes() != c.tobytes()
    assert b.tobytes() != c.tobytes()
    assert lex.add(a) == 0
    assert lex.add(b) == 0
    assert lex.add(c) == 0
    assert lex.size() == 1
    assert lex.value(0).tobytes() == a.tobytes()


def test_value_lexicon_copy_keeps_state():
    original = ValueLexicon()
    assert original.add(5) == 0
    lex = copy.deepcopy(original)
    del original
    assert lex.add(10) == 1
    assert lex.value(0) == 5
    assert lex.value(1) == 10


def test_sequence_lexicon_many_unique():
    # shape of BM_AddInt32Sequence: sequential unique adds stay O(1) each
    lex = SequenceLexicon()
    for i in range(10000):
        assert lex.add((i, i + 1)) == i
    for i in range(10000):
        assert lex.add((i, i + 1)) == i
    assert lex.size() == 10000


def test_value_lexicon_bytes_key():
    # raw-byte keying (the S2PointHash-style usage but with memcmp
    # semantics): distinct zero signs intern separately
    lex = ValueLexicon(key=lambda p: struct.pack("<3d", *p))
    assert lex.add((1.0, 0.0, 0.0)) == 0
    assert lex.add((1.0, -0.0, 0.0)) == 1
    assert lex.size() == 2
