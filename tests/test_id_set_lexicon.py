"""Port of id_set_lexicon_test.cc."""

from s2geometry_spark.kernel.id_set_lexicon import IdSetLexicon

INT32_MAX = (1 << 31) - 1


def test_empty_set():
    lex = IdSetLexicon()
    assert lex.id_set(lex.add([])) == ()


def test_singleton_sets():
    lex = IdSetLexicon()
    assert lex.add([5]) == 5
    assert lex.add([0, 0]) == 0
    assert lex.add_singleton(1) == 1
    assert lex.add([INT32_MAX]) == INT32_MAX

    assert lex.id_set(0) == (0,)
    assert lex.id_set(1) == (1,)
    assert lex.id_set(5) == (5,)
    assert lex.id_set(INT32_MAX) == (INT32_MAX,)


def test_sets_are_sorted():
    lex = IdSetLexicon()
    assert lex.add([2, 5]) == ~0
    assert lex.add([3, 2, 5]) == ~1
    assert lex.add([5, 2]) == ~0
    assert lex.add([5, 3, 2, 5]) == ~1

    assert lex.id_set(~0) == (2, 5)
    assert lex.id_set(~1) == (2, 3, 5)


def test_clear():
    lex = IdSetLexicon()
    assert lex.add([1, 2]) == ~0
    assert lex.add([3, 4]) == ~1
    lex.clear()
    assert lex.add([3, 4]) == ~0
    assert lex.add([1, 2]) == ~1
