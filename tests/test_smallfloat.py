from blacklab_spark.oracle.engine import (
    _NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
    small_float_norm,
)


def test_small_values_exact():
    for i in range(_NUM_FREE_VALUES):
        assert small_float_norm(i) == i


def test_monotone_nondecreasing():
    prev = -1
    for i in range(0, 100_000, 7):
        q = small_float_norm(i)
        assert q <= i
        assert q >= prev
        prev = q


def test_idempotent():
    for i in (0, 5, 100, 1234, 99999, 2**20):
        q = small_float_norm(i)
        assert small_float_norm(q) == q


def test_byte_range():
    for i in (0, 1, 1000, 10**6, 2**31 - 1):
        b = int_to_byte4(i)
        assert 0 <= b <= 255
        assert byte4_to_int(b) <= i
