import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bsc_project_spark.io.png import decode_gray, encode_gray


def test_round_trip_basic():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert np.array_equal(decode_gray(encode_gray(img)), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_round_trip_random(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_gray(encode_gray(img)), img)


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gray(b"definitely not a png")


def test_rejects_non_2d():
    with pytest.raises(ValueError):
        encode_gray(np.zeros((3, 3, 3), dtype=np.uint8))
