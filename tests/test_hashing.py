import numpy as np
import pytest

from recom_tpu.oracle.hashing import K2, farmhash64, hash_bucket_fast


def test_empty_string():
    # farmhashna::Hash64 of the empty string is the constant k2
    assert farmhash64("") == K2


def test_tf_doc_example():
    # tf.strings.to_hash_bucket_fast(["Hello", "TensorFlow", "2.x"], 3)
    # == [0, 2, 2]  (TensorFlow API documentation example)
    np.testing.assert_array_equal(
        hash_bucket_fast(["Hello", "TensorFlow", "2.x"], 3), [0, 2, 2]
    )


@pytest.mark.parametrize("n", [0, 1, 3, 4, 7, 8, 15, 16, 17, 31, 32, 33, 63,
                               64, 65, 100, 127, 128, 129, 255, 1000])
def test_all_length_classes_deterministic(n):
    s = bytes((i * 131 + 7) % 256 for i in range(n))
    h1, h2 = farmhash64(s), farmhash64(s)
    assert h1 == h2
    assert 0 <= h1 < (1 << 64)
    if n > 0:
        # flipping one byte changes the hash (sanity, not a crypto claim)
        s2 = bytes([s[0] ^ 1]) + s[1:]
        assert farmhash64(s2) != h1


def test_int_inputs_hash_via_decimal_string():
    # tf.feature_column hash_bucket over int dtype stringifies first
    assert hash_bucket_fast([1234], 1000)[0] == farmhash64("1234") % 1000
    assert hash_bucket_fast([np.int64(-7)], 1000)[0] == farmhash64("-7") % 1000


def test_distribution_rough():
    vals = hash_bucket_fast([f"key{i}" for i in range(2000)], 10)
    counts = np.bincount(vals, minlength=10)
    assert counts.min() > 100  # roughly uniform
