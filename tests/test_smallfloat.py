"""Pin SmallFloat quantization to the reference semantics
(solr-8.4.0/lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-169)."""

import numpy as np

from lucene_7_x_9_x_spark.functions.smallfloat import (
    LENGTH_TABLE, MAX_INT4, NUM_FREE_VALUES, byte4_to_int, int_to_byte4)


def java_long_to_int4(i: int) -> int:
    """Straight scalar transcription of the Java spec, used as test oracle."""
    assert i >= 0
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def java_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def java_int_to_byte4(i: int) -> int:
    nfv = 255 - java_long_to_int4(2**31 - 1)
    if i < nfv:
        return i
    return nfv + java_long_to_int4(i - nfv)


def java_byte4_to_int(b: int) -> int:
    nfv = 255 - java_long_to_int4(2**31 - 1)
    return b if b < nfv else nfv + java_int4_to_long(b - nfv)


def test_constants():
    assert MAX_INT4 == java_long_to_int4(2**31 - 1) == 231
    assert NUM_FREE_VALUES == 24


def test_roundtrip_monotone_full_range():
    # every byte decodes; encode(decode(b)) == b for all 256 bytes
    decoded = byte4_to_int(np.arange(256))
    assert np.all(np.diff(decoded) > 0)  # strictly monotone (order-preserving)
    assert np.array_equal(int_to_byte4(decoded), np.arange(256))


def test_matches_java_spec_exhaustive_small_and_boundaries():
    vals = list(range(0, 5000)) + [2**k + d for k in range(13, 31)
                                   for d in (-1, 0, 1)] + [2**31 - 1]
    vals = np.array(sorted(set(vals)), dtype=np.int64)
    ours = int_to_byte4(vals)
    theirs = np.array([java_int_to_byte4(int(v)) for v in vals])
    assert np.array_equal(ours, theirs & 0xFF)
    back_ours = byte4_to_int(ours)
    back_theirs = np.array([java_byte4_to_int(int(b)) for b in theirs])
    assert np.array_equal(back_ours, back_theirs)


def test_fixture_f3_lengths():
    # FIXTURES.md F3 token counts: exact below 24+8=... (subnormal range),
    # quantized above; 39/40 bucket behavior
    dls = np.array([1, 2, 5, 39, 40, 41, 100, 255, 256, 1000, 2000])
    norms = int_to_byte4(dls)
    q = byte4_to_int(norms)
    # values < 24 are exact
    assert np.all(q[dls < 24] == dls[dls < 24])
    # quantization never exceeds the true value and is within 1/16 relative
    assert np.all(q <= dls)
    assert np.all(dls - q <= np.maximum(dls // 8, 0))
    # LENGTH_TABLE agrees
    assert np.allclose(LENGTH_TABLE[norms], q.astype(np.float32))
