"""Lucene SmallFloat norm quantization, vectorized in numpy.

Semantics transcribed from the reference (behavior, not code):
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-169
    - longToInt4:  float-like encoding of positive longs preserving order,
      4 significant bits (3 stored + 1 implicit), shift stored +1 so that 0
      marks subnormal values (< 8).
    - intToByte4:  values < NUM_FREE_VALUES (= 255 - longToInt4(2^31-1) = 24)
      are stored exactly; larger values are offset by NUM_FREE_VALUES and
      encoded with longToInt4.
BM25 uses intToByte4(doc_length) as the per-doc one-byte norm
(solr-8.4.0/.../search/similarities/BM25Similarity.java:115-126) and decodes
through a 256-entry LENGTH_TABLE (ibid.:106-112).
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(v: np.ndarray) -> np.ndarray:
    """Vectorized longToInt4 over a non-negative int64 array."""
    v = np.asarray(v, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("only supports positive values")
    # number of significant bits; bit_length(0) == 0
    num_bits = np.zeros_like(v)
    nz = v > 0
    num_bits[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
    # float log2 can be off by one at exact powers near 2^53; testdata doc
    # lengths are far below that, but correct defensively:
    too_low = nz & (v >> np.clip(num_bits, 0, 62) != 0)
    num_bits[too_low] += 1
    shift = num_bits - 4
    subnormal = num_bits < 4
    out = np.empty_like(v)
    out[subnormal] = v[subnormal]
    ns = ~subnormal
    enc = (v[ns] >> shift[ns]) & 0x07
    out[ns] = enc | ((shift[ns] + 1) << 3)
    return out


def _int4_to_long(i: np.ndarray) -> np.ndarray:
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    out = np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
    return out


MAX_INT4 = int(_long_to_int4(np.array([2**31 - 1]))[0])
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 -> uint8 array (the norm byte)."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports positive values")
    small = i < NUM_FREE_VALUES
    out = np.empty(i.shape, dtype=np.int64)
    out[small] = i[small]
    out[~small] = NUM_FREE_VALUES + _long_to_int4(i[~small] - NUM_FREE_VALUES)
    return out.astype(np.uint8)


def byte4_to_int(b: np.ndarray) -> np.ndarray:
    """Vectorized byte4ToInt over a uint8 array -> int64 quantized lengths."""
    u = np.asarray(b).astype(np.int64) & 0xFF
    small = u < NUM_FREE_VALUES
    out = np.empty(u.shape, dtype=np.int64)
    out[small] = u[small]
    out[~small] = NUM_FREE_VALUES + _int4_to_long(u[~small] - NUM_FREE_VALUES)
    return out


# LENGTH_TABLE[b] = byte4ToInt(b) for b in 0..255, as float32
# (BM25Similarity.java:106-112)
LENGTH_TABLE = byte4_to_int(np.arange(256, dtype=np.int64)).astype(np.float32)
