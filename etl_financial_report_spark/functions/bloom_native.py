"""Spark-native bloom filter build + Arrow-batched probe (VERDICT r5
item 2: the production-geometry path the row-exploded demo filter cannot
reach).

The BUILD is Spark's own: ``DataFrameStatFunctions.bloomFilter`` — the
JVM ``BloomFilterAggregate`` machinery tree-aggregates per-partition
filters into one ``org.apache.spark.util.sketch.BloomFilterImpl``
(map-side-combined, mergeable, exactly what the engine's runtime bloom
join filters use). PySpark 4 exposes neither that stat method nor the
``bloom_filter_agg`` / ``might_contain`` SQL functions (both live in the
internal FunctionRegistry — verified unresolvable in this build), so the
build goes through the documented JVM seam and the PROBE re-derives
``BloomFilterImpl.mightContainLong`` vectorized in numpy from the
filter's public serialized form (spark/common/sketch
``BloomFilterImpl.writeTo``: version, numHashFunctions, long[] bit
words; ``Murmur3_x86_32.hashLong`` double hashing). The probe is pinned
BIT-FOR-BIT against the JVM's own ``mightContainLong`` over every key in
tests/test_bloom.py, so the reimplementation cannot drift silently.

At 100 TB: the filter is built distributed in the JVM (one pass, O(bits)
driver state), ships to executors as a broadcast blob (a few GiB at 1e9
keys — the FAISS-style bounded artifact), and the probe is an
Arrow-batched numpy pass — no shuffle, no per-row Python.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _fmix(h1: np.ndarray) -> np.ndarray:
    h1 ^= np.uint32(8)  # hashLong: length is always 8 bytes
    h1 ^= h1 >> np.uint32(16)
    h1 *= np.uint32(0x85EBCA6B)
    h1 ^= h1 >> np.uint32(13)
    h1 *= np.uint32(0xC2B2AE35)
    h1 ^= h1 >> np.uint32(16)
    return h1


def _mix_k1(k1: np.ndarray) -> np.ndarray:
    k1 = k1 * _C1
    k1 = _rotl32(k1, 15)
    return k1 * _C2


def _mix_h1(h1: np.ndarray, k1: np.ndarray) -> np.ndarray:
    h1 = h1 ^ k1
    h1 = _rotl32(h1, 13)
    return h1 * np.uint32(5) + np.uint32(0xE6546B64)


def murmur3_hash_long(values: np.ndarray, seed: np.ndarray | int) -> np.ndarray:
    """``Murmur3_x86_32.hashLong(input, seed)`` (spark/common/sketch),
    vectorized: the long is consumed as two 32-bit halves, low first.
    Returns int32-valued uint32 words."""
    with np.errstate(over="ignore"):
        v = values.astype(np.uint64)
        low = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        high = (v >> np.uint64(32)).astype(np.uint32)
        h1 = np.broadcast_to(np.asarray(seed, dtype=np.uint32), low.shape).copy()
        h1 = _mix_h1(h1, _mix_k1(low))
        h1 = _mix_h1(h1, _mix_k1(high))
        return _fmix(h1)


def deserialize_bloom(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse ``BloomFilter.writeTo`` output. V1 (``BloomFilterImpl``):
    int version, int numHashFunctions, then the BitArray (int wordCount,
    big-endian longs). V2 (``BloomFilterImplV2``, what Spark 4's
    stat.bloomFilter writes — layout read from the spark-sketch class
    files): int version, int numHashFunctions, int seed, then the
    BitArray. Returns (version, num_hash, seed, words)."""
    version = struct.unpack(">i", data[:4])[0]
    if version == 1:
        num_hash, n_words = struct.unpack(">ii", data[4:12])
        seed, offset = 0, 12
    elif version == 2:
        num_hash, seed, n_words = struct.unpack(">iii", data[4:16])
        offset = 16
    else:
        raise ValueError(f"unsupported BloomFilter serialization version {version}")
    words = np.frombuffer(data, dtype=">i8", count=n_words, offset=offset)
    return version, num_hash, seed, words.astype(np.int64)


def bloom_might_contain_np(
    version: int, num_hash: int, seed: int, words: np.ndarray, keys: np.ndarray
) -> np.ndarray:
    """``mightContainLong`` vectorized, both wire versions. Shared:
    h1 = hashLong(key, seed), h2 = hashLong(key, h1) (signed ints).
    V1 (``BloomFilterImpl``): per probe i in 1..k, 32-bit combined =
    h1 + i*h2, negative bit-flipped, % bitSize. V2
    (``BloomFilterImplV2.scatterHashAndGetAllBits``): 64-bit combined =
    (long) h1 * Integer.MAX_VALUE, then k times combined += (long) h2,
    indexing (combined < 0 ? ~combined : combined) % bitSize while the
    signed accumulator keeps running. Word probe: bit ``idx & 63`` of
    word ``idx >> 6`` (Java's ``1L << index`` masks the shift)."""
    bit_size = np.int64(words.shape[0] * 64)
    k = keys.astype(np.int64)
    h1 = murmur3_hash_long(k, np.uint32(seed))
    h2 = murmur3_hash_long(k, h1)
    out = np.ones(k.shape, dtype=bool)
    uwords = words.view(np.uint64)

    def probe_bits(idx: np.ndarray) -> np.ndarray:
        bit = (
            uwords[idx >> np.int64(6)] >> (idx.astype(np.uint64) & np.uint64(63))
        ) & np.uint64(1)
        return bit.astype(bool)

    with np.errstate(over="ignore"):
        if version == 1:
            for i in range(1, num_hash + 1):
                combined = (h1 + np.uint32(i) * h2).astype(np.int32)
                combined = np.where(combined < 0, ~combined, combined)
                out &= probe_bits(combined.astype(np.int64) % bit_size)
        else:
            h1s = h1.astype(np.int32).astype(np.int64)  # sign-extended
            h2s = h2.astype(np.int32).astype(np.int64)
            combined = h1s * np.int64(2147483647)
            for _ in range(num_hash):
                combined = combined + h2s
                idx = np.where(combined < 0, ~combined, combined)
                out &= probe_bits(idx % bit_size)
    return out


def build_bloom_filter_jvm(
    df: DataFrame, col: str, expected_items: int, num_bits: int
) -> bytes:
    """Distributed native build: the JVM's
    ``DataFrameStatFunctions.bloomFilter(col, expectedNumItems, numBits)``
    (per-partition ``BloomFilterImpl``s merged by treeAggregate), returned
    in its public serialized form. Driver state is O(num_bits), never
    O(rows)."""
    jvm_df = df._jdf
    jbf = jvm_df.stat().bloomFilter(col, expected_items, num_bits)
    spark = df.sparkSession
    baos = spark._jvm.java.io.ByteArrayOutputStream()
    jbf.writeTo(baos)
    return bytes(baos.toByteArray())


def with_might_contain(
    spark: SparkSession,
    df: DataFrame,
    key_col: str,
    filter_bytes: bytes,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Arrow-batched probe: broadcast the serialized filter, deserialize
    once per python worker, test each Arrow batch's long keys vectorized."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    bc = spark.sparkContext.broadcast(filter_bytes)
    # StructType.add MUTATES the receiver (and df.schema returns the
    # DataFrame's cached schema object) — build a fresh StructType
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, BooleanType(), False)]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        version, num_hash, seed, words = deserialize_bloom(bc.value)
        for pdf in batches:
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            pdf[out_col] = bloom_might_contain_np(version, num_hash, seed, words, keys)
            yield pdf

    return df.mapInPandas(probe, schema=schema)


def bloom_build_np(
    keys: np.ndarray, num_bits: int, num_hash: int, seed: int = 0
) -> np.ndarray:
    """Build twin of ``bloom_might_contain_np`` at wire version 1
    (``BloomFilterImpl.putLong``): per probe i in 1..k, 32-bit combined =
    h1 + i*h2, negative bit-flipped, % bitSize, set the bit. Because the
    build and the probe share the exact arithmetic, every inserted key is
    GUARANTEED to probe true (the one-sided bloom contract) — pinned in
    tests/test_snapshots.py for the manifest blooms. ``num_bits`` must be
    a multiple of 64. Returns the int64 bit words."""
    assert num_bits % 64 == 0 and num_bits > 0
    bit_size = np.int64(num_bits)
    k = np.asarray(keys, dtype=np.int64)
    words = np.zeros(num_bits // 64, dtype=np.uint64)
    if k.size:
        with np.errstate(over="ignore"):
            h1 = murmur3_hash_long(k, np.uint32(seed))
            h2 = murmur3_hash_long(k, h1)
            for i in range(1, num_hash + 1):
                combined = (h1 + np.uint32(i) * h2).astype(np.int32)
                combined = np.where(combined < 0, ~combined, combined)
                idx = combined.astype(np.int64) % bit_size
                np.bitwise_or.at(
                    words,
                    idx >> np.int64(6),
                    np.uint64(1) << (idx.astype(np.uint64) & np.uint64(63)),
                )
    return words.view(np.int64)


def bloom_set_bits(words: np.ndarray) -> list[int]:
    """Set-bit positions of a bloom word array — the JSON-safe manifest
    form (sparse: ~num_hash positions per key)."""
    uw = words.view(np.uint64)
    pos = np.arange(uw.shape[0] * 64, dtype=np.int64)
    bit = (uw[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
    return [int(p) for p in pos[bit.astype(bool)]]


def bloom_from_set_bits(set_bits: list[int], num_bits: int) -> np.ndarray:
    """Inverse of :func:`bloom_set_bits`."""
    words = np.zeros(num_bits // 64, dtype=np.uint64)
    if set_bits:
        idx = np.asarray(set_bits, dtype=np.int64)
        np.bitwise_or.at(
            words,
            idx >> np.int64(6),
            np.uint64(1) << (idx.astype(np.uint64) & np.uint64(63)),
        )
    return words.view(np.int64)
