"""Mergeable sketches for 100-TB-scale grouped statistics.

The exact ``count_distinct`` / ``quantile`` aggregates in
``stages/grouped.py`` ship one value-list per key per batch through the
shuffle and hold a key's full value vector on one worker at the merge —
exact, but O(values-per-key) memory.  These sketches are the scale
path: the shuffle moves FIXED-SIZE state per key per batch and the
merge is O(sketch size), independent of the number of rows.

Both sketches are fully DETERMINISTIC — no RNG, no ``log()``/libm call
anywhere on the bucketing path — so the same input multiset produces
bit-identical results at any cluster size, block layout, or merge
order.  That is what lets ``tools/make_goldens.py`` check them against
an independent straight-line reimplementation (frozen golden parquet),
the same strategy the minhash/simhash pipelines use.

* **HyperLogLog** (Flajolet, Fusy, Gandouet, Meunier 2007) for
  ``approx_count_distinct``: P=12 → 4096 uint8 registers = a 4 KiB
  partial per (key, batch); merge = elementwise register max.  The
  value hash is the engine's stable FNV-1a over the value's string
  form (int/string columns only — float string forms are not portable).
  Standard error ~1.04/sqrt(4096) = 1.6 %.

* **Log-linear histogram** for ``approx_quantile`` — the HDR-histogram
  binning (also the bucket shape of DDSketch, Masson et al. VLDB 2019):
  bucket = (binary exponent, top-K mantissa bits) extracted with
  ``np.frexp`` — pure bit manipulation, so bucket boundaries are exact
  binary fractions and identical on every platform.  K=7 → relative
  value error ≤ 2^-(K+1) ≈ 0.4 %; a key's histogram is at most a few
  thousand occupied buckets regardless of row count.
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)

# null sentinels: rows whose value is SQL NULL are tagged with these in
# the per-batch sketch-input columns and skipped when building state
HLL_NULL = np.uint64(0xFFFFFFFFFFFFFFFF)
LL_NULL = np.int64(-(1 << 62))


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float round-trip — a
    float64 conversion can round a 54+-bit value up to the next power
    of two and shift the MSB position)."""
    bl = np.zeros(w.shape, np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl[v > 0] += 1
    return bl


def _fmix64(h: np.ndarray) -> np.ndarray:
    """MurmurHash3 finalizer (Appleby, public domain): FNV-1a's high
    bits cluster badly on short inputs (the last op is a multiply), and
    HLL reads the TOP bits for the register index — fmix64 avalanches
    every input bit into every output bit."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def hll_registers(hashes: np.ndarray) -> np.ndarray:
    """uint64 hash array -> uint8[HLL_M] register array."""
    h = _fmix64(hashes.astype(np.uint64, copy=False))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    # the (64-P)-bit suffix, left-aligned: its leading zeros equal the
    # leading zeros of w as a 64-bit value = 64 - bit_length(w)
    w = h << np.uint64(HLL_P)
    bl = _bit_length_u64(w)
    rho = np.where(w > 0, 64 + 1 - bl, (64 - HLL_P) + 1).astype(np.uint8)
    reg = np.zeros(HLL_M, np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_merge(parts: list[bytes]) -> np.ndarray:
    reg = np.zeros(HLL_M, np.uint8)
    for b in parts:
        if b is not None:
            reg = np.maximum(reg, np.frombuffer(b, np.uint8))
    return reg


def hll_estimate(reg: np.ndarray) -> int:
    """Classic HLL estimator with small-range linear counting.

    The indicator sum Σ 2^-reg is computed as an exact Python integer
    (every term is a power of two) so the estimate does not depend on
    float summation order — np.sum's pairwise order and a sequential
    Python sum would differ in the last ulp and could round to
    different integers.
    """
    counts = np.bincount(reg, minlength=(64 - HLL_P) + 2)
    shift = (64 - HLL_P) + 1  # max rho
    denom = 0  # Σ 2^(shift - reg), exact
    for r, c in enumerate(counts):
        if c:
            denom += int(c) << (shift - r)
    e = _HLL_ALPHA * HLL_M * HLL_M * float(1 << shift) / float(denom)
    zeros = int(counts[0])
    if e <= 2.5 * HLL_M and zeros:
        e = HLL_M * math.log(HLL_M / zeros)
    return int(math.floor(e + 0.5))


# --------------------------------------------------------------------------
# Log-linear histogram quantiles
# --------------------------------------------------------------------------

LL_K = 7  # mantissa bits per bucket: 128 sub-buckets per octave
_LL_SUB = 1 << LL_K
_LL_EXP_OFFSET = 1100  # frexp exponents span [-1073, 1024]


def ll_indices(vals: np.ndarray) -> np.ndarray:
    """float64 values -> int64 bucket indices.  Sign-symmetric: index
    order == value order (negatives get the negated positive index of
    |v|, zero maps to 0)."""
    v = np.asarray(vals, np.float64)
    if not np.isfinite(v).all():
        raise ValueError(
            "approx_quantile: non-finite value in input (filter NaN/inf "
            "upstream; a quantile over them is ill-defined)"
        )
    mant, exp = np.frexp(np.abs(v))  # mant in [0.5, 1), exact bit ops
    sub = np.floor((mant - 0.5) * (2 * _LL_SUB)).astype(np.int64)
    pidx = (exp.astype(np.int64) + _LL_EXP_OFFSET) * _LL_SUB + sub
    return np.where(v == 0.0, 0, np.where(v < 0, -pidx, pidx))


def ll_value(idx: int) -> float:
    """Bucket index -> representative value (bucket midpoint).  Exact
    binary arithmetic: (2*sub+1)/2^(K+2) is a dyadic rational and
    ldexp is exact, so engine and golden agree bitwise."""
    if idx == 0:
        return 0.0
    sign = -1.0 if idx < 0 else 1.0
    pidx = -idx if idx < 0 else idx
    e = pidx // _LL_SUB - _LL_EXP_OFFSET
    sub = pidx % _LL_SUB
    return sign * math.ldexp(0.5 + (2 * sub + 1) / (4.0 * _LL_SUB), e)


def ll_merge(indices: np.ndarray, counts: np.ndarray):
    """Concatenated (index, count) pairs from many partials -> merged
    (sorted unique indices, summed counts)."""
    if len(indices) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    u, inv = np.unique(np.asarray(indices, np.int64), return_inverse=True)
    c = np.zeros(len(u), np.int64)
    np.add.at(c, inv, np.asarray(counts, np.int64))
    return u, c


def ll_quantile(idx_sorted: np.ndarray, counts: np.ndarray, q: float):
    """Nearest-rank quantile over the merged histogram: the value of
    the bucket containing rank floor(q*(n-1)) (0-based), matching the
    index order == value order property of ll_indices."""
    n = int(counts.sum())
    if n == 0:
        return None
    rank = int(math.floor(q * (n - 1)))
    cum = np.cumsum(counts)
    pos = int(np.searchsorted(cum, rank + 1))
    return ll_value(int(idx_sorted[pos]))


# ---------------------------------------------------------------------------
# Bloom filter over pre-hashed uint64 keys — the broadcast-membership
# scale path. A 10^9-gram benchmark blocklist is ~8 GB as exact uint64
# hashes but ~2 GB at 16 bits/key with FPR ~5e-4; at 100 TB the Bloom
# is what you ray.put. Double hashing (Kirsch-Mitzenmacher): the k
# probe positions derive from two 64-bit hashes, so membership tests
# stay fully vectorized. No false negatives ever; false positives at
# the standard (1 - e^(-k/bits_per_key))^k rate.
# ---------------------------------------------------------------------------

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _bloom_probes(hashes: np.ndarray, m_bits: int, k: int):
    h1 = np.asarray(hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h2 = (h1 * _BLOOM_MIX) | np.uint64(1)
        for i in range(k):
            yield (h1 + np.uint64(i) * h2) % np.uint64(m_bits)


def bloom_build(hashes: np.ndarray, m_bits: int, k: int = 8) -> np.ndarray:
    """uint64-word bit array with every key's k probe bits set."""
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    if len(hashes):
        for idx in _bloom_probes(hashes, m_bits, k):
            np.bitwise_or.at(
                words,
                (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
    return words


def bloom_contains(
    words: np.ndarray, hashes: np.ndarray, m_bits: int, k: int = 8
) -> np.ndarray:
    """Vectorized membership mask; true for every inserted key, true
    for a non-member only at the design FPR."""
    mask = np.ones(len(hashes), dtype=bool)
    if not len(hashes):
        return mask
    for idx in _bloom_probes(hashes, m_bits, k):
        bits = (
            words[(idx >> np.uint64(6)).astype(np.int64)]
            >> (idx & np.uint64(63))
        ) & np.uint64(1)
        mask &= bits.astype(bool)
    return mask
