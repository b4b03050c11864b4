"""Clean-room HyperLogLog64 — behavior-parity sketch with the reference.

Implements the published HLL/HLL++ estimator (Flajolet et al. 2007; Heule
et al. 2013) with the *reference's observable semantics*, studied from
/root/reference/HLL/HyperLogLog.py (cited below, no code copied):

- elements are canonicalized via str() before hashing (HyperLogLog.py:110)
  — so 11 and "11" collide while 11 and 11.0 do not;
- hash = first 16 hex chars of sha1 (64 bits, HyperLogLog.py:111 with
  hex_length=16 at :195);
- when p % 4 != 0 the value is right-shifted by 4 - p%4 first
  (HyperLogLog.py:112-113 — a quirk of hex-prefix truncation the
  reference applies; kept for bit-parity);
- register key = low p bits, rank = 64 - p - bitlength(rest) + 1
  (HyperLogLog.py:115-119);
- estimate = linear counting m·ln(m/V) while V>0 and LC ≤ threshold[p-4]
  (HyperLogLog64.cardinality, :240-255), else the harmonic-mean raw
  estimate (:132-137).

Deliberate divergences (correctness over bug-parity, SURVEY.md §4):
- merge compatibility is checked on p, not raw k (fixes the latent bug at
  HyperLogLog.py:165-167 where k=250 and k=256 share p=8 but won't merge);
- the high-cardinality bias-correction table lookup (:201-231) is NOT
  reproduced — the empirical rawEstimateData/biasData tables are the
  reference's 1118-line data file and our production path for large
  cardinalities is Spark's built-in HLL++ / DataSketches anyway. Inside
  the linear-counting regime (which covers every golden the reference
  asserts, BASELINE.md) estimates are bit-for-bit equal.

Architecture: not an object-per-element port — registers are numpy arrays
updated per Arrow batch, exposed to Spark as a two-phase aggregation
(mapInPandas partial per batch → groupBy().applyInPandas merge), i.e. the
partial+final combiner pattern the reference hand-rolls with
mapPartitions + reduce (HLL/examples.py:56-67).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

# Linear-counting switch thresholds for p = 4..18, from the HLL++ paper's
# published appendix (Heule et al. 2013, "threshold" column).
LC_THRESHOLD = [10, 20, 40, 80, 220, 400, 900, 1800, 3100, 6500, 11500, 20000, 50000, 120000, 350000]

P_MIN, P_MAX = 4, 18
HASH_BITS = 64


def p_from_k(k: int) -> int:
    """Requested register count k → precision p = ceil(log2 k), validated
    to the reference's 64-bit range [2^4, 2^18] (HyperLogLog.py:73-83,196)."""
    if not (2**P_MIN <= int(k) <= 2**P_MAX):
        raise ValueError(f"k={k} out of range [{2**P_MIN}, {2**P_MAX}]")
    return int(math.ceil(math.log2(int(k))))


def alpha(m: int) -> float:
    """Bias-correction constant from the published estimator."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def empty_registers(p: int) -> np.ndarray:
    return np.zeros(2**p, dtype=np.uint8)


def update_registers(registers: np.ndarray, values, p: int) -> np.ndarray:
    """Fold a batch of already-stringified values into the register array.

    Vectorized where it matters: the per-element part is only sha1 + int
    parse; the register max-merge is a single np.maximum.at scatter.
    """
    m = 1 << p
    shift = (4 - p % 4) if p % 4 else 0
    keys = np.empty(len(values), dtype=np.int64)
    ranks = np.empty(len(values), dtype=np.uint8)
    for i, v in enumerate(values):
        h = int(hashlib.sha1(str(v).encode()).hexdigest()[:16], 16) >> shift
        keys[i] = h & (m - 1)
        rest = h >> p
        ranks[i] = HASH_BITS - p - rest.bit_length() + 1
    np.maximum.at(registers, keys, ranks)
    return registers


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Associative, commutative sketch merge: elementwise register max —
    the mergeability property that makes HLL a distributed aggregate."""
    if a.shape != b.shape:
        raise ValueError(f"incompatible sketch precisions: m={a.size} vs m={b.size}")
    return np.maximum(a, b)


def estimate(registers: np.ndarray) -> float:
    """Cardinality estimate: linear counting inside its regime, harmonic-
    mean raw estimate beyond it (bias tables intentionally not reproduced,
    see module docstring)."""
    m = registers.size
    p = int(math.log2(m))
    zeros = int(np.count_nonzero(registers == 0))
    if zeros > 0:
        lc = m * math.log(m / zeros)
        if lc <= LC_THRESHOLD[p - 4]:
            return lc
    harm = float(np.sum(np.exp2(-registers.astype(np.float64))))
    return alpha(m) * m * m / harm


def serialize(registers: np.ndarray) -> bytes:
    return registers.tobytes()


def deserialize(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype=np.uint8).copy()
