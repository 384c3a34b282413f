"""Hypothesis properties for the r9 operators' algebraic cores — the
laws the distributed implementations rely on, checked over thousands of
pure-Python cases (the Spark/DuckDB differentials pin the engines; these
pin the MATH): KMV overlap estimation is exact set algebra in the
under-k regime, Pearson moments are permutation/shift/scale invariant
the way the integer-moment trick assumes, and the PQ/SQ8 pack codec is
a bijection on byte sequences."""

from __future__ import annotations

import hashlib
import math
import statistics

from hypothesis import given, settings
from hypothesis import strategies as st

KMV_K = 64
KMV_SPACE = 1_000_000_007


def _h(v) -> int:
    """Stand-in for core.md5_hash64's bounded hash: md5 -> [0, P)."""
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) \
        % KMV_SPACE


def _kmv(values, k=KMV_K):
    return sorted({_h(v) for v in values})[:k]


def _overlap(a, b, k=KMV_K):
    """Python mirror of pipeline/profile.kmv_overlap's set algebra."""
    ka, kb = _kmv(a, k), _kmv(b, k)
    merged = sorted(set(ka) | set(kb))[:k]
    n = len(merged)
    match = sum(1 for h in merged if h in set(ka) and h in set(kb))
    est_union = n if n < k else (k - 1) * KMV_SPACE // max(merged[-1], 1)
    return n, match, est_union


sets_small = st.sets(st.integers(min_value=0, max_value=10_000),
                     max_size=40)


@given(sets_small, sets_small)
@settings(max_examples=200, deadline=None)
def test_kmv_overlap_exact_in_under_k_regime(a, b):
    """Below k the sketches ARE the hash sets: match equals the true
    intersection size and est_union the true union size (hash
    collisions are possible in principle but astronomically unlikely
    over these domains — and they would be engine-identical anyway)."""
    n, match, est_union = _overlap(a, b)
    assert n == len(a | b) < KMV_K
    assert match == len(a & b)
    assert est_union == len(a | b)


@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=500,
               max_size=800),
       st.integers(min_value=0, max_value=400))
@settings(max_examples=30, deadline=None)
def test_kmv_union_minima_decide_membership(universe, n_shared):
    """The law kmv_overlap leans on: every union k-minimum that belongs
    to side A is IN A's sketch (A's kth minimum bounds the union's), so
    testing sketch membership equals testing set membership."""
    u = sorted(universe)
    shared = set(u[:n_shared])
    rest = u[n_shared:]
    a = shared | set(rest[: len(rest) // 2])
    b = shared | set(rest[len(rest) // 2:])
    ka, kb = set(_kmv(a)), set(_kmv(b))
    merged = sorted(set(_kmv(a)) | set(_kmv(b)))[:KMV_K]
    ha = {_h(v) for v in a}
    hb = {_h(v) for v in b}
    for h in merged:
        assert (h in ka) == (h in ha)
        assert (h in kb) == (h in hb)


floats = st.integers(min_value=-10_000, max_value=10_000)
pairs = st.lists(st.tuples(floats, floats), min_size=3, max_size=60)


def _corr_from_int_moments(xy):
    """The integer-moment Pearson form numeric_correlations computes."""
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx = sum(x * x for x, _ in xy)
    syy = sum(y * y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    if den_x <= 0 or den_y <= 0:
        return None
    return (n * sxy - sx * sy) / math.sqrt(den_x) / math.sqrt(den_y)


@given(pairs)
@settings(max_examples=200, deadline=None)
def test_integer_moment_corr_matches_library(xy):
    got = _corr_from_int_moments(xy)
    xs = [x for x, _ in xy]
    ys = [y for _, y in xy]
    if got is None:
        assert len(set(xs)) == 1 or len(set(ys)) == 1
        return
    want = statistics.correlation(xs, ys)
    assert abs(got - want) < 1e-9
    assert -1.0 - 1e-12 <= got <= 1.0 + 1e-12


@given(pairs, st.integers(min_value=1, max_value=50),
       st.integers(min_value=-100, max_value=100))
@settings(max_examples=100, deadline=None)
def test_integer_moment_corr_scale_shift_invariant(xy, scale, shift):
    """Pearson r is invariant under positive affine maps — the property
    that makes the quantization step (v -> round(v * scale)) a no-op on
    the statistic beyond granularity."""
    got = _corr_from_int_moments(xy)
    mapped = [(x * scale + shift, y) for x, y in xy]
    got2 = _corr_from_int_moments(mapped)
    if got is None or got2 is None:
        assert got == got2
        return
    assert abs(got - got2) < 1e-9


@given(st.lists(st.integers(min_value=0, max_value=255), min_size=1,
                max_size=128))
@settings(max_examples=300, deadline=None)
def test_hex_pack_codec_is_a_bijection(codes):
    """The pure-Python mirror of _sq8_pack/_sq8_unpack: zero-padded hex
    pairs concatenated then parsed back recover any byte sequence, and
    the packed width is exactly len(codes) bytes."""
    packed = bytes.fromhex("".join(f"{c:02x}" for c in codes))
    assert len(packed) == len(codes)
    hexed = packed.hex()
    back = [int(hexed[i:i + 2], 16) for i in range(0, len(hexed), 2)]
    assert back == codes
