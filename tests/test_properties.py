"""Property tests on the pure-Python semantic traps (SURVEY.md SS5.3):
the limit sanitizer, service-sentinel normalization, and API-edge rounding
— no SparkSession needed, so hypothesis can run thousands of cases."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from public_transit_data_platform_sql_nosql_spark.api.shapes import (
    round2,
    round6,
    to_json_safe,
)
from public_transit_data_platform_sql_nosql_spark.operators.params import (
    DEFAULT_LIMIT,
    normalize_service_id,
    sanitize_limit,
)


@given(st.one_of(st.none(), st.integers(), st.text(max_size=8),
                 st.floats(allow_nan=True)))
def test_sanitize_limit_total(limit):
    """Never raises; always None (unlimited) or a positive int."""
    out = sanitize_limit(limit)
    assert out is None or (isinstance(out, int) and out > 0)


@given(st.integers(min_value=1, max_value=10**6))
def test_sanitize_limit_passes_positive_ints(n):
    assert sanitize_limit(n) == n
    assert sanitize_limit(str(n)) == n


@given(st.integers(max_value=0))
def test_sanitize_limit_nonpositive_defaults(n):
    assert sanitize_limit(n) == DEFAULT_LIMIT


def test_sanitize_limit_all_cases():
    assert sanitize_limit("all") is None
    assert sanitize_limit("ALL") is None
    assert sanitize_limit(None) == DEFAULT_LIMIT
    assert sanitize_limit("junk") == DEFAULT_LIMIT


@given(st.one_of(st.none(), st.integers(), st.text(max_size=4)))
def test_normalize_service_id_total(sid):
    out = normalize_service_id(sid)
    assert out in (None, "1", "2", "3")


def test_sentinel_values_mean_no_filter():
    for v in (None, "", "4", 4, " 4 ", "week", "0"):
        assert normalize_service_id(v) is None
    for v in ("1", 1, " 2 ", "3"):
        assert normalize_service_id(v) in ("1", "2", "3")


@given(st.one_of(st.none(), st.floats(allow_nan=False,
                                      allow_infinity=False,
                                      min_value=-1e12, max_value=1e12)))
def test_round2_idempotent_and_none_safe(v):
    """The reference's float(f"{v:.2f}") is a fixpoint: re-rounding a
    rounded value must not change it (payload stability across backends)."""
    out = round2(v)
    assert out == round2(out)
    if v is None:
        assert out is None


@given(st.floats(min_value=-180, max_value=180))
def test_round6_within_half_ulp(v):
    assert abs(round6(v) - v) <= 5e-7


@given(
    st.recursive(
        st.one_of(st.none(), st.integers(), st.floats(allow_nan=True),
                  st.text(max_size=6)),
        lambda kids: st.one_of(
            st.lists(kids, max_size=4),
            st.dictionaries(st.text(max_size=4), kids, max_size=4),
        ),
        max_leaves=12,
    )
)
def test_to_json_safe_strips_all_nans(obj):
    def no_nan(x):
        if isinstance(x, dict):
            return all(no_nan(v) for v in x.values())
        if isinstance(x, list):
            return all(no_nan(v) for v in x)
        return not (isinstance(x, float) and x != x)

    assert no_nan(to_json_safe(obj))
