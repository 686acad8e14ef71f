"""Property tests for the pure (no-Spark) kernels — the reference's
parametrized pure-function test style
(/root/reference/tests/trajectory_construction_test.py:24-37) plus
hypothesis fuzzing for the frozen extract kernel."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_spark.functions.extract import extract_text_series
from etl_spark.operators.multimodal import FRAME_BYTES, parse_fake_header
from etl_spark.operators.similarity import hyperplanes


def _extract_one(b: bytes) -> str:
    return extract_text_series(pd.Series([b]))[0]


# ---------------------------------------------------------------------------
# extract kernel: structural properties that must hold for ANY input
# (the byte-identity goldens live in test_extract.py; these pin the
# invariants the goldens can't enumerate).
# ---------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_extract_no_leading_trailing_or_double_space(s):
    out = _extract_one(s.encode("utf-8"))
    assert out == out.strip()
    assert "  " not in out


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_extract_deterministic_and_batchshape_independent(s):
    b = s.encode("utf-8")
    one = _extract_one(b)
    batch = extract_text_series(pd.Series([b, b, b]))
    assert list(batch) == [one, one, one]


@settings(max_examples=100, deadline=None)
@given(
    st.text(
        # Exclude Cs (lone surrogates): they are un-encodable to UTF-8 and
        # would crash the *test's* .encode(), not the kernel.
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="<>&"),
        max_size=200,
    )
)
def test_extract_plain_text_passthrough(s):
    """Markup-free text survives modulo whitespace collapsing."""
    out = _extract_one(s.encode("utf-8"))
    assert out == " ".join(s.split())


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_extract_idempotent_on_own_output(s):
    """Extracted text contains no markup, so re-extracting is identity
    (modulo the entity table: output may contain literal '&' etc. that a
    second pass would re-unescape only if they form entities — excluded
    by construction here)."""
    out = _extract_one(s.encode("utf-8"))
    if any(e in out for e in ("&lt;", "&gt;", "&quot;", "&#39;", "&amp;", "<", ">")):
        return  # entity-looking residue: second pass may legitimately differ
    assert _extract_one(out.encode("utf-8")) == out


def test_extract_null_and_empty():
    s = pd.Series([None, b"", b"   "])
    out = extract_text_series(s)
    assert out[0] is None
    assert out[1] == ""
    assert out[2] == ""


# ---------------------------------------------------------------------------
# multimodal fake-header parser
# ---------------------------------------------------------------------------
@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=1000))
def test_fake_header_ranges_and_determinism(payload):
    w, h = parse_fake_header(payload)
    assert 1 <= w <= 1024 and 1 <= h <= 1024
    assert (w, h) == parse_fake_header(payload)


def test_frame_count_formula():
    import math

    for n in (0, 1, FRAME_BYTES - 1, FRAME_BYTES, FRAME_BYTES + 1, 10 * FRAME_BYTES):
        expected = max(1, math.ceil(n / FRAME_BYTES))
        assert expected >= 1


# ---------------------------------------------------------------------------
# LSH hyperplanes: deterministic, balanced-ish, ±1 only
# ---------------------------------------------------------------------------
def test_hyperplanes_deterministic_and_pm1():
    a = hyperplanes(6, 64)
    b = hyperplanes(6, 64)
    assert a == b
    assert all(x in (-1, 1) for row in a for x in row)
    # parity of md5 is unbiased enough that no plane is constant
    assert all(len(set(row)) == 2 for row in a)
