"""Property-based tests (hypothesis) for the pure pipeline functions —
the reference's only tested surface, here hardened against the whole
input space instead of three golden pairs."""

from __future__ import annotations

import re

from hypothesis import given
from hypothesis import strategies as st

from data_warehouse_solution_spark.ingest import is_valid_url, sanitize_table_name
from data_warehouse_solution_spark.operators.multimodal import fake_decode_features


@given(st.text(max_size=200))
def test_sanitize_output_charset(name):
    out = sanitize_table_name(name)
    assert re.fullmatch(r"[A-Za-z0-9_]*", out)
    assert not out.startswith("_")


@given(st.text(max_size=200))
def test_sanitize_idempotent(name):
    once = sanitize_table_name(name)
    assert sanitize_table_name(once) == once.lstrip("_")


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=100))
def test_is_valid_url_never_raises(s):
    assert is_valid_url(s) in (True, False)


@given(st.sampled_from(["http", "https"]), st.from_regex(r"[a-z]{1,10}\.[a-z]{2,5}", fullmatch=True))
def test_valid_urls_accepted(scheme, host):
    assert is_valid_url(f"{scheme}://{host}/path")


@given(st.sampled_from(["ftp", "file", "mailto", ""]))
def test_other_schemes_rejected(scheme):
    assert not is_valid_url(f"{scheme}://example.com")


@given(st.binary(max_size=500), st.integers(min_value=1, max_value=32))
def test_fake_features_shape_and_range(payload, dim):
    out = fake_decode_features(payload, dim)
    assert len(out) == dim
    assert all(0 <= v < 1 for v in out)
    assert out == fake_decode_features(payload, dim)  # deterministic
