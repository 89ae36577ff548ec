"""Property-based codec tests (hypothesis): the varint/delta block codec is
the one component where a silent bit-level bug corrupts the whole stored
index, so beyond the example-based tests it gets randomized invariants:

- varint roundtrip over the FULL uint64 domain (incl. 9- and 10-byte
  encodings near 2^63/2^64);
- delta roundtrip over arbitrary sorted signed int64 runs (incl. the
  documented wrap-around case: deltas exceeding int64 range are exact
  modulo 2^64);
- grouped (one-pass) encode/decode bit-identical to the per-run primitives
  for arbitrary run partitions, including empty runs.

Pure numpy — no SparkSession needed.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from goldenretriever_spark.index.codec import (
    delta_decode_grouped,
    delta_decode_sorted_ids,
    delta_encode_grouped,
    delta_encode_sorted_ids,
    varint_decode,
    varint_decode_many,
    varint_encode,
    varint_encode_grouped,
)

uint64s = st.integers(min_value=0, max_value=2**64 - 1)
int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(uint64s, max_size=300))
def test_varint_roundtrip_full_domain(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(int64s, max_size=300))
def test_delta_roundtrip_sorted_signed(vals):
    arr = np.sort(np.array(vals, dtype=np.int64))
    out = delta_decode_sorted_ids(delta_encode_sorted_ids(arr))
    assert out.tolist() == arr.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(uint64s, max_size=400),
    st.data(),
)
def test_grouped_varint_equals_per_run(vals, data):
    """varint_encode_grouped / varint_decode_many must be bit-identical to
    the per-run primitives for ANY run partition (empty runs included)."""
    arr = np.array(vals, dtype=np.uint64)
    n = len(vals)
    cuts = sorted(
        data.draw(
            st.lists(st.integers(min_value=0, max_value=n), max_size=8),
            label="cuts",
        )
    )
    bounds = [0] + cuts + [n]
    starts = np.array(bounds[:-1], dtype=np.int64)
    ends = np.array(bounds[1:], dtype=np.int64)

    grouped = varint_encode_grouped(arr, starts, ends)
    per_run = [varint_encode(arr[s:e]) for s, e in zip(starts, ends)]
    assert grouped == per_run

    dec_vals, counts = varint_decode_many(grouped)
    assert counts.tolist() == (ends - starts).tolist()
    assert dec_vals.tolist() == arr.tolist()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(int64s, max_size=120), max_size=8))
def test_grouped_delta_equals_per_run(runs):
    """delta_encode_grouped + delta_decode_grouped over concatenated sorted
    runs must reproduce every run exactly — including empty runs anywhere
    (the round-4 zero-count guard) and wrap-around deltas."""
    runs = [np.sort(np.array(r, dtype=np.int64)) for r in runs]
    concat = (
        np.concatenate(runs) if runs else np.empty(0, dtype=np.int64)
    )
    counts = np.array([len(r) for r in runs], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64) if runs else np.empty(0, dtype=np.int64)
    # run_starts for delta_encode_grouped excludes empty runs' positions
    # contributing duplicate starts — the encoder resets at each listed
    # start; empty runs contribute no rows, so drop them there
    nz_starts = starts[counts > 0]
    deltas = delta_encode_grouped(concat, nz_starts) if concat.size else np.empty(0, dtype=np.uint64)
    out = delta_decode_grouped(deltas, counts)
    assert out.tolist() == concat.tolist()
    # and each run individually matches the per-run primitive
    pos = 0
    for r in runs:
        assert out[pos : pos + len(r)].tolist() == r.tolist()
        pos += len(r)
