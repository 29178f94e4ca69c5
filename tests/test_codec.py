"""Codec unit + property tests (SURVEY.md §5.1): encode∘decode = id."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_aggregation_geoclustering_spark.functions import codec


def test_varbyte_known_values():
    assert codec.varbyte_encode(np.array([0], np.uint64)) == b"\x00"
    assert codec.varbyte_encode(np.array([127], np.uint64)) == b"\x7f"
    assert codec.varbyte_encode(np.array([128], np.uint64)) == b"\x80\x01"
    assert codec.varbyte_encode(np.array([300], np.uint64)) == b"\xac\x02"  # LEB128 classic


def test_varbyte_empty():
    assert codec.varbyte_encode(np.array([], np.uint64)) == b""
    assert codec.varbyte_decode(b"").size == 0


def test_varbyte_u64_max():
    v = np.array([2**64 - 1, 0, 1], np.uint64)
    assert list(codec.varbyte_decode(codec.varbyte_encode(v))) == list(v)


def test_varbyte_truncated_raises():
    with pytest.raises(ValueError):
        codec.varbyte_decode(b"\x80")


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    v = np.array(values, np.uint64)
    assert list(codec.varbyte_decode(codec.varbyte_encode(v))) == values


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_posting_ids_roundtrip(ids):
    ids = np.array(sorted(ids), np.uint64)
    out = codec.decode_posting_ids(codec.encode_posting_ids(ids))
    assert list(out) == list(ids)


def test_delta_requires_strictly_increasing():
    with pytest.raises(ValueError):
        codec.delta_encode(np.array([3, 3], np.uint64))
    with pytest.raises(ValueError):
        codec.delta_encode(np.array([5, 4], np.uint64))


def test_segmented_encode_matches_per_run():
    rng = np.random.default_rng(0)
    runs = [np.sort(rng.choice(10_000, size=rng.integers(1, 50), replace=False)) for _ in range(30)]
    values = np.concatenate(runs).astype(np.uint64)
    starts = np.cumsum([0] + [len(r) for r in runs[:-1]])
    deltas = codec.segmented_delta_encode(values, starts)
    arr = codec.segmented_varbyte_binary(deltas, starts, len(values))
    assert isinstance(arr, pa.BinaryArray)
    for i, run in enumerate(runs):
        assert list(codec.decode_posting_ids(arr[i].as_py())) == list(run)


def test_segmented_empty():
    arr = codec.segmented_varbyte_binary(
        np.empty(0, np.uint64), np.empty(0, np.int64), 0
    )
    assert len(arr) == 0


# --- per-segment bitpacking (the positional shuffle wire format) ---------


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 17)),  # (len, width)
        max_size=25,
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=200, deadline=None)
def test_bitpack_segments_roundtrip(shapes, rnd):
    lens = np.array([l for l, _ in shapes], np.int64)
    widths = np.array([w for _, w in shapes], np.int64)
    vals = (
        np.concatenate(
            [
                np.array([rnd.randrange(1 << w) if w else 0 for _ in range(l)], np.uint64)
                for l, w in shapes
            ]
        )
        if shapes
        else np.empty(0, np.uint64)
    )
    buf, ends = codec.bitpack_segments(vals, lens, widths)
    assert np.array_equal(codec.bitunpack_segments(buf, lens, widths), vals)
    # per-segment slices decode independently (per-doc cells over the wire)
    starts = np.concatenate(([0], ends[:-1])) if len(ends) else ends
    off = 0
    for i, (l, w) in enumerate(shapes):
        seg = buf[starts[i] : ends[i]]
        assert np.array_equal(
            codec.bitunpack_segments(seg, lens[i : i + 1], widths[i : i + 1]),
            vals[off : off + l],
        )
        off += l


def test_code_width_exact_at_powers_of_two():
    nt = np.array([0, 1, 2, 3, 4, 5, 8, 9, 16, 17, 1024, 1025, 1 << 20, (1 << 20) + 1])
    want = [0, 0, 1, 2, 2, 3, 3, 4, 4, 5, 10, 11, 20, 21]
    assert list(codec.code_width(nt)) == want


def test_pack_positions_roundtrip_corpus_shaped():
    import pandas as pd
    from elasticsearch_aggregation_geoclustering_spark.functions.tokenizer import (
        doc_term_positions,
        pack_term_frequencies,
        packed_term_frequencies,
    )

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(40)]
    texts = pd.Series(
        [
            " ".join(rng.choice(vocab, size=rng.integers(0, 60)))
            for _ in range(300)
        ]
        + ["", "solo", "a a a a a"]
    )
    f0, p0 = doc_term_positions(texts)
    pk = pack_term_frequencies(texts, with_positions=True)
    assert list(pk.columns) == ["terms_blob", "codes_pk", "n_terms", "dl"]
    f1, p1 = packed_term_frequencies(
        pk["terms_blob"], pk["n_terms"], codes_pk=pk["codes_pk"], dl=pk["dl"]
    )
    assert f0.equals(f1)
    assert np.array_equal(p0, p1)
    # the packed positional payload beats 1 byte/token (what varbyte
    # position deltas cost) on a zipf-free 40-term vocabulary: <= 6 bits
    assert pk["codes_pk"].map(len).sum() <= (pk["dl"].sum() * 6) // 8 + len(pk)
