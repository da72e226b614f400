"""Property-based tests (hypothesis) over the pure driver-side kernels:
the protobuf wire codec, the dedup hash arithmetic that must stay
bit-identical between the Arrow UDF / Catalyst-expression / DuckDB-oracle
formulations, and the planner models.  No SparkSession — these run in
milliseconds and explore the input space the example tests cannot.
"""

import math
import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from adampro_spark.ml import LinearModel, PegasosSVM, TrainingSample
from adampro_spark.pipeline.dedup import minhash_coeffs
from adampro_spark.pipeline.text import HASH_P
from adampro_spark.proto_io import (
    decode_create_entity,
    decode_data_message,
    decode_tuple,
    encode_create_entity,
    encode_data_message,
    encode_tuple,
    read_varint,
    write_varint,
)

# ---------------------------------------------------------------------------
# protobuf wire codec
# ---------------------------------------------------------------------------


@given(st.integers(min_value=-(2**63), max_value=2**64 - 1))
def test_varint_roundtrip(v):
    buf = bytearray()
    write_varint(buf, v)
    got, pos = read_varint(bytes(buf), 0)
    assert pos == len(buf) <= 10
    assert got == (v & (1 << 64) - 1 if v < 0 else v)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_data_roundtrip(v):
    assert decode_data_message(encode_data_message(v, "long")) == v


@given(st.floats(allow_nan=False, width=32))
def test_float_data_roundtrip(v):
    got = decode_data_message(encode_data_message(v, "float"))
    assert struct.pack("<f", got) == struct.pack("<f", v)


@given(st.floats(allow_nan=False))
def test_double_data_roundtrip(v):
    assert decode_data_message(encode_data_message(v, "double")) == v


@given(st.text())
def test_string_data_roundtrip(s):
    assert decode_data_message(encode_data_message(s, "string")) == s


@given(st.lists(st.floats(allow_nan=False, width=32), max_size=64))
def test_vector_data_roundtrip(vec):
    got = decode_data_message(encode_data_message(vec, "vector"))
    assert struct.pack(f"<{len(vec)}f", *got) == struct.pack(f"<{len(vec)}f", *vec)


@given(
    st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.one_of(st.integers(min_value=-(2**63), max_value=2**63 - 1), st.text(max_size=20)),
        max_size=5,
    )
)
def test_tuple_roundtrip(row):
    types = {k: ("long" if isinstance(v, int) else "string") for k, v in row.items()}
    assert decode_tuple(encode_tuple(row, types)) == row


@given(
    st.text(min_size=1, max_size=16),
    st.lists(
        st.tuples(
            st.text(min_size=1, max_size=8),
            st.sampled_from(["int", "long", "float", "double", "string", "vector"]),
        ),
        max_size=6,
    ),
)
def test_create_entity_roundtrip(name, attrs):
    msgs = [{"name": n, "type": t} for n, t in attrs]
    got_name, got = decode_create_entity(encode_create_entity(name, msgs))
    assert got_name == name and got == msgs


# ---------------------------------------------------------------------------
# dedup hash arithmetic: sliding matvec == step-wise fold
# ---------------------------------------------------------------------------


def _fold(codes, start, n):
    h = 0
    for c in codes[start : start + n]:
        h = (h * 31 + c) % HASH_P
    return h


@given(st.text(min_size=9, max_size=200), st.integers(min_value=2, max_value=12))
@settings(max_examples=50)
def test_matvec_shingles_equal_stepwise_fold(text, n):
    """The Arrow UDF's vectorized (sw @ w) % P must equal the per-step
    (h*31 + c) % P fold for any codepoints and any overflow-safe n —
    this is the bit-identity contract with text.shingle_hashes and the
    DuckDB oracle (pipeline/dedup.py:292-298)."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    if len(codes) <= n:
        return
    w = np.array([pow(31, j, HASH_P) for j in range(n - 1, -1, -1)], dtype=np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(codes, n)
    vec = (sw @ w) % HASH_P
    ref = [_fold(codes.tolist(), i, n) for i in range(len(codes) - n + 1)]
    assert vec.tolist() == ref


@given(st.integers(min_value=1, max_value=256), st.integers(min_value=0, max_value=2**31))
def test_minhash_coeffs_deterministic_and_in_range(nh, seed):
    a1, b1 = minhash_coeffs(nh, seed)
    a2, b2 = minhash_coeffs(nh, seed)
    assert a1 == a2 and b1 == b2
    assert all(1 <= x < HASH_P for x in a1)
    assert all(0 <= x < HASH_P for x in b1)


# ---------------------------------------------------------------------------
# planner models
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.lists(st.floats(min_value=-1, max_value=1), min_size=3, max_size=3),
            st.floats(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=30, deadline=None)
def test_models_always_predict_finite(samples):
    data = [TrainingSample(np.array(f), t) for f, t in samples]
    lin = LinearModel()
    lin.train(data)
    svm = PegasosSVM(dims=3)
    svm.train(data)
    probe = np.array([0.5, 0.5, 0.5])
    assert math.isfinite(lin.test(probe))
    assert math.isfinite(svm.test(probe))


# ---------------------------------------------------------------------------
# trainable BPE (round 9): the incremental-pair-index fit vs a naive
# full-recount reference, and encode round-trip — pure driver kernels
# ---------------------------------------------------------------------------

from adampro_spark.pipeline.bpe import END as _BPE_END
from adampro_spark.pipeline.bpe import _encoder, _learn_merges

_WORD = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=8,
)


def _naive_learn(word_freqs, num_merges, min_pair_freq=2):
    from collections import Counter as C

    vocab = {tuple(w) + (_BPE_END,): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = C()
        for symbols, freq in vocab.items():
            for i in range(len(symbols) - 1):
                pairs[(symbols[i], symbols[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_freq:
            break
        merges.append(best)
        a, b = best
        nv = {}
        for symbols, freq in vocab.items():
            out, i = [], 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == a
                    and symbols[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + freq
        vocab = nv
    return merges


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(_WORD, st.integers(min_value=1, max_value=50),
                    min_size=1, max_size=20),
    st.integers(min_value=1, max_value=25),
)
def test_bpe_incremental_fit_equals_naive(word_freqs, num_merges):
    assert _learn_merges(word_freqs, num_merges, 2) == _naive_learn(
        word_freqs, num_merges
    )


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(_WORD, st.integers(min_value=1, max_value=50),
                    min_size=1, max_size=15),
    st.lists(_WORD, min_size=1, max_size=10),
)
def test_bpe_encode_roundtrip_and_determinism(word_freqs, probe_words):
    merges = _learn_merges(word_freqs, 20, 2)
    encode_word, _pat = _encoder(merges)
    for w in probe_words:
        toks = encode_word(w)
        # lossless: concatenated tokens reproduce word + END marker
        assert "".join(toks) == w + _BPE_END
        assert 1 <= len(toks) <= len(w) + 1
        assert encode_word(w) == toks  # cached result identical


# ---------------------------------------------------------------------------
# trained langid (round 9): fit invariants over arbitrary seed corpora
# ---------------------------------------------------------------------------

from adampro_spark.pipeline.langid import _grams, _norm, fit_langid


@settings(max_examples=40, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=2, max_size=4),
        st.text(min_size=1, max_size=120),
        min_size=2,
        max_size=5,
    )
)
def test_langid_fit_invariants(seeds):
    model, meta = fit_langid(seeds)
    assert meta["langs"] == sorted(seeds)
    vocab = {g for tab in model.values() for g in tab}
    assert meta["V"] == len(vocab)
    for lang in meta["langs"]:
        fl = meta["floors"][lang]
        assert fl == round(fl, 6)
        # unseen grams are never MORE probable than seen ones
        if model[lang]:
            assert fl <= min(model[lang].values()) + 1e-9
        for v in model[lang].values():
            assert v == round(v, 6) and v < 0


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=200))
def test_langid_norm_and_grams_totals(t):
    norm = _norm(t)
    assert norm.startswith(" ") and norm.endswith(" ")
    for n in (2, 3):
        gs = [g for g in _grams(norm, (n,))]
        assert len(gs) == max(len(norm) - n + 1, 0)
        assert all(len(g) == n for g in gs)


# ---------------------------------------------------------------------------
# Round-11 kernels: driver-side properties (no Spark session needed)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=0, max_value=1_000_000_006),
        min_size=1,
        max_size=300,
        unique=True,
    ),
    st.sampled_from([1e-3, 1e-6, 1e-9]),
)
@settings(max_examples=60, deadline=None)
def test_bloom_never_false_negative(items, fpp):
    from adampro_spark.pipeline.mix import (
        _bloom_contains,
        _bloom_insert,
        _bloom_params,
    )

    arr = np.array(items, dtype=np.int64)
    m, k = _bloom_params(len(arr), fpp)
    assert m & (m - 1) == 0
    words = np.zeros(m // 64, dtype=np.uint64)
    _bloom_insert(words, arr, m, k)
    assert _bloom_contains(words, arr, m, k).all()


@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=1_000_000_006),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=7),
)
@settings(max_examples=60, deadline=None)
def test_fold_grams_np_matches_pure_python(docs, n):
    """The vectorized batch fold == the obvious per-doc loop, including
    the short/empty-doc single-gram rule."""
    from adampro_spark.pipeline.mix import _fold_grams_np

    lens = np.array([len(d) for d in docs], dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(d, dtype=np.int64) for d in docs if d])
        if any(docs)
        else np.array([], dtype=np.int64)
    )
    grams, doc_of = _fold_grams_np(flat, lens, n)
    got = [grams[doc_of == i].tolist() for i in range(len(docs))]
    P = 1_000_000_007
    for d, g in zip(docs, got):
        windows = [d[i : i + n] for i in range(max(len(d) - n + 1, 1))]
        want = []
        for w in windows:
            acc = 0
            for h in w:
                acc = (acc * 31 + h) % P
            want.append(acc)
        assert g == want


@given(st.text(max_size=80))
@settings(max_examples=80, deadline=None)
def test_ccnet_normalize_reference_is_idempotent(t):
    """The normalization is a projection: applying it twice equals once
    (pure-python mirror of the column expression's char maps)."""
    import re

    from adampro_spark.pipeline.text import (
        ACCENT_FROM,
        ACCENT_TO,
        DEDUP_PUNCT,
    )

    table = str.maketrans(ACCENT_FROM, ACCENT_TO)
    cls = "[" + re.escape(DEDUP_PUNCT) + "]"

    def norm(x):
        x = x.lower().translate(table)
        x = re.sub("[0-9]", "0", x)
        return re.sub(cls, "", x)

    assert norm(norm(t)) == norm(t)
    # accent table is an involution-free pure fold: outputs are ASCII
    assert all(c in "abcdefghijklmnopqrstuvwxyz" for c in ACCENT_TO)
