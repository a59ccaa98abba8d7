"""Hypothesis property tests for the pure kernels — randomized invariants on
top of the seeded property tests (SURVEY.md §5 test strategy)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from dedupe_ray.functions.metrics import hamming64, jaccard_minhash, jaro_winkler
from dedupe_ray.functions.minhash import MinHasher
from dedupe_ray.functions.simhash import simhash64
from dedupe_ray.functions.text import extract_text

texts = st.text(max_size=300)
words = st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=6), max_size=40)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_extract_deterministic_and_idempotent_on_plain_text(t):
    # no tags in, so extraction == whitespace canonicalization — applying it
    # twice must be a fixpoint (the canonical form is canonical)
    once = extract_text(t.encode("utf-8", "surrogatepass") if "<" not in t else t.encode("utf-8", "surrogatepass"))
    twice = extract_text(once)
    assert twice == extract_text(twice)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=60), st.text(max_size=60))
def test_jaro_winkler_bounds_and_symmetry(a, b):
    v = jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0
    assert v == jaro_winkler(b, a)
    assert jaro_winkler(a, a) == 1.0


@settings(max_examples=40, deadline=None)
@given(words, words)
def test_minhash_estimate_bounds_and_identity(w1, w2):
    mh = MinHasher(num_perms=64)
    s1 = mh.text_signature(" ".join(w1))
    s2 = mh.text_signature(" ".join(w2))
    est = jaccard_minhash(s1, s2)
    assert 0.0 <= est <= 1.0
    assert jaccard_minhash(s1, s1) == 1.0


@settings(max_examples=40, deadline=None)
@given(words)
def test_simhash_deterministic_and_case_invariant(w):
    t = " ".join(w)
    assert simhash64(t) == simhash64(t)
    assert simhash64(t) == simhash64(t.upper())  # tokens are lowercased


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=50))
def test_hamming_metric_axioms(vals):
    a = np.array(vals, dtype=np.uint64)
    b = np.roll(a, 1)
    d = hamming64(a, b)
    assert np.all(d >= 0) and np.all(d <= 64)
    assert np.array_equal(hamming64(a, b), hamming64(b, a))
    assert np.all(np.asarray(hamming64(a, a)) == 0)
