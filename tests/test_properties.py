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


# --- round-2 kernels -------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_image_decoders_roundtrip(h, w, use_bmp, seed):
    """PNM/BMP encode → decode_image must reproduce the gray plane exactly
    (both containers carry the identical pixels)."""
    from dedupe_ray.stages.multimodal import decode_image

    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    if use_bmp:
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = rgb.reshape(h, w * 3)
        data = rows[::-1].tobytes()
        off = 54
        payload = (
            b"BM" + (off + len(data)).to_bytes(4, "little") + b"\0\0\0\0"
            + off.to_bytes(4, "little") + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
            + b"\0" * 16
        ) + data
    else:
        payload = b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()
    got = decode_image(payload)
    # equal-weight luma of an (r==g==b) pixel is the gray value (0.299+0.587+0.114=1)
    assert got.shape == (h, w)
    assert np.allclose(got, gray.astype(np.float32), atol=1e-3)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_area_resize_matches_naive_box_mean(h, w, seed):
    from dedupe_ray.stages.multimodal import _area_resize

    rng = np.random.default_rng(seed)
    gray = rng.random((h, w))
    oh, ow = 8, 9
    got = _area_resize(gray, oh, ow)
    assert got.shape == (oh, ow)
    if h >= oh and w >= ow:
        naive = np.zeros((oh, ow))
        ye = [i * h // oh for i in range(oh + 1)]
        xe = [j * w // ow for j in range(ow + 1)]
        for i in range(oh):
            for j in range(ow):
                naive[i, j] = gray[ye[i]:ye[i + 1], xe[j]:xe[j + 1]].mean()
        assert np.allclose(got, naive)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1), st.integers(min_value=1, max_value=8))
def test_composite_key_joins_match_per_group_bruteforce(seed, n_users):
    """The global composite-key searchsorted used by events_asof_join /
    events_range_join must agree with a per-user brute force on random
    event streams (incl. users with no clicks / no errors / ts ties)."""
    import pyarrow as pa

    from dedupe_ray.pipelines.queries import events_asof_join, events_range_join  # noqa: F401

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 60))
    uid = rng.integers(0, n_users, size=n).astype(np.int64)
    ts = rng.integers(0, 2_000_000_000, size=n).astype(np.int64)  # us, with ties likely
    ts = (ts // 250_000_000) * 250_000_000  # coarse → force ties
    et = rng.choice(np.asarray(["click", "error", "view"], dtype=object), size=n)
    win = 500_000_000

    # brute force per error event
    order = np.lexsort((ts, uid))
    uid_s, ts_s, et_s = uid[order], ts[order], et[order]
    exp_last, exp_cnt = [], []
    for k in range(n):
        if et_s[k] != "error":
            continue
        m = (uid_s == uid_s[k]) & (et_s == "click")
        c_ts = ts_s[m]
        at_or_before = c_ts[c_ts <= ts_s[k]]
        exp_last.append(int(at_or_before.max()) if len(at_or_before) else None)
        exp_cnt.append(int(((c_ts <= ts_s[k]) & (c_ts > ts_s[k] - win)).sum()))

    # replicate the production kernel shapes directly (same math as queries)
    boundary = np.r_[True, uid_s[1:] != uid_s[:-1]]
    code = np.cumsum(boundary) - 1
    t0 = int(ts_s.min())
    span = int(ts_s.max()) - t0 + win + 2
    key = code * span + (ts_s - t0)
    is_click = et_s == "click"
    err = et_s == "error"
    click_key, click_ts = key[is_click], ts_s[is_click]
    base = np.searchsorted(click_key, key[err] // span * span)
    pos = np.searchsorted(click_key, key[err], side="right") - 1
    valid = pos >= base
    got_last = [
        int(click_ts[p]) if v else None for p, v in zip(np.clip(pos, 0, None), valid)
    ]
    hi = np.searchsorted(click_key, key[err], side="right")
    lo = np.searchsorted(click_key, key[err] - win, side="right")
    got_cnt = (hi - lo).astype(int).tolist()
    assert got_last == exp_last
    assert got_cnt == exp_cnt
