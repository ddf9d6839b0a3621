"""Matcher tests vs the OpenCV BFMatcher oracle (the code path the reference
delegates to at orb_matcher.cpp:22-25)."""

import cv2
import numpy as np
import jax.numpy as jnp

from visionx_slam_tpu.models import matching


def rand_desc(rng, n):
    return rng.integers(0, 256, size=(n, 32), dtype=np.uint8)


def test_hamming_matrix_exact(rng):
    a = rand_desc(rng, 64)
    b = rand_desc(rng, 48)
    D = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    # numpy popcount oracle
    ax = np.unpackbits(a, axis=1).astype(np.int32)
    bx = np.unpackbits(b, axis=1).astype(np.int32)
    expected = (ax[:, None, :] != bx[None, :, :]).sum(-1)
    np.testing.assert_array_equal(D.astype(np.int32), expected)


def test_knn2_ratio_matches_opencv(rng):
    a = rand_desc(rng, 200)
    b = rand_desc(rng, 180)
    # plant strong matches: rows of b equal to rows of a with few flipped bits
    for i in range(0, 100):
        b[i] = a[i].copy()
        byte, bit = rng.integers(0, 32), rng.integers(0, 8)
        b[i][byte] ^= 1 << bit

    ours = matching.knn2_ratio_match(
        jnp.asarray(a), jnp.ones(200, bool), jnp.asarray(b), jnp.ones(180, bool)
    )

    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    knn = bf.knnMatch(a, b, k=2)
    cv_matches = {}
    for pair in knn:
        if len(pair) < 2:
            continue
        m1, m2 = pair
        if m1.distance < matching.NN_RATIO * m2.distance:
            cv_matches[m1.queryIdx] = (m1.trainIdx, m1.distance)

    ours_idx = np.asarray(ours.idx)
    ours_dist = np.asarray(ours.dist)
    ours_valid = np.asarray(ours.valid)

    # distances must agree exactly wherever both declare a match; index may
    # differ only on exact ties
    both = set(np.nonzero(ours_valid)[0].tolist()) & set(cv_matches)
    assert len(both) >= 95  # nearly all planted matches found by both
    for q in both:
        ti, d = cv_matches[q]
        assert ours_dist[q] == d
    # disagreement on validity can only arise from distance ties at the
    # ratio boundary; require near-total agreement
    sym_diff = set(np.nonzero(ours_valid)[0].tolist()) ^ set(cv_matches)
    assert len(sym_diff) <= 4


def test_invalid_slots_never_match(rng):
    a = rand_desc(rng, 32)
    b = np.vstack([a[:16], rand_desc(rng, 16)])  # first 16 identical
    valid_a = np.ones(32, bool)
    valid_a[:8] = False
    valid_b = np.ones(32, bool)
    valid_b[8:16] = False
    res = matching.knn2_ratio_match(
        jnp.asarray(a), jnp.asarray(valid_a), jnp.asarray(b), jnp.asarray(valid_b)
    )
    v = np.asarray(res.valid)
    assert not v[:8].any()  # invalid queries can't match
    idx = np.asarray(res.idx)
    matched_cols = idx[v]
    assert not np.isin(matched_cols, np.arange(8, 16)).any()  # nor invalid trains


def test_reference_distance_filter():
    # min matched distance 10 -> threshold max(20, 30) = 30
    res = matching.MatchResult(
        idx=jnp.arange(4, dtype=jnp.int32),
        dist=jnp.asarray([10.0, 25.0, 31.0, 80.0]),
        valid=jnp.asarray([True, True, True, True]),
    )
    out = matching.reference_distance_filter(res)
    assert np.asarray(out.valid).tolist() == [True, True, False, False]

    # min matched distance 40 -> threshold 80
    res2 = matching.MatchResult(
        idx=jnp.arange(3, dtype=jnp.int32),
        dist=jnp.asarray([40.0, 80.0, 81.0]),
        valid=jnp.asarray([True, True, True]),
    )
    out2 = matching.reference_distance_filter(res2)
    assert np.asarray(out2.valid).tolist() == [True, True, False]

    # no valid matches: min stays at the 100 init -> threshold 200
    res3 = matching.MatchResult(
        idx=jnp.zeros(2, jnp.int32),
        dist=jnp.asarray([150.0, 220.0]),
        valid=jnp.asarray([False, False]),
    )
    out3 = matching.reference_distance_filter(res3)
    assert not np.asarray(out3.valid).any()


def test_batched_matching(rng):
    a = np.stack([rand_desc(rng, 64) for _ in range(4)])
    b = np.stack([rand_desc(rng, 64) for _ in range(4)])
    va = np.ones((4, 64), bool)
    res = matching.match_frames_batched(
        jnp.asarray(a), jnp.asarray(va), jnp.asarray(b), jnp.asarray(va), 0.8
    )
    assert res.idx.shape == (4, 64)
    # each batch element must equal the unbatched result
    single = matching.match_frames(
        jnp.asarray(a[1]), jnp.asarray(va[1]), jnp.asarray(b[1]), jnp.asarray(va[1])
    )
    np.testing.assert_array_equal(np.asarray(res.valid[1]), np.asarray(single.valid))
