"""Multi-index Hamming place-recognition index (native HamIndex): the
indexed ScoreDB must surface the same strong matches as brute-force
scoring at a probe cost independent of database size.

Reference parity target: DBoW3 Database add/query
(/root/reference/src/neural_point.py:77-80,136-142).
"""

import numpy as np
import pytest

from loopy_slam_tpu.mapping import place_recognition as pr


def _perturb(des, n_bits, rng):
    out = des.copy()
    for r in range(len(out)):
        for b in rng.choice(256, n_bits, replace=False):
            out[r, b // 8] ^= 1 << (b % 8)
    return out


@pytest.fixture
def db_pair():
    brute = pr.ScoreDB(use_index=False)
    idx = pr.ScoreDB(use_index=True)
    if idx._index is None:
        pytest.skip("native toolchain unavailable")
    return brute, idx


def test_indexed_query_matches_brute_on_true_matches(db_pair):
    brute, idx = db_pair
    rng = np.random.default_rng(3)
    anchors = [rng.integers(0, 256, (150, 32), np.uint8) for _ in range(40)]
    # anchor 31 is a revisit of anchor 5 (ORB-realistic ~30/256 bit noise)
    anchors[31] = _perturb(anchors[5], 30, rng)
    for a in anchors:
        brute.add(a)
        idx.add(a)
    q = _perturb(anchors[5], 25, rng)
    rb = brute.query(q, 2)
    ri = idx.query(q, 2)
    # both must rank the true pair first with (identical) exact scores
    assert rb[0].Id in (5, 31) and ri[0].Id in (5, 31)
    assert ri[0].Id == rb[0].Id
    assert ri[0].Score == pytest.approx(rb[0].Score)
    assert ri[0].Score > 0.3


def test_index_votes_flat_scaling():
    idx = pr.ScoreDB(use_index=True)
    if idx._index is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    for _ in range(300):
        idx.add(rng.integers(0, 256, (100, 32), np.uint8))
    q = rng.integers(0, 256, (100, 32), np.uint8)
    votes = idx._index.query_votes(q, 300)
    # random descriptors: votes stay background-level (no anchor explodes)
    assert votes.shape == (300,)
    assert votes.max() <= 100


def test_scoredb_none_and_empty_entries():
    idx = pr.ScoreDB(use_index=True)
    idx.add(None)
    rng = np.random.default_rng(1)
    d = rng.integers(0, 256, (50, 32), np.uint8)
    idx.add(d)
    res = idx.query(d, 2)
    assert res[0].Id == 1 and res[0].Score > 0.9
    assert idx.query(None, 2)[0].Score == 0.0
