"""ORB-based place recognition for submap loop-closure proposals.

The reference uses ORB keypoints + a DBoW3 bag-of-words database with a
40 MB pretrained vocabulary (reference src/neural_point.py:76-80,126-142,
1076-1107). This framework is self-contained: ORB descriptors (cv2, the
same detector the reference instantiates) are scored by exact
cross-checked Hamming matching between segment anchor frames, with a
multi-index-hashing inverted index (native HamIndex) shortlisting the
candidate anchors so query cost stays flat in the number of stored
segments. No vocabulary file is needed, and the index's vote ranking
measurably IMPROVES proposal precision over scoring every anchor
(burst-correlated false matches collect few substring votes) — see
scripts/bench_place_recognition.py for the measured recall/precision and
scaling curves.

API mirrors the reference's usage:
  db.add(features)                -> register a segment anchor
  db.query(features, k)           -> top-k (id, score) over registered
  baseline_score(anchor, frames)  -> min similarity of a segment's anchor
                                     to its own frames (compute_dbow_score
                                     parity: the adaptive per-segment
                                     threshold, neural_point.py:1076-1107)
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np

_POPCOUNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                          axis=1).sum(1).astype(np.uint8)


def extract_orb(color: np.ndarray, n_features: int = 500) -> Optional[np.ndarray]:
    """ORB descriptors of an RGB float image in [0,1] (cv2.ORB_create
    defaults, matching reference get_keyframe_orb, neural_point.py:953-957).
    Returns (N, 32) uint8 or None."""
    import cv2

    img = np.clip(np.asarray(color) * 255.0, 0, 255).astype(np.uint8)
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    orb = cv2.ORB_create(nfeatures=n_features)
    _, des = orb.detectAndCompute(gray, None)
    return des


def _hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances between packed descriptors (Na,32),(Nb,32)."""
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return _POPCOUNT[x].sum(-1).astype(np.int32)


def match_score(des_a: Optional[np.ndarray], des_b: Optional[np.ndarray],
                max_dist: int = 64) -> float:
    """Similarity in [0, 1]: fraction of cross-checked mutual nearest
    neighbors with Hamming distance < max_dist. Uses the native C++ matcher
    when available (loopy_slam_tpu/native), numpy popcount otherwise."""
    if des_a is None or des_b is None or len(des_a) == 0 or len(des_b) == 0:
        return 0.0
    try:
        from ..native.build import hamming_mutual_match_count
        good = hamming_mutual_match_count(des_a, des_b, max_dist)
        if good is not None:
            return float(good) / max(min(len(des_a), len(des_b)), 1)
    except Exception:
        pass
    d = _hamming(des_a, des_b)
    nn_ab = d.argmin(1)
    nn_ba = d.argmin(0)
    ia = np.arange(len(des_a))
    mutual = nn_ba[nn_ab] == ia
    good = mutual & (d[ia, nn_ab] < max_dist)
    return float(good.sum()) / max(min(len(des_a), len(des_b)), 1)


class QueryResult(NamedTuple):
    Id: int
    Score: float


class ScoreDB:
    """Drop-in for the reference's DBoW3 Database (add/query semantics).

    Query is two-stage once enough anchors are stored: a multi-index
    Hamming inverted index (native/matcher.cpp HamIndex — 16 exact 16-bit
    substring tables) surfaces candidate anchors at a probe cost
    independent of the number of stored anchors, and the exact
    cross-checked mutual matcher scores only that shortlist. This replaces
    the reference's DBoW3 vocabulary-tree lookup (neural_point.py:77-80,
    136-142) without a 40 MB pretrained vocabulary; brute force remains
    the fallback (and the ground truth the index's recall is benchmarked
    against — scripts/bench_place_recognition.py).
    """

    def __init__(self, max_dist: int = 64, shortlist: int = 24,
                 use_index: bool = True):
        self.entries: List[Optional[np.ndarray]] = []
        self.max_dist = max_dist
        self.shortlist = shortlist
        self._index = None
        if use_index:
            try:
                from ..native.build import HammingIndex
                self._index = HammingIndex()
            except Exception:
                self._index = None

    def add(self, des: Optional[np.ndarray]):
        if self._index is not None and des is not None and len(des):
            self._index.add(des, len(self.entries))
        self.entries.append(des)

    def query(self, des: Optional[np.ndarray], k: int) -> List[QueryResult]:
        n = len(self.entries)
        shortlist = max(self.shortlist, 2 * k)
        if self._index is not None and n > shortlist and des is not None:
            votes = self._index.query_votes(des, n)
            cand = np.argsort(votes)[::-1][:shortlist]
            cand = [int(i) for i in cand if votes[i] > 0]
            scores = np.zeros(n, np.float32)
            for i in cand:
                scores[i] = match_score(des, self.entries[i], self.max_dist)
        else:
            scores = np.array([match_score(des, e, self.max_dist)
                               for e in self.entries], np.float32)
        order = np.argsort(scores)[::-1][:k]
        return [QueryResult(int(i), float(scores[i])) for i in order]


def baseline_score(anchor_des, frame_des_list, max_dist: int = 64) -> float:
    """Adaptive per-segment threshold: MIN similarity of the segment anchor
    to the segment's own frames (parity with compute_dbow_score's
    min-over-own-frames, neural_point.py:1103-1107). Returns -1 if empty."""
    scores = [match_score(anchor_des, d, max_dist) for d in frame_des_list]
    return float(min(scores)) if scores else -1.0
