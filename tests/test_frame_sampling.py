import sys

import pytest

from robust_cvd_tpu.utils.frame_range import FrameRange
from robust_cvd_tpu.utils.frame_sampling import sample_pairs, to_one_way


def _reference_hierarchical(num_frames, two_way, min_dist=1, max_dist=None,
                            include_mid_point=False):
    """Independent re-derivation of the reference algorithm
    (utils/frame_sampling.py:77-108) used as a test oracle."""
    import math
    if max_dist is None:
        max_dist = num_frames - 1
    pairs = set()
    min_level = math.ceil(math.log2(min_dist))
    max_level = math.floor(math.log2(max_dist))
    signs = (-1, 1) if two_way else (1,)
    for level in range(min_level, max_level + 1):
        dist = 1 << level
        step = 1 << (max(0, level - 1) if include_mid_point else level)
        for start in range(0, num_frames, step):
            for sign in signs:
                end = start + sign * dist
                if 0 <= end < num_frames:
                    pairs.add((start, end))
    return pairs


@pytest.mark.parametrize("n", [2, 3, 10, 50, 100])
def test_hierarchical2_matches_reference(n):
    got = set(sample_pairs(n, ("hierarchical2",), two_way=True))
    want = _reference_hierarchical(n, True, include_mid_point=True)
    assert got == want


def test_hierarchical2_scaling_nlogn():
    # O(N log N) pair count: the sequence-length scaling mechanism.
    n = 256
    pairs = sample_pairs(n, ("hierarchical2",), two_way=True)
    assert len(pairs) < 8 * n * 9  # ~ 2 * 2 * N * log2(N) upper bound
    assert len(pairs) > n  # more than consecutive


def test_consecutive():
    pairs = sample_pairs(5, ("consecutive",), two_way=True)
    assert (0, 1) in pairs and (1, 0) in pairs and (4, 3) in pairs
    assert all(abs(i - j) == 1 for i, j in pairs)


def test_exhausted():
    pairs = sample_pairs(4, ("exhausted",), two_way=False)
    assert pairs == [(i, j) for i in range(4) for j in range(i + 1, 4)]


def test_to_one_way():
    assert to_one_way([(1, 0), (0, 1), (2, 3)]) == [(0, 1), (2, 3)]


def test_frame_range_parse():
    fr = FrameRange("1,3,5-7")
    assert fr.resolve(10).frames() == [1, 3, 5, 6, 7]
    assert FrameRange("").resolve(4).frames() == [0, 1, 2, 3]
    assert FrameRange("5-7").resolve(6).frames() == [5]
    assert FrameRange("0-3").resolve(10).to_string() == "0-3"
    assert 3 in FrameRange("1,3").resolve(10)
    assert FrameRange("2-5").resolve(10).is_consecutive()
