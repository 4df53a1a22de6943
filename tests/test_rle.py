"""RLE codec tests: python<->native round trips and cross-consistency."""

import numpy as np
import pytest

from padt_tpu.eval import rle


pytestmark = pytest.mark.smoke

def _random_mask(h, w, seed=0, p=0.3):
    rng = np.random.RandomState(seed)
    # blobby mask: threshold of a blurred random field
    base = rng.rand(h // 4 + 1, w // 4 + 1)
    up = np.kron(base, np.ones((4, 4)))[:h, :w]
    return (up > 1 - p).astype(np.uint8)


@pytest.mark.parametrize("hw,seed", [((7, 5), 0), ((64, 48), 1), ((100, 100), 2), ((1, 1), 3)])
def test_roundtrip_python(hw, seed):
    m = _random_mask(*hw, seed=seed)
    enc = rle.encode(m)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(m, dec)
    assert rle.area(enc) == int(m.sum())


def test_counts_string_roundtrip():
    for counts in [[0], [3, 5, 2], [0, 1], [100000, 5, 100000, 7], [0, 64 * 48]]:
        s = rle.counts_to_string(counts)
        assert rle.string_to_counts(s) == counts


def test_known_vector():
    # all-ones 2x2 mask: runs [0, 4]
    m = np.ones((2, 2), np.uint8)
    enc = rle.encode(m)
    assert rle.string_to_counts(enc["counts"]) == [0, 4]
    # leading zero column
    m2 = np.array([[0, 1], [0, 1]], np.uint8)
    assert rle.string_to_counts(rle.encode(m2)["counts"]) == [2, 2]


def test_native_matches_python():
    from padt_tpu.native import maskops

    if not maskops.available():
        pytest.skip("native maskops unavailable")
    for seed in range(4):
        m = _random_mask(53, 37, seed=seed)
        nat = maskops.encode(m)
        # python encoder on same mask
        flat_enc = rle.encode(m)
        assert nat == flat_enc["counts"]
        np.testing.assert_array_equal(maskops.decode(nat, 53, 37), m)
        assert maskops.area(nat) == m.sum()


def test_mask_iou():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b[3:8] = 1
    ra, rb = rle.encode(a), rle.encode(b)
    assert abs(rle.mask_iou(ra, rb) - 20 / 80) < 1e-9
    assert abs(rle.mask_iou(ra, rb, iscrowd=True) - 20 / 50) < 1e-9


def test_poly_to_mask():
    m = rle.poly_to_mask([[1, 1, 8, 1, 8, 8, 1, 8]], 10, 10)
    assert m[4, 4] == 1 and m[0, 0] == 0 and m.sum() >= 49


def test_native_rle_iou_matches_decode_path():
    from padt_tpu.native import maskops

    if not maskops.available():
        pytest.skip("native maskops unavailable")
    for seed in range(3):
        a = _random_mask(60, 45, seed=seed)
        b = _random_mask(60, 45, seed=seed + 10)
        ra, rb = rle.encode(a), rle.encode(b)
        # decode-path reference
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        ref = inter / union if union else 0.0
        assert abs(maskops.iou(ra["counts"], rb["counts"]) - ref) < 1e-9
        assert abs(rle.mask_iou(ra, rb) - ref) < 1e-9
        if a.sum():
            assert abs(maskops.iou(ra["counts"], rb["counts"], iscrowd=True) - inter / a.sum()) < 1e-9
