"""Perceptual-hash image dedup (operators/multimodal.py round 8):
dHash over the real PNG decode, exact-dup grouping, banded Hamming
near-dup join. The gate (image_dhash_dedup) pins the analytic oracle;
these tests pin what SQL can't — near-dup recall and NULL handling."""

from __future__ import annotations

import numpy as np
import pytest

from moloch_spark.operators import media_codec as MC
from moloch_spark.operators import multimodal as M


def _png(cells: np.ndarray) -> bytes:
    """8x9 cell matrix -> 8x18 image (2-px stripes, 1-px rows)."""
    arr = np.repeat(cells.astype(np.uint8), 2, axis=1)
    return MC.png_encode(arr)


def _expected_hash_bits(cells: np.ndarray) -> np.ndarray:
    return (cells[:, 1:] > cells[:, :-1]).ravel()


def test_image_dhash_near_dup_banding(spark):
    """A 1-cell edit on a checkerboard flips EXACTLY one comparison
    bit (computed independently here), so the edited copy is Hamming-1
    from the original and must surface through the byte-band equi-join
    (pigeonhole: 8 bands, <8 differing bits); an unrelated pattern
    stays filtered; NULL-hash rows group as their own canonicals; the
    recall-bound guard raises."""
    board = (np.indices((8, 9)).sum(axis=0) % 2) * 255  # checkerboard
    tweaked = board.copy()
    assert tweaked[2, 4] == 0 and tweaked[2, 5] == 255
    tweaked[2, 4] = 255  # flips only the (row 2, pair 4) comparison
    flips = int(
        (_expected_hash_bits(board) != _expected_hash_bits(tweaked)).sum()
    )
    assert flips == 1
    other = (np.indices((8, 9)).sum(axis=0) % 3 == 0) * 255  # unrelated

    media = spark.createDataFrame(
        [
            (0, "image", _png(board), None),
            (1, "image", _png(tweaked), None),
            (2, "image", _png(other), None),
            (3, "image", b"\x00not-an-image", None),
        ],
        M.MEDIA_SCHEMA,
    )
    h = M.image_dhash(media)
    got = {r.media_id: r for r in h.collect()}
    assert got[3].dhash is None and got[3].format is None
    assert got[0].format == "png"
    ham01 = bin((got[0].dhash64 ^ got[1].dhash64) & ((1 << 64) - 1)).count(
        "1"
    )
    assert ham01 == 1

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in M.image_near_dup_pairs(h, max_hamming=7).collect()
    }
    assert pairs.get((0, 1)) == 1
    assert (0, 2) not in pairs and (1, 2) not in pairs

    groups = {r.media_id: r for r in M.image_dup_groups(h).collect()}
    assert groups[3].dup_of == 3 and groups[3].is_canonical
    assert groups[0].is_canonical and not groups[0].dup_of != 0

    with pytest.raises(ValueError):
        M.image_near_dup_pairs(h, max_hamming=8, bands=8)


def test_image_dhash_robust_to_reencode_and_scale(spark):
    """The property perceptual dedup exists for: the SAME picture
    re-encoded at a different size (here 2x nearest-neighbor upscale,
    then PNG re-encode) hashes IDENTICALLY — block-mean downsampling
    sees the same cell pattern — so crawl-dup copies collapse into one
    group while a different picture does not."""
    board = (np.indices((8, 9)).sum(axis=0) % 2) * 255
    big = np.repeat(np.repeat(board.astype(np.uint8), 4, axis=0), 6, axis=1)
    media = spark.createDataFrame(
        [
            (10, "image", _png(board), None),
            (11, "image", MC.png_encode(big), None),       # 2x/3x rescale
            (12, "image", MC.png_encode(255 - big), None),  # inverted
        ],
        M.MEDIA_SCHEMA,
    )
    g = {
        r.media_id: r
        for r in M.image_dup_groups(M.image_dhash(media)).collect()
    }
    assert g[11].dup_of == 10 and not g[11].is_canonical
    assert g[12].dup_of == 12 and g[12].is_canonical
