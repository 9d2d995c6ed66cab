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
    # the 64-bit pack contract guard (code-review r8): a non-64-bit
    # grid would overflow dhash64 / break the hex16+banding contract
    with pytest.raises(ValueError):
        M.image_dhash(media, hash_w=16)


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


def test_audio_fingerprint_volume_invariant_and_groups(spark):
    """The acoustic fingerprint's reason to exist: a volume-scaled
    re-encode of the same clip fingerprints IDENTICALLY (sign-of-
    energy-difference is scale-invariant), time-reordered content does
    not; short/undecodable clips emit NULLs; the banded Hamming join
    and dup grouping run off the same 64-bit surrogate."""
    from moloch_spark.operators import media_codec as MC
    from moloch_spark.operators import multimodal as M

    rate = 8000

    def broadband(order):
        """9 windows x all 8 bands, with a per-window amplitude RANKING
        (adjacent windows always differ per band) — broadband like real
        audio, so energy-difference signs ride 4x+ energy ratios, not
        quantization noise."""
        tau = np.arange(rate // 10) / rate  # 100ms per window
        segs = []
        for t in order:
            sig = sum(
                (1 + (t * 3 + b * 5) % 7)
                * np.sin(2 * np.pi * (250 + 500 * b) * tau)
                for b in range(8)
            )
            segs.append(sig)
        sig = np.concatenate(segs)
        return (sig * 32767 / (np.abs(sig).max() * 1.2)).astype(np.int16)

    clip = broadband(range(9))
    quiet = (clip * 0.25).astype(np.int16)          # volume-scaled copy
    reordered = broadband(reversed(range(9)))       # different content
    media = spark.createDataFrame(
        [
            (0, "audio", MC.wav_encode(clip, rate), None),
            (1, "audio", MC.wav_encode(quiet, rate), None),
            (2, "audio", MC.wav_encode(reordered, rate), None),
            (3, "audio", b"RIFFxxxx", None),                 # undecodable
            (4, "audio", MC.wav_encode(clip[:4], rate), None),  # too short
            (5, "audio", MC.wav_encode(clip, rate), None),   # exact copy
        ],
        M.MEDIA_SCHEMA,
    )
    fp = M.audio_fingerprint(media)
    got = {r.media_id: r for r in fp.collect()}
    assert got[0].afp is not None and got[0].sample_rate == rate
    # a volume-scaled copy was RE-QUANTIZED to int16: near-silent
    # bands ride that noise, so dup detection is a small-Hamming
    # question (the Haitsma-Kalker matching model), not equality
    ham01 = bin((got[0].afp64 ^ got[1].afp64) & ((1 << 64) - 1)).count("1")
    ham02 = bin((got[0].afp64 ^ got[2].afp64) & ((1 << 64) - 1)).count("1")
    assert ham01 <= 7, ham01                        # scaled copy: near
    assert ham02 > 7, ham02                         # reordered: far
    assert got[5].afp == got[0].afp                 # bit-identical copy
    assert got[3].afp is None and got[3].sample_rate is None
    assert got[4].afp is None and got[4].sample_rate == rate

    groups = {
        r.media_id: r
        for r in M.hash_dup_groups(fp, hash_col="afp").collect()
    }
    assert groups[5].dup_of == 0 and not groups[5].is_canonical
    assert groups[2].is_canonical
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in M.banded_hamming_pairs(
            fp, hash_col="afp64", max_hamming=7
        ).collect()
    }
    assert pairs.get((0, 1)) == ham01               # banding catches it
    assert (0, 2) not in pairs
    # the config guard
    with pytest.raises(ValueError):
        M.audio_fingerprint(media, n_frames=5, n_bands=8)


def test_video_frame_dhash_reencode_stable(spark):
    """Frame-level video near-dup: two Y4M containers of the SAME
    frames (one re-encoded via the codec roundtrip) hash identically
    frame-for-frame through frame_sample -> image_dhash; a clip with a
    different pattern does not. Also pins the every_n composition."""
    from moloch_spark.operators import media_codec as MC
    from moloch_spark.operators import multimodal as M

    frames = [
        ((np.indices((8, 16)).sum(axis=0) + k) % 2 * 255).astype(np.uint8)
        for k in range(4)
    ]
    shifted = [255 - f for f in frames]
    y1 = MC.y4m_encode(frames)
    y2 = MC.y4m_encode(frames)        # an independent re-encode
    y3 = MC.y4m_encode(shifted)
    media = spark.createDataFrame(
        [(0, "video", y1, None), (1, "video", y2, None),
         (2, "video", y3, None)],
        M.MEDIA_SCHEMA,
    )
    h = M.video_frame_dhash(media, every_n=1)
    rows = {(r.media_id, r.frame_index): r.dhash for r in h.collect()}
    assert sorted(i for m, i in rows if m == 0) == [0, 1, 2, 3]
    for i in range(4):
        assert rows[(0, i)] == rows[(1, i)]      # re-encode stable
    assert rows[(0, 0)] != rows[(2, 0)]          # different content
    # every_n composition samples the expected frames
    h2 = M.video_frame_dhash(media, every_n=2)
    assert sorted(
        i for m, i in ((r.media_id, r.frame_index) for r in h2.collect())
        if m == 0
    ) == [0, 2]


def test_image_dhash_matches_numpy_reference_on_random_images(spark):
    """Independent reimplementation pin over NON-block-aligned random
    images (the gate's analytic oracle only covers block-constant
    synthetics): a from-scratch numpy dHash with the same spec —
    channel-mean grayscale, integer block boundaries
    [d*i//n, d*(i+1)//n) clamped to >=1 px, right>left strict, row-
    major MSB-first — must agree bit-for-bit with the Spark operator
    on awkward sizes (non-multiples, tiny, wide, tall)."""
    rng = np.random.RandomState(42)
    sizes = [(8, 9), (17, 23), (5, 40), (64, 7), (9, 9), (100, 100)]
    rows, want = [], {}
    for i, (h, w) in enumerate(sizes):
        arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((i, "image", MC.png_encode(arr), None))
        g = arr.astype(np.float64).mean(axis=2)
        ys = [h * r // 8 for r in range(9)]
        xs = [w * c // 9 for c in range(10)]
        cells = np.empty((8, 9))
        for r in range(8):
            y1 = max(ys[r + 1], ys[r] + 1)
            for c in range(9):
                x1 = max(xs[c + 1], xs[c] + 1)
                cells[r, c] = g[ys[r]:y1, xs[c]:x1].mean()
        v = 0
        for bit in (cells[:, 1:] > cells[:, :-1]).ravel():
            v = (v << 1) | int(bit)
        want[i] = f"{v:016x}"
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r.media_id: r.dhash for r in M.image_dhash(media).collect()}
    assert got == want


def test_audio_fingerprint_matches_numpy_reference(spark):
    """Same pin for the acoustic fingerprint: a loop-written numpy
    reference (per-window rfft, band energy sums over integer band
    edges, energy-rose bit per (window, band)) agrees bit-for-bit on
    random int16 clips, including a non-multiple-of-9 length whose
    tail samples are trimmed."""
    rng = np.random.RandomState(7)
    rows, want = [], {}
    for i, n in enumerate((900, 1234, 9, 4096)):
        clip = rng.randint(-30000, 30000, size=n, dtype=np.int16)
        rows.append((i, "audio", MC.wav_encode(clip, 8000), None))
        mono = clip.astype(np.float64)
        win = len(mono) // 9
        E = []
        for t in range(9):
            spec = np.abs(np.fft.rfft(mono[t * win : (t + 1) * win])) ** 2
            nb = len(spec)
            bandE = []
            for b in range(8):
                lo = nb * b // 8
                hi = max(nb * (b + 1) // 8, lo + 1)
                bandE.append(spec[lo:hi].sum())
            E.append(bandE)
        v = 0
        for t in range(1, 9):
            for b in range(8):
                v = (v << 1) | int(E[t][b] > E[t - 1][b])
        want[i] = f"{v:016x}"
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r.media_id: r.afp for r in M.audio_fingerprint(media).collect()}
    assert got == want


def test_video_near_dup_clips_full_match_semantics(spark):
    """Clip-level pairing (the multimodal_near_dup gate's video leg):
    a pair survives only when EVERY frame of BOTH clips matches at
    <= max_hamming — a re-encoded copy pairs, a clip sharing a prefix
    but longer does not, one divergent frame kills the pair, and the
    frame_index key stops frame 0 of A matching frame 1 of B."""
    base = [
        ((np.indices((8, 16)).sum(axis=0) + k) % 2 * 255).astype(np.uint8)
        for k in range(3)
    ]
    one_off = [base[0], base[1], 255 - base[2]]   # last frame differs
    media = spark.createDataFrame(
        [
            (0, "video", MC.y4m_encode(base), None),
            (1, "video", MC.y4m_encode(base), None),       # re-encode
            (2, "video", MC.y4m_encode(base + [base[0]]), None),  # longer
            (3, "video", MC.y4m_encode(one_off), None),
            # frames shifted by one position: same hash SET, different
            # per-index alignment — must NOT pair with 0/1
            (4, "video", MC.y4m_encode(base[1:] + base[:1]), None),
        ],
        M.MEDIA_SCHEMA,
    )
    pairs = {
        (r.id_a, r.id_b): (r.n_frames, r.hamming)
        for r in M.video_near_dup_clips(
            M.video_frame_dhash(media, every_n=1)
        ).collect()
    }
    assert pairs == {(0, 1): (3, 0)}


def test_near_dup_synth_siblings_signature_identical(spark):
    """The multimodal_near_dup gate's planted transforms really are
    signature-exact: a 2x-scaled striped PNG dHashes identically to
    the original, and a gain=2 WAV fingerprints identically (doubling
    int16 samples is exact, so every energy comparison is unchanged)."""
    docs = spark.createDataFrame(
        [(i,) for i in (0, 3, 77, 260, 511)], ["doc_id"]
    )
    h1 = {r.media_id: r.dhash
          for r in M.image_dhash(M.synth_striped_png_media(docs)).collect()}
    h2 = {r.media_id: r.dhash
          for r in M.image_dhash(
              M.synth_striped_png_media(docs, scale=2)
          ).collect()}
    assert h1 == h2 and all(v is not None for v in h1.values())
    a1 = {r.media_id: r.afp
          for r in M.audio_fingerprint(
              M.synth_patterned_wav_media(docs)
          ).collect()}
    a2 = {r.media_id: r.afp
          for r in M.audio_fingerprint(
              M.synth_patterned_wav_media(docs, gain=2)
          ).collect()}
    assert a1 == a2 and all(v is not None for v in a1.values())
    with pytest.raises(ValueError):
        M.synth_patterned_wav_media(docs, gain=5)


def test_video_near_dup_clips_null_frames_block_pairing(spark):
    """An undecodable (NULL-hash) frame counts toward its clip's
    length but can never match, so clips with NULL frames pair with
    NOTHING — a near-dup claim must not silently pass frames it could
    not decode, even when both clips are undecodable at the same
    index."""
    rows = []
    for mid in (0, 1):          # identical except frame 1 is NULL
        rows += [(mid, 0, 7), (mid, 1, None), (mid, 2, 9)]
    for mid in (2, 3):          # fully decodable identical clips
        rows += [(mid, 0, 7), (mid, 1, 8), (mid, 2, 9)]
    fh = spark.createDataFrame(
        rows, "media_id long, frame_index long, dhash64 long"
    )
    pairs = {
        (r.id_a, r.id_b): (r.n_frames, r.hamming)
        for r in M.video_near_dup_clips(fh).collect()
    }
    assert pairs == {(2, 3): (3, 0)}


@pytest.mark.parametrize("seed", [3, 414])
def test_banded_hamming_pairs_equals_bruteforce(spark, seed):
    """Randomized recall/precision pin for the shared banded machinery:
    on clustered random 64-bit signatures, banded_hamming_pairs must
    equal the brute-force all-pairs set EXACTLY for max_hamming <
    bands (the pigeonhole guarantee is recall=1 there; precision is 1
    by the explicit bit_count filter)."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 1 << 63, size=24, dtype=np.int64)
    sigs = []
    for i in range(150):
        v = int(base[i % 24])
        for _ in range(rng.randint(0, 9)):   # 0-8 bit flips off a base
            v ^= 1 << int(rng.randint(64))
        sigs.append(v)
    sigs = [v - (1 << 64) if v >= (1 << 63) else v for v in sigs]
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin((sigs[i] ^ sigs[j]) & ((1 << 64) - 1)).count("1")
            if h <= 6:
                want.add((i, j, h))
    df = spark.createDataFrame(
        list(enumerate(sigs)), "media_id long, dhash64 long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in M.banded_hamming_pairs(df).collect()
    }
    assert got == want and len(want) > 50
