"""Image perceptual-hash dedup: hand-labeled fixture + invariants.

The fixture plants the three interesting cases by construction:
- a one-byte-edited near-identical variant (must pair at hamming <= 4),
- an exact duplicate image (must pair at hamming 0),
- an unrelated image (must stay unpaired).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamprocessors_spark.plans.mm_dedup import (
    IMG_MAX_HAMMING,
    IMG_VARIANT_OFF,
    image_phash_pairs,
    image_signatures,
    images_frame,
)

TEXT_A = (
    "the quick brown fox jumps over the lazy dog while the rain in "
    "spain falls mainly on the plain and keeps falling for a while"
)
TEXT_B = (
    "pack my box with five dozen liquor jugs and then sphinx of black "
    "quartz judge my vow said the editor to the typesetting machine"
)
TEXT_C = (
    "zebras yawn under xylophones vexing quiet wombats until kittens "
    "jostle irate hounds gnawing ferns every dawn chasing bright ants"
)


def _fixture(spark):
    # doc_ids chosen so all are images (% 3 == 0) and only doc 0 gets a
    # planted variant (% 9 == 0): 0 -> A (+variant), 3 & 6 -> B (exact
    # dup pair), 12 -> C (unrelated)
    rows = [(0, TEXT_A), (3, TEXT_B), (6, TEXT_B), (12, TEXT_C)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_image_phash_hand_fixture(spark):
    docs = _fixture(spark)
    pairs = {
        (r.img_a, r.img_b): r.hamming
        for r in image_phash_pairs(docs).collect()
    }
    # planted one-byte variant: near-identical, not necessarily exact
    assert (0, IMG_VARIANT_OFF) in pairs
    assert 0 <= pairs[(0, IMG_VARIANT_OFF)] <= IMG_MAX_HAMMING
    # exact duplicate image: hamming 0
    assert pairs.get((3, 6)) == 0
    # the unrelated image pairs with nothing
    assert not any(12 in p for p in pairs)


def test_image_phash_variant_differs_only_locally(spark):
    """The planted edit changes exactly one raster byte, so the dHash
    signatures of original and variant differ in at most 4 bits (one
    gray value participates in <= 2 horizontal + 2 vertical bits)."""
    docs = _fixture(spark)
    sigs = {r.img_id: r.h63 for r in image_signatures(docs).collect()}
    x = sigs[0] ^ sigs[IMG_VARIANT_OFF]
    assert bin(x).count("1") <= 4
    assert sigs[3] == sigs[6]
    assert sigs[0] != sigs[3]


def test_image_keep_list_components(spark):
    from streamprocessors_spark.plans.advanced import _min_label_components

    docs = _fixture(spark)
    pairs = image_phash_pairs(docs).selectExpr(
        "img_a as doc_a", "img_b as doc_b"
    )
    labels = _min_label_components(pairs).selectExpr(
        "doc_id as l_img", "canonical"
    )
    verdicts = {
        r.img_id: (r.canonical, r.keep)
        for r in images_frame(docs)
        .join(labels, F.col("img_id") == F.col("l_img"), "left")
        .selectExpr(
            "img_id",
            "coalesce(canonical, img_id) as canonical",
            "coalesce(canonical, img_id) = img_id as keep",
        )
        .collect()
    }
    assert verdicts[0] == (0, True)
    assert verdicts[IMG_VARIANT_OFF] == (0, False)
    assert verdicts[3] == (3, True)
    assert verdicts[6] == (3, False)
    assert verdicts[12] == (12, True)


def test_audio_fingerprint_hand_fixture(spark):
    """Audio modality mirror of the image fixture: ids chosen so all are
    audio docs (% 3 == 1), only id 1 gets a planted variant (% 9 == 1);
    4 & 13 share text (exact dup), 7 is unrelated."""
    from streamprocessors_spark.plans.mm_dedup import (
        AUD_MAX_HAMMING,
        AUD_VARIANT_OFF,
        audio_fingerprint_pairs,
        audio_signatures,
    )

    rows = [(1, TEXT_A), (4, TEXT_B), (13, TEXT_B), (7, TEXT_C)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.aud_a, r.aud_b): r.hamming
        for r in audio_fingerprint_pairs(docs).collect()
    }
    assert (1, 1 + AUD_VARIANT_OFF) in pairs
    assert 0 <= pairs[(1, 1 + AUD_VARIANT_OFF)] <= AUD_MAX_HAMMING
    assert pairs.get((4, 13)) == 0
    assert not any(7 in p for p in pairs)
    sigs = {r.aud_id: r.h63 for r in audio_signatures(docs).collect()}
    # one byte edit flips at most ~4 fingerprint bits (one sample sits
    # in <= 2 overlapping windows, each feeding <= 2 comparisons)
    assert bin(sigs[1] ^ sigs[1 + AUD_VARIANT_OFF]).count("1") <= AUD_MAX_HAMMING


def test_video_framehash_hand_fixture(spark):
    """Video modality: ids % 3 == 2; id 2 gets the planted variant
    (% 9 == 2); 5 & 14 share text (every frame shared), 8 unrelated.
    TEXT_A is ~2 frames, so the one-byte edit leaves >= half shared."""
    from streamprocessors_spark.plans.mm_dedup import (
        VID_VARIANT_OFF,
        video_framehash_pairs,
    )

    rows = [(2, TEXT_A), (5, TEXT_B), (14, TEXT_B), (8, TEXT_C)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.vid_a, r.vid_b): (r.n_shared, r.n_min)
        for r in video_framehash_pairs(docs).collect()
    }
    assert (2, 2 + VID_VARIANT_OFF) in pairs
    shared, nmin = pairs[(2, 2 + VID_VARIANT_OFF)]
    assert 2 * shared >= nmin
    assert (5, 14) in pairs
    s2, m2 = pairs[(5, 14)]
    assert s2 == m2  # exact dup: every frame shared
    assert not any(8 in p for p in pairs)
