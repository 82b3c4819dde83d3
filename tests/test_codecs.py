"""Image codec round-trips + PSNR invariant + phash (BASELINE.json input_hint)."""

import numpy as np
import pytest

from nightcrawlercmd_spark.functions import codecs_np as C
from nightcrawlercmd_spark.sources.corpus import WorldConfig, gen_image


def _rand_img(h, w, seed):
    rng = np.random.Generator(np.random.Philox(seed))
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(16, 16), (37, 53), (64, 17), (8, 8)])
def test_lossless_roundtrip(h, w):
    img = _rand_img(h, w, h * 1000 + w)
    assert (C.decode(C.encode(img, "rgb8"), "rgb8", w, h) == img).all()
    assert (C.decode(C.encode(img, "png"), "png", w, h) == img).all()


@pytest.mark.parametrize("h,w", [(16, 16), (37, 53), (64, 17)])
def test_dctq_psnr_at_least_40db(h, w):
    # worst case for a quantizer is noise — still must clear 40 dB
    img = _rand_img(h, w, h * 7 + w)
    out = C.decode(C.encode(img, "dctq"), "dctq", w, h)
    assert C.psnr(img, out) >= 40.0


def test_dctq_smooth_content_psnr():
    img, w, h, _ = gen_image(WorldConfig(), "img-cafe")
    out = C.decode(C.encode(img, "dctq"), "dctq", w, h)
    assert C.psnr(img, out) >= 40.0


def test_phash_properties():
    img, w, h, _ = gen_image(WorldConfig(), "img-beef")
    ph = C.phash64(img)
    assert -(2**63) <= ph < 2**63
    # stable under the lossy codec (perceptually identical image)
    out = C.decode(C.encode(img, "dctq"), "dctq", w, h)
    assert bin((ph ^ C.phash64(out)) & (2**64 - 1)).count("1") <= 4
    # different images ⇒ different hashes (far apart)
    img2, _, _, _ = gen_image(WorldConfig(), "img-d00d")
    dist = bin((ph ^ C.phash64(img2)) & (2**64 - 1)).count("1")
    assert dist > 8


def test_deterministic_generation():
    a = gen_image(WorldConfig(), "img-42")
    b = gen_image(WorldConfig(), "img-42")
    assert (a[0] == b[0]).all() and a[1:] == b[1:]
