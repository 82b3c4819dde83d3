"""Deterministic synthetic crawl world (seed list, robots, link graph, images).

Mirrors the reference's input surface — a seed URL wordlist
(reference: wordlist/urls_small.txt via crawlbase.ReadWordlist,
mainCrawler.go:117-140) plus an HTTP universe to crawl — as a pure
function of a config, so the Spark engine's mapInPandas fetcher and
the sequential pure-Python oracle regenerate the exact same world
(no network, no wall clock; SURVEY.md §7.1.1, O79).

The world:
* ``n_hosts`` hosts; host 0 is deliberately hot (``hot_factor``× pages
  and ~half the seed list) to exercise skew handling.
* page URLs ``http://{host}/p/{j}``; ``/private/...`` paths are
  robots-disallowed; unknown paths 404; some pages 301-redirect.
* each 200 page embeds hrefs (with dirty variants, duplicates, empty
  and junk links to exercise the canonicalizer + filters) and one
  image reference whose pixels/caption are deterministic too.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import pandas as pd

from ..functions.codecs_np import FORMATS, encode, phash64
from ..functions.determinism import h64, hchoice, hfloat, hint

_VOCAB = (
    "amber basalt cedar dune ember fjord garnet harbor iris juniper kelp "
    "lagoon maple nectar onyx prairie quartz reef sable tundra umber vale "
    "willow xenon yarrow zephyr"
).split()


@dataclass(frozen=True)
class WorldConfig:
    n_hosts: int = 10
    base_pages: int = 40
    hot_factor: int = 8
    links_lo: int = 3
    links_hi: int = 10
    budget_lo: int = 2
    budget_hi: int = 6
    seeds_lo: int = 2
    seeds_hi: int = 4
    img_lo: int = 16  # image payload dimension range (px)
    img_hi: int = 64
    out_of_scope_hosts: int = 2  # extra hosts that appear in links but not seeds
    # link-mix thresholds (cumulative probabilities): same-host page,
    # cross-host in-scope, out-of-scope host, robots-disallowed, junk.
    # Defaults keep every existing world byte-identical; a host-local
    # world (p_same == p_cross) isolates O(delta) pending maintenance.
    p_same: float = 0.76
    p_cross: float = 0.88
    p_offsite: float = 0.92
    p_robots: float = 0.96
    tag: str = "w1"  # world salt — change to get a different universe


@lru_cache(maxsize=32)
def hosts(cfg: WorldConfig) -> list[str]:
    return [f"host{i:02d}.{cfg.tag}.test" for i in range(cfg.n_hosts)]


@lru_cache(maxsize=32)
def out_of_scope(cfg: WorldConfig) -> list[str]:
    return [f"offsite{i:02d}.{cfg.tag}.test" for i in range(cfg.out_of_scope_hosts)]


@lru_cache(maxsize=32)
def _known_hosts(cfg: WorldConfig) -> frozenset[str]:
    return frozenset(hosts(cfg)) | frozenset(out_of_scope(cfg))


@lru_cache(maxsize=32)
def _image_ids(cfg: WorldConfig) -> frozenset[str]:
    """Every image id the world's pages can reference — the validity
    set for the /img payload route (unknown ids 404). Cached per
    config: O(pages) once per executor, not per fetch."""
    return frozenset(image_id_of(cfg, u) for u in all_page_urls(cfg))


@lru_cache(maxsize=1 << 15)
def n_pages(cfg: WorldConfig, host: str) -> int:
    """Cached: the fetch hot loop derives a link target's page count per
    extracted href (~7/page) and the seeder per seed — all repeats of
    the same ≤ n_hosts keys, each otherwise a fresh blake2b."""
    if host.startswith("host00."):
        return cfg.base_pages * cfg.hot_factor
    return cfg.base_pages + h64(cfg.tag, host, "np") % cfg.base_pages


def page_url(host: str, j: int) -> str:
    return f"http://{host}/p/{j}"


def crawl_budget(cfg: WorldConfig, host: str) -> int:
    """Per-host max URLs per round (politeness analog of `-wait 500`,
    reference mainCrawler.go:45,81 — rate becomes budget/round)."""
    return hint(cfg.budget_lo, cfg.budget_hi, cfg.tag, host, "budget")


def priority_of(canon_url: str, depth: int) -> float:
    """Deterministic dequeue priority: STRICTLY shallower-first, hash
    tie-spread. The tie bonus is scaled to <100% of the gap to the next
    depth band, 1/((1+d)(2+d)), so a bonus can never lift a deeper URL
    above a shallower one at ANY depth (a flat 1e-3 bonus would cross
    the band gap from depth 31 on). Shared verbatim by the engine,
    fetch stage, and the sequential simulator — ordering parity holds
    by construction."""
    gap = 1.0 / ((1.0 + depth) * (2.0 + depth))
    bonus = (h64(canon_url, "prio") % 1000) * 0.000999 * gap
    return round(1.0 / (1.0 + depth) + bonus, 12)


# ------------------------------------------------------------- robots -----

def robots_rows(cfg: WorldConfig) -> list[dict]:
    return [
        {
            "host": hst,
            "disallow_prefixes": ["/private", "/admin"],
            "crawl_budget": crawl_budget(cfg, hst),
        }
        for hst in hosts(cfg)
    ]


# -------------------------------------------------------------- seeds -----

def host_seed_urls(cfg: WorldConfig, hst: str, is_hot: bool, n_hosts: int) -> list[str]:
    """Seed URLs of ONE host (dirty variants included) — the per-host
    unit shared by the sequential ``seed_rows`` and the engine's
    distributed seed generation, so both produce the identical multiset
    by construction."""
    rows: list[str] = []
    cnt = hint(cfg.seeds_lo, cfg.seeds_hi, cfg.tag, hst, "ns")
    if is_hot:
        cnt = max(2 * cnt, n_hosts)  # hot host overrepresented
    np_h = n_pages(cfg, hst)
    for k in range(cnt):
        j = hint(0, np_h - 1, cfg.tag, hst, "seed", k)
        style = h64(cfg.tag, hst, "seedstyle", k) % 5
        if style == 0:
            rows.append(f"http://{hst.upper()}/p/{j}")
        elif style == 1:
            rows.append(f"http://{hst}:80/p/{j}")
        elif style == 2:
            rows.append(f"http://{hst}/a/../p/{j}#frag")
        elif style == 3:
            rows.append(f"http://{hst}/p/{j}?b=2&a=1")
        else:
            rows.append(page_url(hst, j))
    return rows


def seed_rows(cfg: WorldConfig) -> list[dict]:
    """Seed URL list with dirty variants; hot host ≈ half the seeds."""
    hs = hosts(cfg)
    return [
        {"url": u}
        for hst in hs
        for u in host_seed_urls(cfg, hst, hst == hs[0], len(hs))
    ]


# -------------------------------------------------------------- pages -----

def _caption(cfg: WorldConfig, canon_url: str) -> str:
    n = hint(4, 9, cfg.tag, canon_url, "capn")
    return " ".join(hchoice(_VOCAB, cfg.tag, canon_url, "capw", i) for i in range(n))


def image_id_of(cfg: WorldConfig, canon_url: str) -> str:
    return f"img-{h64(cfg.tag, canon_url, 'img'):016x}"


def _href(cfg: WorldConfig, canon_url: str, host: str, i: int) -> str:
    """One outgoing link of a page — dirty on purpose."""
    r = hfloat(cfg.tag, canon_url, "lt", i)
    if r < cfg.p_same:  # same-host page, dirty textual variant
        j = hint(0, n_pages(cfg, host) - 1, cfg.tag, canon_url, "tgt", i)
        v = h64(cfg.tag, canon_url, "var", i) % 5
        if v == 0:
            return f"/p/{j}"
        if v == 1:
            return f"http://{host.upper()}/p/{j}"
        if v == 2:
            return f"http://{host}:80/p/{j}#sec{i}"
        if v == 3:
            return f"/x/../p/{j}"
        return page_url(host, j)
    if r < cfg.p_cross:  # cross-host (in scope)
        tgt = hchoice(hosts(cfg), cfg.tag, canon_url, "xh", i)
        j = hint(0, n_pages(cfg, tgt) - 1, cfg.tag, canon_url, "xj", i)
        return page_url(tgt, j)
    if r < cfg.p_offsite:  # out-of-scope host (scope filter food)
        tgt = hchoice(out_of_scope(cfg), cfg.tag, canon_url, "oh", i)
        return f"http://{tgt}/p/0"
    if r < cfg.p_robots:  # robots-disallowed path
        return f"/private/{hint(0, 20, cfg.tag, canon_url, 'pv', i)}"
    junk = ["", "#", "mailto:x@y.z", "javascript:void(0)"]
    return junk[h64(cfg.tag, canon_url, "junk", i) % len(junk)]


def fetch_one(cfg: WorldConfig, canon_url: str) -> dict:
    """The deterministic 'HTTP GET' (stand-in for reference O6
    http.DefaultClient.Do, mainHttpScan.go:178-204 — sandbox is
    offline, so responses are a pure function of the URL)."""
    resp_ms = hint(5, 250, cfg.tag, canon_url, "ms")
    rest = canon_url.split("://", 1)[1]
    host, _, pathq = rest.partition("/")
    host = host.rsplit(":", 1)[0] if ":" in host else host
    path = "/" + pathq.split("?", 1)[0]
    base = {
        "canon_url": canon_url,
        "status_code": 404,
        "location": None,
        "content_type": "text/html; charset=utf-8",
        "body": b"<html><body>not found</body></html>",
        "image_id": None,
        "caption": None,
        "resp_ms": resp_ms,
        "error": None,
    }
    if host not in _known_hosts(cfg):
        base["status_code"] = 0
        base["error"] = "dns: no such host"
        base["body"] = b""
        return base
    # image payload route: pages embed <img src="/img/{id}.png">, and
    # load_resources crawls enqueue those URLs — the synthetic GET must
    # answer them exactly like WorldHTTPServer does (a 404 here with a
    # 200 from the real server broke real-vs-synthetic crawl parity).
    # Unknown ids 404 like any unknown path.
    if path.startswith("/img/") and path.endswith(".png"):
        image_id = path[len("/img/"):-len(".png")]
        if image_id in _image_ids(cfg):
            img, _, _, fmt = gen_image(cfg, image_id)
            base["status_code"] = 200
            base["content_type"] = "application/octet-stream"
            base["body"] = encode(img, fmt)
        return base
    j = None
    if path == "/":
        j = 0
    elif path.startswith("/p/"):
        tail = path[3:]
        if tail.isdigit() and int(tail) < n_pages(cfg, host):
            j = int(tail)
    elif path.startswith("/private/"):
        j = -1  # exists but should never be fetched when robots honored
    if j is None:
        return base
    if j >= 1 and h64(cfg.tag, host, j, "redir") % 12 == 0:
        base["status_code"] = 301
        base["location"] = page_url(host, j - 1)
        base["body"] = b""
        return base
    # image + caption are keyed by the page identity (host, j): URL
    # variants of the same page (query strings) serve the same payload,
    # so every fetched image_id exists in the enumerated images table
    pkey = page_url(host, max(j, 0))
    caption = _caption(cfg, pkey)
    img_id = image_id_of(cfg, pkey)
    nlinks = hint(cfg.links_lo, cfg.links_hi, cfg.tag, canon_url, "nl")
    links = [_href(cfg, canon_url, host, i) for i in range(nlinks)]
    if links:
        links.append(links[0])  # guaranteed duplicate href (exercises O61)
    anchors = "\n".join(f'<a href="{u}">link {i}</a>' for i, u in enumerate(links))
    form = ""
    if h64(cfg.tag, canon_url, "hasform") % 3 == 0:  # ~1/3 of pages carry a form
        inputs = "".join(
            f'<input name="{hchoice(_VOCAB, cfg.tag, canon_url, "inp", i)}{i}">'
            for i in range(hint(1, 3, cfg.tag, canon_url, "ninp"))
        )
        form = f'<form action="/search" method="get">{inputs}</form>\n'
    body = (
        f"<html><head><title>{host} {j}</title></head><body>\n"
        f"<p>{caption}</p>\n{anchors}\n{form}"
        f'<img src="/img/{img_id}.png" alt="{caption}">\n'
        f"</body></html>"
    ).encode()
    base.update(status_code=200, body=body, image_id=img_id, caption=caption)
    return base


# -------------------------------------------------------------- images ----

@lru_cache(maxsize=4096)
def _gradient_base(w: int, h: int) -> np.ndarray:
    """Cached per-(w,h) gradient (hot: regenerated per image otherwise)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)


def gen_image(cfg: WorldConfig, image_id: str) -> tuple[np.ndarray, int, int, str]:
    """Deterministic pixels for an image id: gradient + hash noise."""
    w = hint(cfg.img_lo, cfg.img_hi, cfg.tag, image_id, "w")
    h = hint(cfg.img_lo, cfg.img_hi, cfg.tag, image_id, "h")
    fmt = hchoice(FORMATS, cfg.tag, image_id, "fmt")
    seed = h64(cfg.tag, image_id, "px") % (2**32)
    rng = np.random.Generator(np.random.Philox(seed))  # seeded → deterministic
    noise = rng.integers(-12, 13, size=(h, w, 3), dtype=np.int16)
    img = np.clip(_gradient_base(w, h) + noise, 0, 255).astype(np.uint8)
    return img, w, h, fmt


def images_pdf(cfg: WorldConfig, canon_urls: list[str]) -> pd.DataFrame:
    """images(image_id, bytes, w, h, fmt, caption, phash) for the given
    pages — the authoritative payload schema (BASELINE.json input_hint)."""
    rows = []
    seen: set[str] = set()
    for cu in canon_urls:
        img_id = image_id_of(cfg, cu)
        if img_id in seen:
            continue
        seen.add(img_id)
        img, w, h, fmt = gen_image(cfg, img_id)
        rows.append(
            {
                "image_id": img_id,
                "bytes": encode(img, fmt),
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                "caption": _caption(cfg, cu),
                "phash": np.int64(phash64(img)),
            }
        )
    return pd.DataFrame(rows)


def all_page_urls(cfg: WorldConfig) -> list[str]:
    return [page_url(hst, j) for hst in hosts(cfg) for j in range(n_pages(cfg, hst))]


# ------------------------------------------------- video / audio payloads --

def gen_video(cfg: WorldConfig, video_id: str) -> tuple[bytes, int, int, int, int]:
    """Deterministic 'video': n_frames rgb8 frames concatenated — the
    base image translated one pixel per frame (so frame k is
    recomputable independently). Returns (bytes, w, h, n_frames, fps)."""
    w = hint(16, 32, cfg.tag, video_id, "vw")
    h = hint(16, 32, cfg.tag, video_id, "vh")
    n_frames = hint(8, 24, cfg.tag, video_id, "vn")
    fps = hchoice([10, 15, 30], cfg.tag, video_id, "vfps")
    # every frame is np.roll of the same base — compute the base once
    # instead of re-deriving RNG noise per frame (gen_video_frame stays
    # the independent per-frame oracle; byte-identical by construction)
    base = gen_video_frame(cfg, video_id, 0, w, h)
    return (
        b"".join(np.roll(base, shift=k, axis=1).tobytes() for k in range(n_frames)),
        w, h, n_frames, fps,
    )


def gen_video_frame(
    cfg: WorldConfig, video_id: str, k: int, w: int, h: int
) -> np.ndarray:
    """Frame k of a video, independently recomputable (test oracle)."""
    seed = h64(cfg.tag, video_id, "vpx") % (2**32)
    rng = np.random.Generator(np.random.Philox(seed))
    noise = rng.integers(-12, 13, size=(h, w, 3), dtype=np.int16)
    base = np.clip(_gradient_base(w, h) + noise, 0, 255).astype(np.uint8)
    return np.roll(base, shift=k, axis=1)  # 1 px/frame horizontal pan


def videos_pdf(cfg: WorldConfig, n: int) -> pd.DataFrame:
    """videos(video_id, bytes, w, h, n_frames, fps) — opaque binary +
    typed metadata, the multimodal-column shape (BASELINE input_hint
    style)."""
    rows = []
    for i in range(n):
        vid = f"vid-{h64(cfg.tag, 'video', i):016x}"
        blob, w, h, nf, fps = gen_video(cfg, vid)
        rows.append(
            {"video_id": vid, "bytes": blob, "w": np.int32(w), "h": np.int32(h),
             "n_frames": np.int32(nf), "fps": np.int32(fps)}
        )
    return pd.DataFrame(rows)


def gen_audio(cfg: WorldConfig, audio_id: str) -> tuple[bytes, int]:
    """Deterministic pcm16le mono clip: two sines + hash noise.
    Returns (bytes, sample_rate)."""
    sr = hchoice([8000, 16000], cfg.tag, audio_id, "asr")
    n = hint(sr // 4, sr, cfg.tag, audio_id, "an")  # 0.25-1.0 s
    f1 = hint(100, 800, cfg.tag, audio_id, "af1")
    f2 = hint(900, 3000, cfg.tag, audio_id, "af2")
    t = np.arange(n, dtype=np.float64) / sr
    seed = h64(cfg.tag, audio_id, "apx") % (2**32)
    rng = np.random.Generator(np.random.Philox(seed))
    sig = (
        0.5 * np.sin(2 * np.pi * f1 * t)
        + 0.25 * np.sin(2 * np.pi * f2 * t)
        + 0.05 * rng.standard_normal(n)
    )
    pcm = np.clip(np.round(sig * 0.8 * 32767), -32768, 32767).astype("<i2")
    return pcm.tobytes(), sr


def audios_pdf(cfg: WorldConfig, n: int) -> pd.DataFrame:
    """audio(audio_id, bytes, sr) — opaque pcm16 binary + metadata."""
    rows = []
    for i in range(n):
        aid = f"aud-{h64(cfg.tag, 'audio', i):016x}"
        blob, sr = gen_audio(cfg, aid)
        rows.append({"audio_id": aid, "bytes": blob, "sr": np.int32(sr)})
    return pd.DataFrame(rows)
