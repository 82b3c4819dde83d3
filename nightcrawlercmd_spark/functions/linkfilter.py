"""Follow / don't-follow link filters (SURVEY.md O20/O40).

Reference semantics (/root/reference/mainCrawler.go:175-216):

* ``-follow``  → keep a link only if it contains ALL the given
  substrings (``containsAllText``);
* ``-dont-follow`` → drop a link if it contains ANY of the given
  substrings (``containsAnyText``);
* a link survives iff ``matchFollow && !matchDontFollow`` — which in
  the reference means a *dont-follow-only* configuration drops every
  link (matchFollow is false when no follow list is set). That reads
  like a latent bug, so it is reproduced only under ``strict=True``;
  the default treats an absent follow list as match-all, making
  dont-follow usable as a plain blacklist.
* with NO filters configured the reference hits its nil-slice ``copy``
  quirk (mainCrawler.go:198 copies into a nil slice → enqueues
  nothing); that is deliberately NOT reproduced — no filters means no
  filtering (documented delta, SURVEY.md O40).

Filters apply to the RAW href text before base-resolution, exactly
where the reference applies them (page.RespInfo.Hrefs entries).
Redirect Location targets are never filtered: they are the same
resource moved, and the reference's HTTP client follows them
transparently.

This is a pure function shared by the engine's fused fetch pass and
the sequential oracle simulator, so both worlds agree byte-for-byte.
"""

from __future__ import annotations


def href_passes(
    href: str,
    follow: list[str] | None,
    dont_follow: list[str] | None,
    strict: bool = False,
) -> bool:
    has_f = bool(follow)
    has_d = bool(dont_follow)
    if not has_f and not has_d:
        return True
    match_f = has_f and all(s in href for s in follow)
    if not has_f and not strict:
        match_f = True
    match_d = has_d and any(s in href for s in dont_follow)
    return match_f and not match_d


def filter_hrefs(
    hrefs: list[str],
    follow: list[str] | None,
    dont_follow: list[str] | None,
    strict: bool = False,
) -> list[str]:
    if not follow and not dont_follow:
        return hrefs
    return [h for h in hrefs if href_passes(h, follow, dont_follow, strict)]
