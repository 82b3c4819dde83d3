"""Configurable HTML validation with per-finding line numbers (O31).

The reference validates pages against a configurable ``config/tags.json``
ruleset (tag → allowed attributes) and attaches source line numbers to
each error (``htmlcheck.ValidateHtmlString`` + ``UpdateErrorLines``;
/root/reference/mainReport.go:124-127,358-360). Same shape here —
findings are (line, tag, attr, reason) — but the ruleset values are our
own (``tags_ruleset.json``, derived from the public HTML standard; the
reference's 18 KB tags.json is its author's config, not copied).

Reasons:

* ``unknown-tag``  — tag not present in the ruleset
* ``unknown-attr`` — tag known, attribute not in its allowed set nor in
  the global-attribute set (``data-*`` and event handlers pass via the
  explicit prefixes below, mirroring how such rulesets treat them)

Pure Python over the raw bytes: runs inside the report suite's single
fused page-feature UDF, so validation costs no extra Arrow pass.
"""

from __future__ import annotations

import json
import re
from functools import lru_cache
from importlib import resources

_TAG_RE = re.compile(
    r"<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)/?>"
)
# one attribute (name + optional value) — consumed SEQUENTIALLY so
# words inside quoted values are never mistaken for attribute names
_ATTR_RE = re.compile(
    r"\s*([a-zA-Z_][a-zA-Z0-9_-]*)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?"
)
_ALLOWED_PREFIXES = ("data-", "aria-")

# script/style contents and comments are NOT markup: 'if (a < b && c > 0)'
# must not scan as a tag. The spans are blanked with spaces, newlines
# kept, so every surviving match's line number is unchanged; the
# opening <script …>/<style …> tags themselves are still validated.
# the \Z alternate masks an UNCLOSED block to EOF — a page truncated
# mid-script otherwise leaks its JS ('if (a < b && c > d)') into the
# tag scanner, which reads '< b && c >' as a bogus unknown-tag finding
_RAWTEXT_RE = re.compile(
    r"(<(script|style)\b[^>]*>)(.*?)(</\2\s*>|\Z)", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)


def _blank_keep_newlines(s: str) -> str:
    return re.sub(r"[^\n]", " ", s)


def _mask_nonmarkup(raw: str) -> str:
    raw = _RAWTEXT_RE.sub(
        lambda m: m.group(1) + _blank_keep_newlines(m.group(3)) + m.group(4), raw
    )
    return _COMMENT_RE.sub(lambda m: _blank_keep_newlines(m.group(0)), raw)


def _attr_names(body: str) -> list[str]:
    out: list[str] = []
    pos = 0
    n = len(body)
    while pos < n:
        m = _ATTR_RE.match(body, pos)
        if m is None or m.end() == pos:
            pos += 1
            continue
        out.append(m.group(1).lower())
        pos = m.end()
    return out


@lru_cache(maxsize=4)
def load_ruleset(path: str | None = None) -> tuple[frozenset[str], dict[str, frozenset[str]]]:
    """(global_attrs, {tag: allowed_attrs}) from a JSON ruleset file;
    default = the packaged tags_ruleset.json."""
    if path is None:
        raw = resources.files("nightcrawlercmd_spark.functions").joinpath(
            "tags_ruleset.json"
        ).read_text()
    else:
        with open(path) as f:
            raw = f.read()
    cfg = json.loads(raw)
    glob = frozenset(a.lower() for a in cfg.get("global_attributes", []))
    tags = {
        t.lower(): frozenset(a.lower() for a in attrs)
        for t, attrs in cfg.get("tags", {}).items()
    }
    return glob, tags


def validate_html(
    raw: str, ruleset_path: str | None = None
) -> list[dict]:
    """Findings for one document: [{line, tag, attr, reason}, ...].

    Line numbers are 1-based source lines, computed the way the
    reference's UpdateErrorLines does — by position of the offending
    tag in the original text."""
    glob, tags = load_ruleset(ruleset_path)
    raw = _mask_nonmarkup(raw)
    findings: list[dict] = []
    seen: set[tuple] = set()
    # running newline counter: finditer yields matches in document
    # order, so counting from the previous match keeps the whole scan
    # O(doc_len) — the from-zero count was O(doc_len × tag_count),
    # seconds per large page inside the fused report UDF
    line = 1
    last_pos = 0
    for m in _TAG_RE.finditer(raw):
        closing = m.group(1) == "/"
        tag = m.group(2).lower()
        line += raw.count("\n", last_pos, m.start())
        last_pos = m.start()
        if tag not in tags:
            # closing forms are validated too: an unknown tag appearing
            # only as </bogus> is still a finding (a tokenizer-level
            # validator like the reference's sees EndTag tokens as well)
            key = ("unknown-tag", tag, line)
            if key not in seen:
                seen.add(key)
                findings.append(
                    {"line": line, "tag": tag, "attr": "", "reason": "unknown-tag"}
                )
            continue
        if closing:
            continue  # closing tags carry no attributes to check
        allowed = tags[tag]
        for attr in _attr_names(m.group(3)):
            if attr in allowed or attr in glob:
                continue
            if attr.startswith(_ALLOWED_PREFIXES) or attr.startswith("on"):
                continue
            key = ("unknown-attr", tag, attr, line)
            if key not in seen:
                seen.add(key)
                findings.append(
                    {"line": line, "tag": tag, "attr": attr, "reason": "unknown-attr"}
                )
    return findings
