"""The report suite: one pages scan → six derived tables → CSV sinks.

Re-expresses the reference's ``report`` subcommand (mainReport.go:
354-398: loadData → pageReports → six ';'-delimited CSVs) as a single
cached DataFrame feeding six projections/aggregations:

  crawledurls — url, status, duration, redirect Location (mainReport.go:182-210)
  querykeys   — distinct URL query key → sample page (mainReport.go:355-372;
                last-writer-wins in the reference is nondeterministic →
                we pin min(url), documented delta SURVEY.md O62)
  invalidtags — per-page HTML validation findings (mainReport.go:124-127)
  wordlist    — word → count + first page (mainReport.go:261-300; first =
                min(url), delta O59)
  formtags    — form × input double explode (mainReport.go:331-353)
  allurls     — global distinct hrefs (mainReport.go:212-241)

All heavy lifting is one Python pass (``page_features_udf``) that
derives text/words/urls/ips/forms/validation from the body at once —
the reference does the same fusion row-by-row in loadPage
(mainReport.go:96-172); here it is one Arrow-batched stage and the six
reports are cheap relational projections Catalyst prunes independently.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.html import extract_forms, extract_hrefs, html_to_text
from ..operators.textops import WORD_RE

# reference caps: 100 urls, 100 IPs, 2000 words per page (mainReport.go:113-134)
CAP_URLS, CAP_IPS, CAP_WORDS = 100, 100, 2000

# the load-bearing word regex lives in textops.WORD_RE (reference
# mainWordlist.go:17) — one definition for the wordlist subcommand,
# the report suite, and the DuckDB query twins
_WORD_RE = re.compile(WORD_RE)
_URL_RE = re.compile(r"https?://[^\s\"'<>]+")
_IP_RE = re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")

FEATURES_SCHEMA = (
    "text string, words array<string>, text_urls array<string>, "
    "text_ips array<string>, query_keys array<string>, "
    "forms array<struct<action: string, method: string, inputs: array<string>>>, "
    "invalid_tags array<struct<line: int, tag: string, attr: string, reason: string>>, "
    "hrefs array<string>"
)


def _query_keys(url: str) -> list[str]:
    q = url.split("?", 1)
    if len(q) < 2 or not q[1]:
        return []
    return sorted({kv.split("=", 1)[0] for kv in q[1].split("&") if kv})


def page_features_udf(ruleset_path: str | None = None):
    from ..functions.htmlcheck import validate_html

    def fn(url: pd.Series, body: pd.Series, ctype: pd.Series) -> pd.DataFrame:
        rows = []
        for u, b, ct in zip(url, body, ctype):
            raw = (
                bytes(b).decode("utf-8", errors="replace") if b is not None else ""
            )
            ct_l = (ct or "").lower()
            is_html = ct_l.startswith("text/html")
            # html-only features mirror the reference's mime gate
            # (mainReport.go:122-141): words come from the html2text'd
            # body, validation runs on the html source; a non-html page
            # gets empty lists there but still contributes raw-body
            # URLs/IPs and its query keys below. `text` (the wordlist
            # tokenization source) is gated to text/* — a binary
            # payload replacement-decoded to mojibake must not seed
            # generated wordlists (ADVICE r3) — while the raw-body
            # URL/IP extraction below still sees every page.
            # every html-consuming helper below receives the ALREADY
            # decoded string — handing them the bytes would repeat the
            # full-body utf-8 decode up to four times per page in the
            # suite's dominant Python stage (review r4)
            text = html_to_text(raw) if is_html else (
                raw if ct_l.startswith("text/") else ""
            )
            rows.append(
                {
                    "text": text,
                    "words": _WORD_RE.findall(text)[:CAP_WORDS] if is_html else [],
                    # URLs/IPs come from the RAW body of EVERY page —
                    # the reference runs GetUrlsFromText/GetIPsFromText
                    # on page.ResponseBody before the mime check
                    # (mainReport.go:113-117), so a JSON or text/plain
                    # body's URLs count, and attribute URLs
                    # (<a href=…>, <img src=…>) count too
                    "text_urls": _URL_RE.findall(raw)[:CAP_URLS],
                    "text_ips": _IP_RE.findall(raw)[:CAP_IPS],
                    "query_keys": _query_keys(u),
                    "forms": extract_forms(raw) if is_html else [],
                    "invalid_tags": validate_html(raw, ruleset_path) if is_html else [],
                    "hrefs": extract_hrefs(raw) if is_html else [],
                }
            )
        return pd.DataFrame(rows)

    return F.pandas_udf(fn, FEATURES_SCHEMA)


def page_text_udf():
    """Lean text-only twin of ``page_features_udf`` for consumers that
    need nothing but the text column (the wordlist subcommand). Same
    MIME gate as the fused UDF: html → html_to_text, other text/* →
    replacement-decoded raw, binary → "" — but skips validation,
    forms, hrefs and the URL/IP regexes entirely."""

    def fn(body: pd.Series, ctype: pd.Series) -> pd.Series:
        out = []
        for b, ct in zip(body, ctype):
            ct_l = (ct or "").lower()
            if ct_l.startswith("text/html"):
                out.append(html_to_text(b))
            elif ct_l.startswith("text/"):
                out.append(
                    bytes(b).decode("utf-8", errors="replace")
                    if b is not None
                    else ""
                )
            else:
                out.append("")
        return pd.Series(out)

    return F.pandas_udf(fn, "string")


def page_reports(pages: DataFrame, ruleset_path: str | None = None) -> DataFrame:
    """The shared scan: EVERY fetched page + derived feature columns.
    Cache this and derive all reports from it. ``ruleset_path``
    overrides the packaged HTML validation ruleset (reference
    `-tags config/tags.json` analog).

    No page-level gate at all — the reference loops every loaded page
    (mainReport.go:96-172 has no status check, and its mime check only
    decides WHICH features a page contributes): raw-body URLs/IPs and
    query keys come from every page, while words / validation / forms /
    hrefs are html-only (the per-row gate inside the feature UDF). So a
    404 with an html body reports like any other page, and a text/plain
    or JSON body's URLs still reach the texturls report."""
    return pages.withColumn(
        "f",
        page_features_udf(ruleset_path)(
            F.col("canon_url"), F.col("body"), F.col("content_type")
        ),
    ).select("canon_url", "status_code", "resp_ms", "location", "error", "f.*")


# ---- the six reports -------------------------------------------------------

def crawledurls(pages: DataFrame) -> DataFrame:
    """All fetched URLs incl. errors/redirects (not just html 200s)."""
    return pages.select(
        F.col("canon_url").alias("url"),
        "status_code",
        F.col("resp_ms").alias("duration_ms"),
        F.coalesce("location", F.lit("")).alias("location"),
        F.coalesce("error", F.lit("")).alias("error"),
    )


def querykeys(reports: DataFrame) -> DataFrame:
    return (
        reports.select(F.explode("query_keys").alias("query_key"), "canon_url")
        .groupBy("query_key")
        .agg(F.min("canon_url").alias("sample_url"))
    )


def invalidtags(reports: DataFrame) -> DataFrame:
    """Per-page validation findings with source line numbers
    (mainReport.go:124-127 shape: reason, tag, attr, line)."""
    return reports.select(
        "canon_url", F.explode("invalid_tags").alias("f")
    ).select(
        "canon_url",
        F.col("f.line").alias("line"),
        F.col("f.tag").alias("tag"),
        F.col("f.attr").alias("attr"),
        F.col("f.reason").alias("reason"),
    )


def wordlist(reports: DataFrame) -> DataFrame:
    return (
        reports.select(F.explode("words").alias("w"), "canon_url")
        .select(F.lower("w").alias("word"), "canon_url")
        .filter(F.length(F.trim("word")) > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"), F.min("canon_url").alias("first_url"))
    )


def formtags(reports: DataFrame) -> DataFrame:
    """Double explode: page → forms → inputs (mainReport.go:331-353).
    Inner explode, not outer: the reference loops `for _, input :=
    range form.Inputs`, so a form with zero inputs writes no row."""
    forms = reports.select(
        "canon_url", F.posexplode("forms").alias("form_idx", "form")
    )
    return forms.select(
        "canon_url",
        "form_idx",
        F.col("form.action").alias("action"),
        F.col("form.method").alias("method"),
        F.explode("form.inputs").alias("input_name"),
    )


def allurls(reports: DataFrame) -> DataFrame:
    """Global distinct hrefs across every page (O60)."""
    return (
        reports.select(F.explode("hrefs").alias("url"))
        .filter(F.length(F.trim("url")) > 0)
        .distinct()
    )


def run_report_suite(
    pages: DataFrame,
    out_dir: str | None = None,
    ruleset_path: str | None = None,
    include_wordlist: bool = True,
) -> dict[str, DataFrame]:
    """One scan, six outputs (optionally written as ';'-CSV like the
    reference, O8). Returns the DataFrames keyed by report name.
    ``ruleset_path`` is the reference ``-tagsfile`` (custom HTML
    validation ruleset); ``include_wordlist=False`` mirrors the
    reference CLI's default, where wordlist.csv only exists under
    ``-wordlist`` (mainReport.go:58,262)."""
    reports = page_reports(pages, ruleset_path=ruleset_path).persist()
    out = {
        "crawledurls": crawledurls(pages),
        "querykeys": querykeys(reports),
        "invalidtags": invalidtags(reports),
        "formtags": formtags(reports),
        "allurls": allurls(reports),
    }
    if include_wordlist:
        out["wordlist"] = wordlist(reports)
    if out_dir:
        for name, df in out.items():
            (
                df.coalesce(1)
                .write.mode("overwrite")
                .option("sep", ";")
                .option("header", True)
                .csv(f"{out_dir}/{name}")
            )
        # writes materialized everything — release the cache instead of
        # leaking one cached feature table per suite run
        reports.unpersist()
    # without out_dir the returned DataFrames still hang off the cache:
    # the caller owns the lifetime (unpersist via out["querykeys"]'s
    # lineage or a fresh page_reports)
    return out


# ---- wordlist-subcommand analog (mainWordlist.go) --------------------------

def wordlist_pipeline(
    pages: DataFrame,
    extractors: tuple[str, ...] = ("word", "url"),
    mutator: str | None = None,
) -> DataFrame:
    """The `wordlist` subcommand: run the selected extractors over the
    page text, lower+trim each token, distinct-union, lexicographic
    sort (mainWordlist.go:78-103,155-224). The reference's `-extractor`
    switch selects ONE mode per run; passing several here unions them
    (each mode is the reference-faithful extraction, O25-O28).

    ``mutator="username"`` replaces the extracted tokens with their
    username permutations before the final distinct, exactly where the
    reference's ``permute`` sits between ``findAllWords`` and the
    template loop (mainWordlist.go:78,105-123) — the original token
    survives only as its own ""-join variant."""
    from ..operators.textops import extract_tokens, username_mutations

    if not extractors:
        raise ValueError("extractors must name at least one mode")
    # text-only scan: the wordlist subcommand consumes ONLY the text
    # column, and Catalyst cannot prune inside a struct-returning
    # pandas UDF — going through page_reports would execute HTML
    # validation, form and href extraction per page just to throw the
    # results away (review r4)
    texts = pages.select(
        page_text_udf()(F.col("body"), F.col("content_type")).alias("text")
    )
    # ONE scan for all modes: per-extractor union branches would
    # physically re-run the text UDF over every page per extractor
    # (Catalyst does not dedupe identical union branches); concat the
    # token arrays in a single projection and explode once instead —
    # same bag union, the final distinct makes them identical (review r4)
    arrs = [extract_tokens(F.col("text"), ex) for ex in extractors]
    out = texts.select(
        F.explode(arrs[0] if len(arrs) == 1 else F.concat(*arrs)).alias("token")
    )
    # one normalization, reference-positioned BEFORE permute
    # (findAllWords lowers+trims each word, mainWordlist.go:165-167);
    # mutations of lowered/trimmed input need no second pass
    out = out.select(F.lower(F.trim("token")).alias("token"))
    if mutator == "username":
        out = out.select(
            F.explode(username_mutations(F.col("token"))).alias("token")
        )
    elif mutator is not None:
        raise ValueError(f"unknown mutator {mutator!r}; one of ('username',)")
    return (
        out.filter(F.length("token") > 0)
        .distinct()
        .orderBy("token")
    )
