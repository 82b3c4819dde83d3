"""Driver-contract queries: Spark DataFrame pipelines + DuckDB oracle SQL.

Each entry re-expresses a SURVEY.md §2 operator (or a training-data
pipeline operator) over the driver's testdata tables. The Spark side is
idiomatic DataFrame code (built-ins, broadcast dims, window ranks); the
oracle side is ANSI SQL the driver runs in DuckDB on the same parquet.
Column names/aliases match exactly — the driver hashes values after
sorting columns by name.

Floating-point policy: sums/averages that cross engines go through
exact decimal aggregation (or fold-ordered list arithmetic) and are
rounded to 6 dp before comparison; md5-prefix integers are the shared
deterministic hash.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import round6
from ..operators import annsearch as ANN
from ..operators import graphs as G
from ..operators import textops as T
from ..operators import multimodal as MM
from ..operators import timeseries as TS

WORD_RE = T.WORD_RE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# Report-suite operators (reference report/wordlist pipelines, §3.2)
# =====================================================================

def q_report_wordlist(spark, sf):
    """O59+O25+O32+O44: word dictionary — count + deterministic first doc
    (reference mainReport.go:266-281; min() replaces Go-map
    nondeterminism, documented delta SURVEY.md O59)."""
    docs = _t(spark, sf, "documents")
    return (
        docs.select(F.explode(T.words(F.col("text"))).alias("w"), "doc_id")
        .select(F.lower("w").alias("word"), "doc_id")
        .filter(F.length(F.trim("word")) > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("first_doc"))
    )


SQL_REPORT_WORDLIST = f"""
SELECT lower(w) AS word, count(*) AS cnt, min(doc_id) AS first_doc
FROM (SELECT unnest(regexp_extract_all(text, '{WORD_RE}')) AS w, doc_id FROM documents)
WHERE length(trim(w)) > 0
GROUP BY lower(w)
"""


def q_wordlist_mutator(spark, sf):
    """Wordlist `-mutator username` (VERDICT r3 item 4; reference
    mainWordlist.go:105-152): lines = the first-3-word prefix of each
    document (multi-word lines exercise the abbreviation forms), each
    permuted into sep-joins + first-initial/dropped-word variants, then
    the reference's final wordlist shape — distinct lower/trimmed,
    sorted (createWordList, mainWordlist.go:78-103)."""
    docs = _t(spark, sf, "documents")
    line = F.array_join(F.slice(T.words(F.lower(F.col("text"))), 1, 3), " ")
    return (
        docs.select(line.alias("line"))
        .select(F.explode(T.username_mutations(F.col("line"))).alias("u"))
        .select(F.lower(F.trim("u")).alias("username"))
        .filter(F.length("username") > 0)
        .distinct()
        .orderBy("username")
    )


SQL_WORDLIST_MUTATOR = f"""
WITH lines AS (
  SELECT array_to_string(
           list_slice(regexp_extract_all(lower(text), '{WORD_RE}'), 1, 3), ' '
         ) AS line
  FROM documents
), wds AS (
  SELECT regexp_extract_all(line, '\\w+') AS w FROM lines
), multi AS (
  -- array_to_string([]) is NULL in DuckDB, so the boundary slices
  -- (i = 1 or i = n) must coalesce to '' or the concat nulls out
  SELECT coalesce(array_to_string(w[1:i-1], ''), '') AS prev,
         substr(w[i], 1, 1) AS initial,
         coalesce(array_to_string(w[i+1:len(w)], ''), '') AS rest
  FROM (SELECT w, unnest(generate_series(1, len(w))) AS i
        FROM wds WHERE len(w) >= 2)
), variants AS (
  SELECT array_to_string(w, '') AS u FROM wds
  UNION ALL SELECT array_to_string(w, '_') FROM wds
  UNION ALL SELECT array_to_string(w, '.') FROM wds
  UNION ALL SELECT array_to_string(w, '-') FROM wds
  UNION ALL SELECT prev || initial || rest FROM multi
  UNION ALL SELECT prev || rest FROM multi
)
SELECT DISTINCT lower(trim(u)) AS username
FROM variants
WHERE length(lower(trim(u))) > 0
ORDER BY username
"""


def q_wordlist_showfile(spark, sf):
    """Wordlist `-show-file-name` (reference mainWordlist.go:44,
    165-172): every extracted word keyed as ``word [file]`` before the
    global dedupe — the same word in two files stays two entries —
    then the reference's final wordlist normalize (lower+trim+distinct,
    sorted; createWordList mainWordlist.go:78-103). `source` is the
    file-path analog of the documents table."""
    docs = _t(spark, sf, "documents")
    return (
        docs.select(F.explode(T.words(F.col("text"))).alias("w"), "source")
        .select(
            F.lower(
                F.trim(T.tag_with_file(F.col("w"), F.col("source")))
            ).alias("entry")
        )
        .distinct()
        .orderBy("entry")
    )


SQL_WORDLIST_SHOWFILE = f"""
SELECT DISTINCT lower(trim(lower(trim(w)) || ' [' || source || ']')) AS entry
FROM (SELECT unnest(regexp_extract_all(text, '{WORD_RE}')) AS w, source
      FROM documents)
ORDER BY entry
"""


def q_wordlist_full(spark, sf):
    """The wordlist subcommand composed END-TO-END (createWordList,
    mainWordlist.go:62-103): word extractor → `word [file]` tagging →
    username mutator → two templates → final lower/trim/distinct/sort,
    including the reference quirk that the mutator runs on the TAGGED
    keys (the file tag is torn into \\w+ runs and joined into the
    variants). `source` is the file-path analog."""
    docs = _t(spark, sf, "documents")
    return T.create_wordlist(
        docs,
        extractor="word",
        file_col="source",
        mutator="username",
        templates=["<word>", "adm-<word>-x"],
    )


SQL_WORDLIST_FULL = f"""
WITH toks AS (
  SELECT DISTINCT lower(trim(w)) || ' [' || source || ']' AS k
  FROM (SELECT unnest(regexp_extract_all(text, '{WORD_RE}')) AS w, source
        FROM documents)
), wds AS (
  SELECT regexp_extract_all(k, '\\w+') AS w FROM toks
), multi AS (
  SELECT coalesce(array_to_string(w[1:i-1], ''), '') AS prev,
         substr(w[i], 1, 1) AS initial,
         coalesce(array_to_string(w[i+1:len(w)], ''), '') AS rest
  FROM (SELECT w, unnest(generate_series(1, len(w))) AS i
        FROM wds WHERE len(w) >= 2)
), variants AS (
  SELECT array_to_string(w, '') AS u FROM wds
  UNION ALL SELECT array_to_string(w, '_') FROM wds
  UNION ALL SELECT array_to_string(w, '.') FROM wds
  UNION ALL SELECT array_to_string(w, '-') FROM wds
  UNION ALL SELECT prev || initial || rest FROM multi
  UNION ALL SELECT prev || rest FROM multi
), vk AS (SELECT DISTINCT u FROM variants),
tpl AS (SELECT unnest(['<word>', 'adm-<word>-x']) AS t)
SELECT DISTINCT entry FROM (
  -- FIRST-occurrence substitution, like the engine's _replace_first
  -- (strings.Replace count 1): a second '<word>' marker must stay
  -- literal; DuckDB's replace() rewrites every occurrence
  SELECT lower(trim(
    CASE WHEN strpos(t, '<word>') > 0
         THEN substr(t, 1, strpos(t, '<word>') - 1) || u
              || substr(t, strpos(t, '<word>') + 6)
         ELSE t END)) AS entry
  FROM vk CROSS JOIN tpl
) WHERE length(entry) > 0
ORDER BY entry
"""


def q_report_query_keys(spark, sf):
    """O17/O62: query-key style extraction from events.props JSON —
    distinct key values + count + deterministic sample event."""
    ev = _t(spark, sf, "events")
    return (
        ev.select(
            F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k"),
            "event_id",
        )
        .groupBy("k")
        .agg(F.count("*").alias("cnt"), F.min("event_id").alias("sample_event"))
    )


SQL_REPORT_QUERY_KEYS = """
SELECT cast(regexp_extract(props, '"k": (\\d+)', 1) AS int) AS k,
       count(*) AS cnt, min(event_id) AS sample_event
FROM events GROUP BY 1
"""


def q_sort_wordlist_topk(spark, sf):
    """O63+O66+O67: distinct-union + lexicographic sort + cap
    (reference mainWordlist.go:92-103)."""
    docs = _t(spark, sf, "documents")
    return (
        docs.select(F.explode(T.words(F.lower(F.col("text")))).alias("word"))
        .distinct()
        .orderBy("word")
        .limit(100)
    )


SQL_SORT_WORDLIST_TOPK = f"""
SELECT DISTINCT unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
FROM documents ORDER BY word LIMIT 100
"""


def q_slice_cap(spark, sf):
    """O67: per-row extraction cap *before* explode (the reference caps
    at 100 urls/ips per page, mainReport.go:113-115 — early limit)."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            F.slice(F.regexp_extract_all("text", F.lit(WORD_RE), F.lit(0)), 1, 5)
        ).alias("word"),
    )


SQL_SLICE_CAP = f"""
SELECT doc_id, unnest((regexp_extract_all(text, '{WORD_RE}'))[1:5]) AS word
FROM documents
"""


def q_union_extractors(spark, sf):
    """O70: union of two extractor outputs, deduped (reference
    mainWordlist.go:196-207 rel∪abs urls)."""
    docs = _t(spark, sf, "documents")
    a = docs.filter(F.col("source") == "src0").select(
        F.explode(T.words(F.lower(F.col("text")))).alias("word")
    )
    b = docs.filter(F.col("source") == "src1").select(
        F.explode(T.words(F.lower(F.col("text")))).alias("word")
    )
    return a.union(b).distinct()


SQL_UNION_EXTRACTORS = f"""
SELECT DISTINCT word FROM (
  SELECT unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
  FROM documents WHERE source = 'src0'
  UNION ALL
  SELECT unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
  FROM documents WHERE source = 'src1'
)
"""


_SYN_TEXT_SPARK = lambda: F.concat(  # noqa: E731 — shared derivation, see SQL twin
    F.col("text"),
    F.lit(" contact "),
    F.col("source"),
    F.lit('@müller-example.test see "'),
    F.col("source"),
    F.lit(' notes" at http://ex.test/'),
    F.col("source"),
    F.lit(" or rel/path/"),
    F.col("source"),
    F.lit("-item"),
)

_SYN_TEXT_SQL = (
    "text || ' contact ' || source || '@müller-example.test see \"' || source"
    " || ' notes\" at http://ex.test/' || source || ' or rel/path/' || source || '-item'"
)


def q_wordlist_extractors(spark, sf):
    """O25-O28: the reference wordlist subcommand's four extractor modes
    (word / url / email incl. umlauts / quoted-string) over one text,
    each lower+trim+distinct (mainWordlist.go:18-22,155-224). Emails,
    quotes and URLs are synthesized onto the document text from its own
    columns — identically on both engines — so the extraction regexes
    themselves are the unit under oracle test."""
    docs = _t(spark, sf, "documents").select(_SYN_TEXT_SPARK().alias("t"))
    parts = []
    for ex in ("word", "url", "email", "string"):
        parts.append(
            docs.select(F.explode(T.extract_tokens(F.col("t"), ex)).alias("tok"))
            .select(F.lit(ex).alias("extractor"), F.lower(F.trim("tok")).alias("token"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.filter(F.length("token") > 0).distinct()


def _sql_wordlist_extractors() -> str:
    def q(s: str) -> str:
        return s.replace("'", "''")

    modes = {
        "word": [(T.WORD_RE, 0)],
        "url": [(T.URL_REL_RE, 0), (T.URL_ABS_RE, 0)],
        "email": [(T.EMAIL_RE, 0)],
        "string": [(T.QUOTED_RE, 1), (T.SQUOTED_RE, 1)],
    }
    selects = []
    for ex, regexes in modes.items():
        for re_, grp in regexes:
            selects.append(
                f"SELECT '{ex}' AS extractor, lower(trim(tok)) AS token FROM "
                f"(SELECT unnest(regexp_extract_all(t, '{q(re_)}', {grp})) AS tok FROM syn)"
            )
    body = "\n  UNION ALL\n  ".join(selects)
    return f"""
WITH syn AS (SELECT {_SYN_TEXT_SQL} AS t FROM documents)
SELECT DISTINCT extractor, token FROM (
  {body}
) WHERE length(token) > 0
"""


SQL_WORDLIST_EXTRACTORS = _sql_wordlist_extractors()


def q_anti_join_resume(spark, sf):
    """O46/O52/O72: resume anti-join — drop keys already in the
    'history' set (reference mainDNS.go:108-119)."""
    orders = _t(spark, sf, "orders")
    seen = _t(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").alias("k"))
    return orders.join(
        seen, orders["o_custkey"] == seen["k"], "left_anti"
    ).select("o_orderkey", "o_custkey")


SQL_ANTI_JOIN_RESUME = """
SELECT o_orderkey, o_custkey FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey)
"""


def q_cross_join_templates(spark, sf):
    """O53+O33: template × word cross join with <word> substitution
    (reference mainWordlist.go:69-87); small side broadcast."""
    region = _t(spark, sf, "region").select(
        F.concat(F.lit("probe-<word>-"), F.col("r_name")).alias("template")
    )
    words = _t(spark, sf, "nation").select(F.lower("n_name").alias("word")).distinct()
    return region.crossJoin(F.broadcast(words)).select(
        F.replace(F.col("template"), F.lit("<word>"), F.col("word")).alias("candidate")
    )


SQL_CROSS_JOIN_TEMPLATES = """
SELECT replace(template, '<word>', word) AS candidate
FROM (SELECT 'probe-<word>-' || r_name AS template FROM region)
CROSS JOIN (SELECT DISTINCT lower(n_name) AS word FROM nation)
"""


def q_filtered_enqueue(spark, sf):
    """O20/O40: follow/dont-follow substring filters on candidate URLs
    (reference containsAllText/containsAnyText, mainCrawler.go:175-216):
    keep iff (contains ALL follow substrings) AND NOT (contains ANY
    dont-follow substring). URLs synthesized from orders columns so the
    filter predicate itself is the unit under oracle test."""
    orders = _t(spark, sf, "orders")
    url = F.concat(
        F.lit("http://h"),
        (F.col("o_custkey") % 10).cast("string"),
        F.lit(".test/p/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?pr="),
        F.lower("o_orderpriority"),
    )
    follow = [".test/p/", "pr="]  # contains-ALL
    dont = ["urgent", "2-high"]  # contains-ANY
    keep = None
    for s in follow:
        c = F.contains(url, F.lit(s))
        keep = c if keep is None else (keep & c)
    drop = None
    for s in dont:
        c = F.contains(url, F.lit(s))
        drop = c if drop is None else (drop | c)
    return orders.select(url.alias("url")).filter(keep & ~drop)


SQL_FILTERED_ENQUEUE = """
WITH cand AS (
  SELECT 'http://h' || cast(o_custkey % 10 as varchar) || '.test/p/'
         || cast(o_orderkey as varchar) || '?pr=' || lower(o_orderpriority) AS url
  FROM orders)
SELECT url FROM cand
WHERE contains(url, '.test/p/') AND contains(url, 'pr=')
  AND NOT (contains(url, 'urgent') OR contains(url, '2-high'))
"""


def q_window_dequeue(spark, sf):
    """O69: the politeness dequeue shape — top-3 per partition key by
    (priority desc, tiebreak asc) window rank."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "value", "rk")
    )


SQL_WINDOW_DEQUEUE = """
SELECT user_id, event_id, value, rk FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
  FROM events)
WHERE rk <= 3
"""


def q_status_classify(spark, sf):
    """O45/O21: status-code classification case/when (reference
    mainBucketScan.go:117-134 404/403 branches)."""
    li = _t(spark, sf, "lineitem")
    cls = (
        F.when(F.col("l_returnflag") == "R", F.lit("returned"))
        .when(F.col("l_returnflag") == "A", F.lit("acknowledged"))
        .otherwise(F.lit("none"))
    )
    return li.groupBy(cls.alias("status")).agg(F.count("*").alias("cnt"))


SQL_STATUS_CLASSIFY = """
SELECT CASE WHEN l_returnflag = 'R' THEN 'returned'
            WHEN l_returnflag = 'A' THEN 'acknowledged'
            ELSE 'none' END AS status,
       count(*) AS cnt
FROM lineitem GROUP BY 1
"""


# =====================================================================
# Relational breadth (agg + join shapes at scale)
# =====================================================================

def q_pricing_summary(spark, sf):
    """TPC-H-Q1-shaped aggregation; decimal-exact sums cast to double."""
    li = _t(spark, sf, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(d2("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d2("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
  cast(sum(cast(l_extendedprice as decimal(18,2)) *
           (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))) as double)
      AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_join_orders_customers(spark, sf):
    """Broadcast-dim equi-join + aggregation."""
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SQL_JOIN_ORDERS_CUSTOMERS = """
SELECT c_mktsegment, count(*) AS n_orders,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_salted_join_skew(spark, sf):
    """Skew-defused shuffle join: the fact side's join key is salted
    (pmod(xxhash64(o_orderkey), 8)) and the dim side replicated across
    the 8 salts, so one hot customer key fans out over 8 reducers
    instead of one straggler task. Same salting pattern the engine's
    dequeue uses for hot hosts (BASELINE.json north_star). The result
    is provably identical to the plain join — the oracle IS the plain
    join — so the rewrite is pure plan surgery."""
    salts = 8
    orders = _t(spark, sf, "orders").withColumn(
        "_salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(salts)).cast("int")
    )
    cust = (
        _t(spark, sf, "customer")
        .select("c_custkey", "c_mktsegment")
        .crossJoin(
            spark.range(salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return (
        orders.join(
            cust,
            (orders["o_custkey"] == cust["c_custkey"])
            & (orders["_salt"] == cust["_salt"]),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SQL_SALTED_JOIN_SKEW = SQL_JOIN_ORDERS_CUSTOMERS


def q_salted_agg_two_level(spark, sf):
    """Skew-proof aggregation: partial-aggregate on (key, salt) first —
    a hot key's rows spread over 16 reducers — then combine the 16
    partials per key. Decimal-exact sums make the two-level combine
    bit-identical to the one-level oracle (doubles would reassociate).
    This is what saves a groupBy when one key holds 30% of 100 TB."""
    salts = 16
    ev = _t(spark, sf, "events").withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(salts)).cast("int")
    )
    partial = ev.groupBy("event_type", "_salt").agg(
        F.count("*").alias("pc"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pc").alias("n_events"),
        F.sum("pv").cast("double").alias("sum_value"),
    )


SQL_SALTED_AGG_TWO_LEVEL = """
SELECT event_type, count(*) AS n_events,
       cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
FROM events GROUP BY event_type
"""


def q_global_topk_two_level(spark, sf):
    """Scale-safe global top-k without a single-task global sort: rank
    within hash-salted partitions (parallel), keep each partition's
    top k, then sort only the S*k survivors. This is the two-level
    pattern the engine's dequeue uses for max_take (VERDICT r1 perf
    item 4); the oracle is the plain ORDER BY/LIMIT, proving the
    rewrite exact. Tie-safe: the sort key is made unique with
    (l_orderkey, l_linenumber)."""
    k, salts = 100, 16
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    order = [
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    ]
    w = Window.partitionBy("_salt").orderBy(*order)
    return (
        li.withColumn(
            "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(salts))
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)  # survivors: ≤ salts*k rows
        .drop("_salt", "_rk")
        .orderBy(*order)
        .limit(k)
    )


SQL_GLOBAL_TOPK_TWO_LEVEL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
"""


def q_shipping_priority(spark, sf):
    """TPC-H-Q3-shaped 3-way join + grouped aggregate + ranked limit
    (broadcastable dim, two shuffle joins, decimal-exact revenue)."""
    cust = _t(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1995-03-15 00:00:00"))
    )
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1995-03-15 00:00:00"))
    )
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(d2("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d2("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  cast(sum(cast(l_extendedprice as decimal(18,2)) *
           (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))) as double)
      AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < timestamp '1995-03-15 00:00:00'
  AND l_shipdate > timestamp '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_rollup_lineitem(spark, sf):
    """ROLLUP aggregate (subtotals + grand total) — the multi-level
    report shape; NULL group keys mark subtotal rows in both engines."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


SQL_ROLLUP_LINEITEM = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_orders(spark, sf):
    """CUBE aggregate (every grouping-set combination) over order
    status × priority — one shuffle, Expand feeds partial aggregation
    so each input row is read once regardless of set count."""
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


SQL_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_top_parts_per_brand(spark, sf):
    """Window top-k per group over a dimension table (dense ranking by
    retail price; the per-host dequeue shape on relational data)."""
    part = _t(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


SQL_TOP_PARTS_PER_BRAND = """
SELECT p_brand, p_partkey, p_retailprice, rk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part)
WHERE rk <= 2
"""


def q_conditional_agg_events(spark, sf):
    """Conditional aggregation (pivot-style sum(case when…)) per user —
    one pass, no join, the classic funnel/report shape."""
    ev = _t(spark, sf, "events")
    cnt_of = lambda t: F.sum((F.col("event_type") == t).cast("bigint"))
    val = F.col("value").cast("decimal(18,6)")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            cnt_of("click").alias("n_click"),
            cnt_of("view").alias("n_view"),
            F.sum(F.when(F.col("event_type") == "click", val).otherwise(F.lit(0).cast("decimal(18,6)")))
            .cast("double")
            .alias("click_value"),
        )
    )


SQL_CONDITIONAL_AGG_EVENTS = """
SELECT user_id, count(*) AS n_events,
  cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS n_click,
  cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) as bigint) AS n_view,
  cast(sum(CASE WHEN event_type = 'click' THEN cast(value as decimal(18,6))
               ELSE cast(0 as decimal(18,6)) END) as double) AS click_value
FROM events GROUP BY user_id
"""


def q_sessionize_events(spark, sf):
    """Session windows (30-min inactivity gap) per user — Spark's
    built-in session_window vs a gaps-and-islands SQL twin (lag + brk
    cumulative sum). session_start as epoch seconds so the comparison
    is timezone-free; a new session starts when the gap ≥ the timeout
    (session end is exclusive)."""
    ev = _t(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


SQL_SESSIONIZE_EVENTS = """
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM e)
SELECT user_id, cast(floor(epoch(min(ts))) as bigint) AS session_start,
       count(*) AS n_events,
       cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
FROM s GROUP BY user_id, sid
"""


# =====================================================================
# Training-data pipeline: dedupe family
# =====================================================================

def q_dedup_exact(spark, sf):
    return T.dedup_exact(_t(spark, sf, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS digest, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

_MD5I = "cast(('0x' || substr(md5({x}), 1, 8)) as bigint)"

# short docs (< k words) contribute their whole text as one shingle —
# matches textops.shingles' fallback so the dedup path sees them
_SH_CTE = """
ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, s AS shingle FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(w) >= 3
                  THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w) - 2)]
                  ELSE [array_to_string(w, ' ')] END) AS s
    FROM ws)
  WHERE length(s) > 0)
"""


def q_dedup_minhash(spark, sf):
    return T.minhash_lsh_pairs(_t(spark, sf, "documents"), n_hashes=8, band_size=2)


_MINHASH_COLS = ",\n  ".join(
    "min({h}) AS mh{p}".format(h=_MD5I.format(x="'p%d|' || shingle" % p), p=p)
    for p in range(8)
)
_BAND_SELECTS = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band_id, "
    f"cast(mh{2*b} as varchar) || '_' || cast(mh{2*b+1} as varchar) AS band_hash FROM sig"
    for b in range(4)
)
SQL_DEDUP_MINHASH = f"""
WITH {_SH_CTE},
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM sh GROUP BY doc_id),
bands AS (
{_BAND_SELECTS}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""


def q_near_dup_lsh_exact(spark, sf):
    """The composed scale path (VERDICT r1 item 6): MinHash-LSH
    candidates → exact n-gram-Jaccard re-rank. Both stages bucket-join;
    no per-block quadratic self-join anywhere."""
    return T.near_dup_lsh_exact(
        _t(spark, sf, "documents"), n_hashes=8, band_size=2, k=3, threshold=0.05
    )


SQL_NEAR_DUP_LSH_EXACT = f"""
WITH {_SH_CTE},
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM sh GROUP BY doc_id),
bands AS (
{_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       floor((inter / (sa.sz + sb.sz - inter)) * 1000000 + 0.5) / 1000000 AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE floor((inter / (sa.sz + sb.sz - inter)) * 1000000 + 0.5) / 1000000 >= 0.05
"""


def q_dedup_clusters(spark, sf):
    """Transitive dedup groups: MinHash-LSH pairs → connected
    components (min-label propagation, operators/graphs.py) → per-doc
    (cluster_id, cluster_size). The iterative Spark loop is checked
    against DuckDB's recursive-CTE transitive closure over the same
    edge set — a genuine fixpoint-vs-fixpoint oracle."""
    pairs = T.minhash_lsh_pairs(_t(spark, sf, "documents"), n_hashes=8, band_size=2)
    return G.dedup_clusters(pairs)


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_SH_CTE},
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM sh GROUP BY doc_id),
bands AS (
{_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION
  SELECT doc_b AS a, doc_a AS b FROM cand),
walk(node, reach) AS (
  SELECT a, a FROM edges
  UNION
  SELECT w.node, e.b FROM walk w JOIN edges e ON e.a = w.reach),
comp AS (SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
"""


def q_dedup_keep_best(spark, sf):
    """Composed dedup policy: connected components over MinHash-LSH
    pairs, then keep the highest-quality doc per cluster (window rank
    on quality desc, doc_id asc — deterministic across engines). The
    full pipeline a training-data build actually runs: pairs → groups →
    one keeper per group."""
    docs = _t(spark, sf, "documents")
    pairs = T.minhash_lsh_pairs(docs, n_hashes=8, band_size=2)
    clusters = G.dedup_clusters(pairs)
    q = T.quality_score(docs).select("doc_id", "quality")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        clusters.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("quality").alias("best_quality"),
            "cluster_size",
        )
    )


_STOPS = ", ".join(f"'{s}'" for s in T.STOPWORDS)

SQL_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE {_SH_CTE},
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM sh GROUP BY doc_id),
bands AS (
{_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION
  SELECT doc_b AS a, doc_a AS b FROM cand),
walk(node, reach) AS (
  SELECT a, a FROM edges
  UNION
  SELECT w.node, e.b FROM walk w JOIN edges e ON e.a = w.reach),
comp AS (SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node),
sized AS (SELECT doc_id, cluster_id,
                 count(*) OVER (PARTITION BY cluster_id) AS cluster_size
          FROM comp),
qual AS (
  SELECT doc_id,
    floor((least(len(string_split(text, ' ')) / 64.0, 1.0) * 0.5
           + floor((length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   / greatest(length(text), 1)) * 1000000 + 0.5) / 1000000 * 0.3
           + least(floor((len(list_filter(string_split(lower(text), ' '),
                                         x -> x IN ({_STOPS})))
                   / greatest(len(string_split(text, ' ')), 1)) * 1000000 + 0.5) / 1000000 * 10.0, 1.0)
             * 0.2) * 1000000 + 0.5) / 1000000 AS quality
  FROM documents),
ranked AS (
  SELECT cluster_id, s.doc_id, quality, cluster_size,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, s.doc_id) AS rn
  FROM sized s JOIN qual USING (doc_id))
SELECT cluster_id, doc_id AS keeper_doc_id, quality AS best_quality, cluster_size
FROM ranked WHERE rn = 1
"""


def q_dedup_simhash(spark, sf):
    return T.simhash16(_t(spark, sf, "documents"))


_BITS = ",\n  ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(16)
)
_SIMSUM = " + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))
SQL_DEDUP_SIMHASH = f"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
  FROM documents),
h AS (SELECT doc_id, {_MD5I.format(x='word')} AS h FROM w),
b AS (SELECT doc_id, {_BITS} FROM h GROUP BY doc_id)
SELECT doc_id, cast({_SIMSUM} as bigint) AS simhash FROM b
"""


def q_ngram_jaccard(spark, sf):
    return T.ngram_jaccard_pairs(_t(spark, sf, "documents"), k=3, threshold=0.05)


SQL_NGRAM_JACCARD = f"""
WITH {_SH_CTE},
shs AS (SELECT sh.doc_id, shingle, source FROM sh JOIN documents USING (doc_id)),
sizes AS (SELECT doc_id, count(*) AS sz FROM shs GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shs a JOIN shs b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       floor((inter / (sa.sz + sb.sz - inter)) * 1000000 + 0.5) / 1000000 AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE floor((inter / (sa.sz + sb.sz - inter)) * 1000000 + 0.5) / 1000000 >= 0.05
"""


# =====================================================================
# Training-data pipeline: text analysis
# =====================================================================

def q_langid(spark, sf):
    return T.langid(_t(spark, sf, "documents"))


SQL_LANGID = f"""
SELECT doc_id,
  floor((len(list_filter(string_split(lower(text), ' '), x -> x IN ({_STOPS})))
        / greatest(len(string_split(lower(text), ' ')), 1)) * 1000000 + 0.5) / 1000000 AS stop_ratio,
  CASE WHEN floor((len(list_filter(string_split(lower(text), ' '), x -> x IN ({_STOPS})))
        / greatest(len(string_split(lower(text), ' ')), 1)) * 1000000 + 0.5) / 1000000 >= 0.02
       THEN 'en' ELSE 'unk' END AS lang_pred
FROM documents
"""


def q_quality_score(spark, sf):
    return T.quality_score(_t(spark, sf, "documents"))


SQL_QUALITY_SCORE = f"""
WITH f AS (
  SELECT doc_id,
    len(string_split(text, ' ')) AS n_tokens,
    floor((length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
          / greatest(length(text), 1)) * 1000000 + 0.5) / 1000000 AS alpha_ratio,
    floor((len(list_filter(string_split(lower(text), ' '), x -> x IN ({_STOPS})))
          / greatest(len(string_split(text, ' ')), 1)) * 1000000 + 0.5) / 1000000 AS stop_ratio
  FROM documents)
SELECT doc_id, n_tokens, alpha_ratio, stop_ratio,
  floor((least(n_tokens / 64.0, 1.0) * 0.5 + alpha_ratio * 0.3
         + least(stop_ratio * 10.0, 1.0) * 0.2) * 1000000 + 0.5) / 1000000 AS quality
FROM f
"""


def q_token_count(spark, sf):
    return T.token_counts_by_source(_t(spark, sf, "documents"))


SQL_TOKEN_COUNT = r"""
SELECT source,
  cast(sum(len(string_split(text, ' '))) as bigint) AS ws_tokens,
  cast(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) as bigint)
      AS bpe_tokens,
  count(*) AS n_docs
FROM documents GROUP BY source
"""


def q_fingerprint(spark, sf):
    return T.fingerprints(_t(spark, sf, "documents"))


SQL_FINGERPRINT = r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def q_chunk_documents(spark, sf):
    """Training-window chunking: split each document's whitespace
    tokens into 32-token chunks with stride 24 (8-token overlap) — the
    slice-and-stride pass every LLM pretraining pipeline runs before
    tokenization. Pure JVM: sequence() generates the starts, slice()
    cuts the window, one explode, zero shuffle, zero Python."""
    docs = _t(spark, sf, "documents")
    size_c, stride = 32, 24
    w = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(F.lit(0), F.size("w") - 1, F.lit(stride))
            ).alias("start"),
        )
        .select(
            "doc_id",
            F.expr(f"start div {stride}").cast("bigint").alias("chunk_id"),
            F.array_join(F.slice("w", F.col("start") + 1, size_c), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(size_c), F.size("w") - F.col("start"))
            .cast("int")
            .alias("n_tokens"),
        )
    )


SQL_CHUNK_DOCUMENTS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, 24)) AS start
      FROM t WHERE len(w) > 0)
SELECT doc_id,
       cast(start // 24 as bigint) AS chunk_id,
       array_to_string(w[start + 1 : start + 32], ' ') AS chunk_text,
       cast(least(32, len(w) - start) as int) AS n_tokens
FROM s
"""


def q_tfidf_top_terms(spark, sf):
    """TF-IDF top-3 terms per document: term frequency per (doc, word),
    document frequency per word (one shuffle each, both map-side
    combinable), idf = ln(N / df) with the corpus size N folded in as a
    literal-free cross-joined 1-row aggregate (broadcast), window
    top-3 per doc with a deterministic tie-break. Rounding to 6 dp
    before the rank so both engines rank identical values."""
    docs = _t(spark, sf, "documents")
    words = docs.select(
        "doc_id", F.explode(T.words(F.lower(F.col("text")))).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            round6(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "tf", "df", "tfidf", F.col("rn").alias("rank"))
    )


SQL_TFIDF_TOP_TERMS = f"""
WITH w2 AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
  FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY doc_id, word),
dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM w2 GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word, tf, df,
         floor((tf * ln(n_docs / df)) * 1000000 + 0.5) / 1000000 AS tfidf
  FROM tf JOIN dfreq USING (word) CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, word) AS rank
  FROM scored)
SELECT doc_id, word, tf, df, tfidf, rank FROM ranked WHERE rank <= 3
"""


def q_sample_hash_mod(spark, sf):
    """Deterministic 1-in-16 corpus sample keyed on a content-stable
    hash (md5-prefix int of doc_id) — the reproducible alternative to
    rand()-sampling for train/eval splits: the same doc lands in the
    same split on every run, every engine, at any parallelism. Pure
    narrow map + filter; the predicate pushes to the scan."""
    docs = _t(spark, sf, "documents")
    h = T.md5i(F.col("doc_id").cast("string"))
    return docs.filter(F.pmod(h, F.lit(16)) == 0).select(
        "doc_id", "source", "n_chars"
    )


SQL_SAMPLE_HASH_MOD = f"""
SELECT doc_id, source, n_chars FROM documents
WHERE {_MD5I.format(x="cast(doc_id as varchar)")} % 16 = 0
"""


def q_pii_scrub(spark, sf):
    """PII/noise scrubbing pass: redact email-shaped tokens then runs
    of digits (order matters — emails may contain digits). Pure JVM
    regexp_replace; at 100 TB this is a narrow map with zero shuffle."""
    docs = _t(spark, sf, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.col("text"), r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+", "<email>"
        ),
        r"[0-9]+",
        "<num>",
    )
    return docs.select(
        "doc_id", scrubbed.alias("clean_text"), F.length(scrubbed).alias("clean_len")
    )


SQL_PII_SCRUB = r"""
SELECT doc_id,
  regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+',
                                '<email>', 'g'),
                 '[0-9]+', '<num>', 'g') AS clean_text,
  length(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+',
                                       '<email>', 'g'),
                        '[0-9]+', '<num>', 'g')) AS clean_len
FROM documents
"""


def q_source_percentiles(spark, sf):
    """Exact interpolated percentiles of document length per source —
    Spark's percentile() and DuckDB's quantile_cont() share the linear
    interpolation definition, so the twin check is exact to rounding.
    (At 100 TB you'd switch to percentile_approx / t-digest; the exact
    form is the oracle-checkable baseline.)"""
    docs = _t(spark, sf, "documents")
    pct = F.expr("percentile(n_chars, array(0.5, 0.9))")
    return (
        docs.groupBy("source")
        .agg(pct.alias("p"), F.count("*").alias("n_docs"))
        .select(
            "source",
            round6(F.col("p")[0]).alias("p50_chars"),
            round6(F.col("p")[1]).alias("p90_chars"),
            "n_docs",
        )
    )


SQL_SOURCE_PERCENTILES = """
SELECT source,
       floor((quantile_cont(n_chars, 0.5)) * 1000000 + 0.5) / 1000000 AS p50_chars,
       floor((quantile_cont(n_chars, 0.9)) * 1000000 + 0.5) / 1000000 AS p90_chars,
       count(*) AS n_docs
FROM documents GROUP BY source
"""


# =====================================================================
# Similarity search over embeddings
# =====================================================================

def _emb_head_rows(sf: str, below_id: int) -> dict[int, list[float]]:
    """vec_id → embedding for vec_id < below_id, read driver-side with
    pyarrow from the SAME parquet input (K rows of planner metadata —
    the query vector and the IVF codebook). Replaces two warm-up Spark
    jobs (a head() and a collect()) per ANN query with a sub-ms footer
    read; float32 → Python float widening is exact either way, so the
    literals are bit-identical to the collected form."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    out: dict[int, list[float]] = {}
    for vid, emb in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()):
        if vid < below_id:
            out[int(vid)] = [float(x) for x in emb]
    return out


def _query_vec(spark, sf):
    return _emb_head_rows(sf, 1)[0]


def q_ann_cosine_topk(spark, sf):
    return ANN.brute_force_topk(_t(spark, sf, "embeddings"), _query_vec(spark, sf), k=10)


SQL_ANN_COSINE_TOPK = """
SELECT vec_id,
  floor((list_cosine_similarity(cast(embedding as double[]),
    (SELECT cast(embedding as double[]) FROM embeddings WHERE vec_id = 0))) * 1000000 + 0.5) / 1000000 AS sim
FROM embeddings
ORDER BY sim DESC, vec_id LIMIT 10
"""


def q_embedding_near_dup(spark, sf):
    """Embedding-cosine near-duplicate pairs, label-blocked self-join
    (threshold tuned to the synthetic embeddings' similarity range —
    the operator, not the threshold, is the point)."""
    return ANN.cosine_near_dup_pairs(_t(spark, sf, "embeddings"), threshold=0.35)


SQL_EMBEDDING_NEAR_DUP = """
WITH n AS (
  SELECT vec_id, label, cast(embedding as double[]) AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       floor((list_cosine_similarity(a.v, b.v)) * 1000000 + 0.5) / 1000000 AS cos_sim
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE floor((list_cosine_similarity(a.v, b.v)) * 1000000 + 0.5) / 1000000 >= 0.35
"""


_EMB_DIM = 64  # testdata embeddings are 64-dim at every sf (TESTDATA.md)
_ND_PLANES = ANN.deterministic_planes(_EMB_DIM, n_planes=4)


def q_cosine_near_dup_lsh(spark, sf):
    """Composed scale path (VERDICT r1 item 6): hyperplane-LSH bucket
    as the self-join block key → exact cosine re-rank. The oracle
    recomputes the bucket with the identical plane literals and an
    identical left-associated fold, so sign decisions agree bit-for-bit."""
    return ANN.cosine_near_dup_lsh(
        _t(spark, sf, "embeddings"), _ND_PLANES, threshold=0.35
    )


def _sql_cosine_near_dup_lsh() -> str:
    terms = []
    for i, p in enumerate(_ND_PLANES):
        # explicit indexed sum == Spark's sequential aggregate() fold —
        # list_dot_product could reassociate and flip a near-zero sign
        dot = " + ".join(f"v[{j + 1}] * {x!r}" for j, x in enumerate(p))
        terms.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END)")
    bucket = "\n     + ".join(terms)
    return f"""
WITH n AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
b AS (SELECT vec_id, v,
       {bucket} AS bucket
      FROM n)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       floor((list_cosine_similarity(a.v, c.v)) * 1000000 + 0.5) / 1000000 AS cos_sim
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE floor((list_cosine_similarity(a.v, c.v)) * 1000000 + 0.5) / 1000000 >= 0.35
"""


SQL_COSINE_NEAR_DUP_LSH = _sql_cosine_near_dup_lsh()


def q_ann_ivf_topk(spark, sf):
    """IVF coarse-quantizer ANN (annsearch.ivf_topk): assign every
    vector to its nearest of K=8 centroids with a shuffle-free JVM
    argmax, probe the query's nprobe=2 nearest cells, exact-rank inside
    them. Fully SQL-expressible, so unlike the hyperplane-LSH variant
    this scale path gets a value-hash oracle."""
    head = _emb_head_rows(sf, 8)
    return ANN.ivf_topk(
        _t(spark, sf, "embeddings"),
        head[0],
        centroids_k=8,
        nprobe=2,
        k=10,
        centroids=sorted(head.items()),
    )


SQL_ANN_IVF_TOPK = """
WITH c AS (SELECT vec_id AS cid, cast(embedding as double[]) AS cv
           FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
assign AS (
  SELECT vec_id, v, cid,
         row_number() OVER (PARTITION BY vec_id
            ORDER BY floor((list_cosine_similarity(v, cv)) * 1000000 + 0.5) / 1000000 DESC, cid) AS rk
  FROM v CROSS JOIN c),
cells AS (SELECT vec_id, v, cid AS cell FROM assign WHERE rk = 1),
probe AS (SELECT cid FROM c CROSS JOIN q
          ORDER BY floor((list_cosine_similarity(cv, qv)) * 1000000 + 0.5) / 1000000 DESC, cid LIMIT 2)
SELECT vec_id,
       floor((list_cosine_similarity(v, (SELECT qv FROM q))) * 1000000 + 0.5) / 1000000 AS sim,
       cast(cell as bigint) AS cell
FROM cells WHERE cell IN (SELECT cid FROM probe)
ORDER BY sim DESC, vec_id LIMIT 10
"""


def q_embedding_norms(spark, sf):
    return ANN.norm_stats_by_label(_t(spark, sf, "embeddings"))


SQL_EMBEDDING_NORMS = """
SELECT label,
  floor((avg(nrm)) * 1000000 + 0.5) / 1000000 AS avg_norm, floor((min(nrm)) * 1000000 + 0.5) / 1000000 AS min_norm,
  floor((max(nrm)) * 1000000 + 0.5) / 1000000 AS max_norm, count(*) AS n
FROM (SELECT label,
        sqrt(list_aggregate(list_transform(cast(embedding as double[]),
                                           x -> x * x), 'sum')) AS nrm
      FROM embeddings)
GROUP BY label
"""


# =====================================================================
# Crawl engine + multimodal (no SQL equivalent → rows-only check)
# =====================================================================

def q_crawl_e2e(spark, sf):
    """Flagship: full crawl round-loop on a deterministic world.

    Self-validating: each returned crawl-log row carries
    ``matches_oracle`` — whether the independent sequential simulator
    produced the identical (round, seq, url, status) entry — so the
    driver's rows-only check still exposes any ordering/dedupe drift
    in the row values themselves.

    The state dir is deterministic (not mkdtemp-per-call): a driver
    that invokes the query twice (count pass + hash pass) resumes the
    committed state instead of re-crawling and leaking orphan dirs
    (ADVICE r1). ``_STATE_VERSION`` salts the path so a semantics
    change can never replay stale state.
    """
    import os

    from ..sources.corpus import WorldConfig
    from ..streaming.engine import CrawlEngine, EngineConfig, STATE_VERSION
    from ..streaming.simulator import simulate

    world = WorldConfig(n_hosts=4, base_pages=8, hot_factor=3, tag="drv")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    cfg = EngineConfig(
        state_dir=os.path.join(base, f"ncs_drv_{world.tag}_v{STATE_VERSION}"),
        world=world,
        max_rounds=4,
        max_pages=48,
        fetch_tasks=8,
        expected_urls=1 << 12,
    )
    eng = CrawlEngine(spark, cfg)
    eng.run()
    sim = simulate(world, max_rounds=4, max_pages=48)
    oracle = spark.createDataFrame(
        pd.DataFrame(sim.log, columns=["round", "seq", "canon_url", "o_status"]),
        "round int, seq int, canon_url string, o_status int",
    )
    log = eng.crawl_log()
    # FULL join, not left: an engine regression that silently drops
    # trailing log rows must surface as unmatched oracle rows in the
    # driver's value hash, not vanish from the join
    return (
        log.join(oracle, ["round", "seq", "canon_url"], "full")
        .withColumn(
            "matches_oracle",
            F.coalesce(
                F.col("o_status").isNotNull()
                & F.col("status_code").isNotNull()
                & (F.col("o_status") == F.col("status_code")),
                F.lit(False),
            ),
        )
        .drop("o_status")
        .orderBy("round", "seq")
    )


def q_multimodal_decode(spark, sf):
    """Image decode/feature plumbing over the payload table.

    Self-validating (rows-only query, crawl_e2e pattern): every row
    carries ``decode_ok`` — lossless formats (rgb8/png) must re-derive
    the generator's stored phash EXACTLY; the lossy format (dctq) must
    meet the ≥40 dB north-rule PSNR invariant with phash drift ≤ 8 of
    64 bits (measured ≤ 6 on this corpus) — so a codec regression
    shows up in the driver's value hash, not just in pytest."""
    from ..sources.corpus import WorldConfig, all_page_urls, images_pdf

    world = WorldConfig(n_hosts=3, base_pages=6, hot_factor=2, tag="drv-img")
    pdf = images_pdf(world, all_page_urls(world))
    images = spark.createDataFrame(pdf)
    ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("phash_rederived")))
    return MM.decode_features(images, n_tasks=8).withColumn(
        "decode_ok",
        F.when(
            F.col("fmt") == "dctq",
            (F.col("psnr_vs_reencode") >= 40.0) & (ham <= 8),
        ).otherwise(F.col("phash") == F.col("phash_rederived")),
    )


def q_multimodal_thumbs(spark, sf):
    """Image resize plumbing: area-resample to 16×16 + lossless
    re-encode over the payload table.

    Self-validating (rows-only, crawl_e2e pattern): ``thumb_ok``
    compares the emitted blob's md5 (JVM-side) against a driver-side
    oracle that recomputes each 16×16 cell as a DIRECT slice-and-mean
    over the decoded image — no integral image — so the operator's
    cumsum/ix_ box algebra is checked against a naive re-derivation of
    the same floor-boundary spec. Both paths produce exact dyadic
    box means over integer pixels, so round+clip is bit-identical and
    the comparison is byte-exact. Full outer join: a dropped or extra
    thumb surfaces as an unmatched row in the driver's value hash."""
    import hashlib

    import numpy as np

    from ..functions import codecs_np as C
    from ..sources.corpus import WorldConfig, all_page_urls, images_pdf

    world = WorldConfig(n_hosts=3, base_pages=6, hot_factor=2, tag="drv-img")
    ipdf = images_pdf(world, all_page_urls(world))
    images = spark.createDataFrame(ipdf)
    thumbs = MM.thumbnails(images, size=16, n_tasks=8)
    size = 16
    exp = []
    for r in ipdf.itertuples(index=False):
        img = C.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h)).astype(np.float64)
        h, w = img.shape[:2]
        ys = [i * h // size for i in range(size + 1)]
        xs = [i * w // size for i in range(size + 1)]
        cells = np.empty((size, size, 3), dtype=np.float64)
        for i in range(size):
            y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
            for j in range(size):
                x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
                cells[i, j] = img[y0:y1, x0:x1].reshape(-1, 3).mean(axis=0)
        tb = np.clip(np.round(cells), 0, 255).astype(np.uint8).tobytes()
        exp.append(
            {"image_id": r.image_id, "o_md5": hashlib.md5(tb).hexdigest()}
        )
    oracle = spark.createDataFrame(
        pd.DataFrame(exp), "image_id string, o_md5 string"
    )
    return (
        thumbs.join(oracle, "image_id", "full")
        .withColumn(
            "thumb_ok",
            F.coalesce(
                (F.length("thumb") == F.lit(size * size * 3))
                & (F.md5("thumb") == F.col("o_md5")),
                F.lit(False),
            ),
        )
        .drop("o_md5")
    )


def q_video_frames(spark, sf):
    """Video frame-sampling plumbing: opaque concatenated-rgb8 blobs →
    every-4th-frame rows with timestamps + phash.

    Self-validating (rows-only, crawl_e2e pattern): each row carries
    ``frame_ok`` — the emitted frame's md5 (computed JVM-side) must
    equal the digest of the INDEPENDENT per-frame oracle
    ``gen_video_frame`` (corpus.py: frame k is recomputable without
    slicing the blob), and the timestamp must match
    ``floor(k*1000/fps)``. The join is FULL outer, so a dropped or
    extra frame surfaces as an unmatched row in the driver's value
    hash, not just a count drift."""
    import hashlib

    from ..sources.corpus import WorldConfig, gen_video_frame, videos_pdf

    world = WorldConfig(tag="drv-vid")
    vids = videos_pdf(world, 24)
    videos = spark.createDataFrame(vids)
    frames = MM.sample_frames(videos, every_k=4, n_tasks=8)
    exp = []
    for r in vids.itertuples(index=False):
        stride = int(r.w) * int(r.h) * 3
        nf = min(int(r.n_frames), len(r.bytes) // stride)
        for k in range(0, nf, 4):
            fr = gen_video_frame(world, r.video_id, k, int(r.w), int(r.h))
            exp.append(
                {
                    "video_id": r.video_id,
                    "frame_idx": k,
                    "o_md5": hashlib.md5(fr.tobytes()).hexdigest(),
                    "o_t_ms": int(k * 1000 / int(r.fps)),
                }
            )
    oracle = spark.createDataFrame(
        pd.DataFrame(exp),
        "video_id string, frame_idx int, o_md5 string, o_t_ms int",
    )
    return (
        frames.join(oracle, ["video_id", "frame_idx"], "full")
        .withColumn(
            "frame_ok",
            F.coalesce(
                F.col("o_md5").isNotNull()
                & (F.md5("frame") == F.col("o_md5"))
                & (F.col("t_ms") == F.col("o_t_ms")),
                F.lit(False),
            ),
        )
        .drop("o_md5", "o_t_ms")
    )


def q_audio_features(spark, sf):
    """Audio decode/feature plumbing: pcm16 blobs → duration/RMS/peak/
    zero-crossing-rate rows.

    Self-validating (rows-only, crawl_e2e pattern): ``audio_ok``
    compares every emitted feature against a driver-side recompute
    over the generator's blobs (full outer join — a dropped or
    duplicated clip surfaces as an unmatched row). Integers must be
    exact; floats within 1e-9 (same float64 arithmetic, different
    execution path — this pins the Arrow batch plumbing and the
    pcm16 normalization, not just the formulas)."""

    from ..sources.corpus import WorldConfig, audios_pdf

    world = WorldConfig(tag="drv-aud")
    apdf = audios_pdf(world, 40)
    audio = spark.createDataFrame(apdf)
    import numpy as np

    exp = []
    for r in apdf.itertuples(index=False):
        pcm = np.frombuffer(
            r.bytes[: len(r.bytes) // 2 * 2], dtype="<i2"
        ).astype(np.float64) / 32768.0
        n = len(pcm)
        zc = int(np.count_nonzero(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
        exp.append(
            {
                "audio_id": r.audio_id,
                "o_n": n,
                "o_dur": int(n * 1000 / int(r.sr)) if int(r.sr) > 0 else 0,
                "o_rms": float(np.sqrt(np.mean(pcm**2))) if n else 0.0,
                "o_peak": float(np.max(np.abs(pcm))) if n else 0.0,
                "o_zcr": float(zc / max(n - 1, 1)),
            }
        )
    oracle = spark.createDataFrame(
        pd.DataFrame(exp),
        "audio_id string, o_n int, o_dur int, o_rms double, o_peak double, o_zcr double",
    )
    return (
        MM.audio_features(audio, n_tasks=8)
        .join(oracle, "audio_id", "full")
        .withColumn(
            "audio_ok",
            F.coalesce(
                (F.col("n_samples") == F.col("o_n"))
                & (F.col("duration_ms") == F.col("o_dur"))
                & (F.abs(F.col("rms") - F.col("o_rms")) < 1e-9)
                & (F.abs(F.col("peak") - F.col("o_peak")) < 1e-9)
                & (F.abs(F.col("zcr") - F.col("o_zcr")) < 1e-9),
                F.lit(False),
            ),
        )
        .drop("o_n", "o_dur", "o_rms", "o_peak", "o_zcr")
    )


def q_ann_lsh_topk(spark, sf):
    """Self-validating (rows-only): each LSH-retrieved row carries
    ``in_brute_topk`` — membership in the exact brute-force top-10,
    computed in the same query — so retrieval-recall drift shows up in
    the driver's value hash (the pytest recall test covers the
    threshold; this documents per-row ground truth)."""
    emb = _t(spark, sf, "embeddings")
    qv = _query_vec(spark, sf)
    dim = len(qv)
    # few planes + wide probe: the synthetic embeddings are weakly
    # clustered (top-10 cosine ≈ 0.3-0.5), so recall needs a generous
    # candidate set; denser real embeddings would use more planes
    planes = ANN.deterministic_planes(dim, n_planes=4)
    lsh = ANN.lsh_topk(emb, qv, planes, k=10, probe_hamming=2)
    brute = ANN.brute_force_topk(emb, qv, k=10).select(
        F.col("vec_id").alias("__b_vid")
    )
    return (
        lsh.join(F.broadcast(brute), lsh["vec_id"] == F.col("__b_vid"), "left")
        .withColumn("in_brute_topk", F.col("__b_vid").isNotNull())
        .drop("__b_vid")
    )


def q_fuzzer_generate(spark, sf):
    """O79/D10: seeded deterministic fuzz-case generation (counter-hash
    choices — distributable, and md5 makes it oracle-checkable)."""
    from ..operators import fuzzing

    return fuzzing.generate(spark, iterations=1000)


def _sql_fuzzer():
    from ..operators import fuzzing

    return fuzzing.oracle_sql(iterations=1000)


def q_fuzzer_random(spark, sf):
    """O79 random-key mode (reference no-BuildLogic branch,
    mainFuzzer.go:96-101): the vector class of every slot is itself a
    seeded counter-hash choice."""
    from ..operators import fuzzing

    return fuzzing.generate_random(spark, iterations=1000, slots_per_case=4)


def _sql_fuzzer_random():
    from ..operators import fuzzing

    return fuzzing.oracle_random_sql(iterations=1000, slots_per_case=4)


def q_dns_sweep(spark, sf):
    """O46+O58+O65: wordlist sweep with resume anti-join and
    found/not-found classification (simulated resolver).

    Self-validating (rows-only): ``dns_ok`` re-checks the structural
    contract JVM-side — absolute-FQDN name shape (trailing dot,
    mainDNS.go:112), the resume anti-join actually excluded the
    history names, found ⇔ a non-null exploded entry, and A-type
    answers look like the responder's 10.x addresses. History entries
    carry the trailing-dot form the sweep stores (a dot-less history
    would anti-join against nothing — the exact silent-re-resolve
    failure the docstring in connectors.py warns about, and what this
    verdict column now guards)."""
    from ..sources.connectors import simulate_dns_sweep

    words = _t(spark, sf, "nation").select(F.lower("n_name").alias("word"))
    hist = ["germany.sweep.test.", "france.sweep.test."]
    history = spark.createDataFrame([(h,) for h in hist], "name string")
    res = simulate_dns_sweep(spark, words, "sweep.test", history)
    return res.withColumn(
        "dns_ok",
        F.col("name").endswith(".sweep.test.")
        & ~F.col("name").isin(hist)
        & (F.col("found") == F.col("entry").isNotNull())
        & (
            ~F.col("found")
            | F.col("entry").rlike(r"^10\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
        ),
    )


def q_bucket_scan(spark, sf):
    """O54+O34+O45: words × providers cross join, {w} substitution,
    status classification (simulated probe → rows-only)."""

    from ..sources.connectors import bucket_scan

    words = _t(spark, sf, "region").select(F.lower("r_name").alias("word"))
    providers = spark.createDataFrame(
        pd.DataFrame(
            [
                {"name": "p1", "url_template": "https://{w}.p1.test", "not_found_code": 404, "denied_code": 403},
                {"name": "p2", "url_template": "https://p2.test/{w}", "not_found_code": 400, "denied_code": 401},
            ]
        ),
        "name string, url_template string, not_found_code int, denied_code int",
    )
    res = bucket_scan(spark, words, providers)
    # Self-validating (rows-only): re-join the provider dim and check
    # (a) the {w} substitution is invertible — replacing the word back
    # with the placeholder recovers the template (pins the cross-join
    # row pairing, not just "url contains word"), (b) the probe status
    # is one of the provider's three legal codes, (c) the classifier
    # agrees with a CASE re-derivation of mainBucketScan.go:117-134.
    dim = providers.select(
        "name", "url_template",
        F.col("not_found_code").alias("nf"), F.col("denied_code").alias("dn"),
    )
    return (
        res.join(F.broadcast(dim), "name", "left")
        .withColumn(
            "probe_ok",
            (F.replace(F.col("url"), F.col("word"), F.lit("{w}")) == F.col("url_template"))
            & (
                (F.col("status_code") == 200)
                | (F.col("status_code") == F.col("nf"))
                | (F.col("status_code") == F.col("dn"))
            )
            & (
                F.col("result")
                == F.expr(
                    "CASE WHEN status_code = nf THEN 'not found' "
                    "WHEN status_code = dn THEN 'access denied' "
                    "ELSE 'found' END"
                )
            ),
        )
        .drop("url_template", "nf", "dn")
    )


def q_httpscan_matrix(spark, sf):
    """O55-O57+O35: probe matrix (params/headers/segments × vectors)
    over synthetic URLs + substring-found scan.

    Self-validating (rows-only): ``matrix_ok`` re-derives the expected
    probe count per URL straight from the URL STRING with independent
    JVM array ops — unique query keys × all 5 vectors, 2 headers × 5
    (scan_headers on here), non-empty path segments × the 4
    segment-eligible vectors (section null/empty or contains
    'urlsegment', mainHttpScan.go:151-153) — and compares it to the
    actual per-URL row count. A matrix that drops a branch, double
    probes a duplicate key, or mis-gates a section flips the verdict;
    the full join surfaces URLs that produced no probes at all."""
    from ..operators.links import path_of_col
    from ..plans.httpscan import VECTORS, run_scan

    urls = spark.createDataFrame(
        [(f"http://scan{i:02d}.test/a/b{i}?x={i}&y=2",) for i in range(20)]
        # fragment shapes keep the cut-order agreement live: '?' inside
        # a fragment probes no params; '#' after '?' ends the key
        + [("http://scanfr.test/p#f?x=1",), ("http://scanfr.test/p?key#frag",)],
        "url string",
    )
    res = run_scan(spark, urls, scan_headers=True)
    # same Go url.Parse cut order as probe_matrix (review r4
    # follow-up): fragment first, THEN the first '?' — a '?' inside a
    # fragment is no query, and a '#' ends one; the oracle must not
    # re-encode the pre-fix semantics or it would mis-validate
    # fragment-bearing URLs
    prefrag = F.substring_index(F.col("url"), "#", 1)
    q = prefrag.substr(F.instr(prefrag, "?") + F.lit(1), F.length("url"))
    keys = F.array_distinct(
        F.transform(
            F.filter(F.split(q, "&"), lambda x: F.length(x) > 0),
            lambda x: F.substring_index(x, "=", 1),
        )
    )
    nkeys = F.when(prefrag.contains("?"), F.size(keys)).otherwise(F.lit(0))
    nsegs = F.size(
        F.filter(
            F.split(path_of_col(F.col("url")), "/"), lambda x: F.length(x) > 0
        )
    )
    n_seg_vecs = sum(
        1 for v in VECTORS if not v["section"] or "urlsegment" in v["section"]
    )
    n_vecs = len(VECTORS)
    expected = urls.select(
        "url",
        (nkeys * n_vecs + 2 * n_vecs + nsegs * n_seg_vecs).alias("o_probes"),
    )
    w = Window.partitionBy("url")
    return (
        res.withColumn("n_probes", F.count(F.lit(1)).over(w))
        .join(expected, "url", "full")
        .withColumn(
            "matrix_ok",
            F.coalesce(F.col("n_probes") == F.col("o_probes"), F.lit(False)),
        )
        .drop("n_probes", "o_probes")
    )


# =====================================================================
# Registry
# =====================================================================

# =====================================================================
# Training-data pipeline: corpus curation (repetition / contamination /
# sampling / packing / collocations)
# =====================================================================

def q_repetition_filter(spark, sf):
    """Gopher-style repetition quality gate: duplicate-word and
    duplicate-bigram fractions per document, keep = both under
    threshold. All array-native (split / array_distinct / zip_with) —
    zero explode, zero shuffle, scales as a pure map over the scan."""
    docs = _t(spark, sf, "documents")
    w = F.split(F.lower(F.col("text")), " ")
    d = docs.select("doc_id", w.alias("w"))
    n = F.size("w")
    bi = F.zip_with(
        F.slice(F.col("w"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("w"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    d = d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        (n - F.size(F.array_distinct("w"))).alias("dup_w"),
        bi.alias("bi"),
    )
    dwf = round6(F.col("dup_w") / F.greatest(F.col("n_words"), F.lit(1)))
    dbf = round6(
        (F.size("bi") - F.size(F.array_distinct("bi")))
        / F.greatest(F.size("bi"), F.lit(1))
    )
    return d.select(
        "doc_id",
        "n_words",
        dwf.alias("dup_word_frac"),
        dbf.alias("dup_bigram_frac"),
        ((dwf < 0.2) & (dbf < 0.1)).alias("keep"),
    )


SQL_REPETITION_FILTER = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
f AS (SELECT doc_id, len(w) AS n_words,
        len(w) - len(list_distinct(w)) AS dup_w,
        [w[i] || ' ' || w[i+1] for i in generate_series(1, len(w) - 1)] AS bi
      FROM t),
g AS (SELECT doc_id, cast(n_words as bigint) AS n_words,
        floor((dup_w / greatest(n_words, 1)) * 1000000 + 0.5) / 1000000 AS dup_word_frac,
        floor(((len(bi) - len(list_distinct(bi))) / greatest(len(bi), 1))
              * 1000000 + 0.5) / 1000000 AS dup_bigram_frac
      FROM f)
SELECT doc_id, n_words, dup_word_frac, dup_bigram_frac,
       (dup_word_frac < 0.2 AND dup_bigram_frac < 0.1) AS keep
FROM g
"""


def q_contamination_overlap(spark, sf):
    """Benchmark-contamination check: fraction of each training doc's
    distinct 3-word shingles that appear in a held-out benchmark set
    (synthetic: doc_id % 97 == 0). The benchmark shingle set is small
    by construction → broadcast hash join against the corpus shingle
    table; no shuffle of the big side beyond the per-doc groupBy."""
    docs = _t(spark, sf, "documents")
    sh = T.shingle_table(docs, k=3)
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev = sh.filter(F.col("doc_id") % 97 != 0)
    agg = (
        ev.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
    )
    frac = round6(F.col("n_hits") / F.greatest(F.col("n_shingles"), F.lit(1)))
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_hits",
        frac.alias("contam_frac"),
        (frac >= 0.2).alias("contaminated"),
    )


SQL_CONTAMINATION_OVERLAP = f"""
WITH {_SH_CTE},
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
ev AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
agg AS (SELECT ev.doc_id, cast(count(*) as bigint) AS n_shingles,
          cast(coalesce(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 END), 0)
               as bigint) AS n_hits
        FROM ev LEFT JOIN bench b USING (shingle) GROUP BY ev.doc_id)
SELECT doc_id, n_shingles, n_hits,
       floor((n_hits / greatest(n_shingles, 1)) * 1000000 + 0.5) / 1000000 AS contam_frac,
       (floor((n_hits / greatest(n_shingles, 1)) * 1000000 + 0.5) / 1000000 >= 0.2)
           AS contaminated
FROM agg
"""


def q_stratified_sample(spark, sf):
    """Stratified 20% corpus sample with exact per-source quotas:
    deterministic hash order within each source, row_number ≤
    ceil(n/5) (integer arithmetic — no float quota boundary). One
    shuffle on source; for the quota-free variant at hot sources see
    sample_hash_mod."""
    docs = _t(spark, sf, "documents")
    h = T.md5i(F.col("doc_id").cast("string"))
    d = docs.select("source", "doc_id", h.alias("_h"))
    rn = F.row_number().over(Window.partitionBy("source").orderBy("_h", "doc_id"))
    n_src = F.count("*").over(Window.partitionBy("source"))
    return (
        d.withColumn("rn", rn)
        .withColumn("n_src", n_src)
        .filter(F.col("rn") <= F.expr("(n_src + 4) div 5"))
        .select("source", "doc_id", F.col("rn").cast("bigint").alias("pick_rank"))
    )


SQL_STRATIFIED_SAMPLE = f"""
WITH d AS (SELECT source, doc_id,
             {_MD5I.format(x="cast(doc_id as varchar)")} AS h
           FROM documents),
r AS (SELECT source, doc_id,
        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn,
        count(*) OVER (PARTITION BY source) AS n_src
      FROM d)
SELECT source, doc_id, cast(rn as bigint) AS pick_rank
FROM r WHERE rn <= (n_src + 4) // 5
"""


def q_pack_sequences(spark, sf):
    """Training-sequence packing: docs are laid into 2048-token bins
    per source in deterministic hash order — bin id = cumulative
    tokens before the doc, integer-divided by 2048 (next-fit with
    overflow; no doc splitting). The window cumsum is one shuffle on
    source; bin stats are map-side combinable."""
    docs = _t(spark, sf, "documents")
    h = T.md5i(F.col("doc_id").cast("string"))
    d = docs.select(
        "source",
        "doc_id",
        h.alias("_h"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum", F.sum("n_tok").over(w))
        .withColumn("cum_before", F.col("cum") - F.col("n_tok"))
        .withColumn("bin_id", F.expr("cum_before div 2048").cast("bigint"))
        .groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
        )
    )


SQL_PACK_SEQUENCES = f"""
WITH d AS (SELECT source, doc_id,
             {_MD5I.format(x="cast(doc_id as varchar)")} AS h,
             cast(len(string_split(text, ' ')) as bigint) AS n_tok
           FROM documents),
c AS (SELECT source, doc_id, n_tok,
        sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tok AS cum_before
      FROM d)
SELECT source, cast(cum_before // 2048 as bigint) AS bin_id,
       count(*) AS n_docs, cast(sum(n_tok) as bigint) AS sum_tokens
FROM c GROUP BY 1, 2
"""


def q_pmi_bigrams(spark, sf):
    """Collocation mining: top-50 adjacent word pairs by integer-exact
    PMI lift = cnt_ab·N·10^6 div (cnt_a·cnt_b) (monotone in PMI, no
    cross-engine log rounding). The product is computed in decimal(38)
    (DuckDB: hugeint) — at a 10^8-word corpus cnt_ab·N·10^6 exceeds
    int64 and a non-ANSI bigint multiply would wrap silently; the
    quotient always fits bigint (≤ N·10^6). Bigram and unigram counts
    are each one map-side-combinable shuffle; the top-50 is an
    orderBy+limit (TakeOrderedAndProject) with the rank window applied
    to only the 50 survivors."""
    docs = _t(spark, sf, "documents")
    warr = T.words(F.lower(F.col("text")))
    d = docs.select(warr.alias("a"))
    n1 = F.size("a")
    uni = (
        d.select(F.explode("a").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    total = uni.agg(F.sum("cnt").cast("bigint").alias("total"))
    pairs = F.zip_with(
        F.slice(F.col("a"), 1, F.greatest(n1 - 1, F.lit(0))),
        F.slice(F.col("a"), 2, F.greatest(n1 - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bi = (
        d.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("cnt_ab"))
        .filter(F.col("cnt_ab") >= 3)
    )
    scored = (
        bi.join(uni.select(F.col("word").alias("w1"), F.col("cnt").alias("cnt_a")), "w1")
        .join(uni.select(F.col("word").alias("w2"), F.col("cnt").alias("cnt_b")), "w2")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift",
            F.expr(
                "cast(cast(cnt_ab as decimal(38,0)) * total * 1000000"
                " div (cnt_a * cnt_b) as bigint)"
            ),
        )
    )
    top = scored.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2")).limit(50)
    rk = F.row_number().over(
        Window.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
    )
    return top.withColumn("rank", rk.cast("bigint")).select(
        "w1", "w2", "cnt_ab", "lift", "rank"
    )


SQL_PMI_BIGRAMS = f"""
WITH t AS (SELECT regexp_extract_all(lower(text), '{WORD_RE}') AS a FROM documents),
u AS (SELECT unnest(a) AS word FROM t),
uc AS (SELECT word, count(*) AS cnt FROM u GROUP BY word),
n AS (SELECT cast(sum(cnt) as bigint) AS total FROM uc),
b AS (SELECT unnest([a[i] || ' ' || a[i+1]
                     for i in generate_series(1, len(a) - 1)]) AS bg FROM t),
bc AS (SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
              count(*) AS cnt_ab
       FROM b GROUP BY 1, 2),
scored AS (
  SELECT w1, w2, cnt_ab,
         cast(cast(cnt_ab as hugeint) * total * 1000000 // (cnt_a * cnt_b)
              as bigint) AS lift
  FROM bc
  JOIN (SELECT word AS w1, cnt AS cnt_a FROM uc) USING (w1)
  JOIN (SELECT word AS w2, cnt AS cnt_b FROM uc) USING (w2)
  CROSS JOIN n
  WHERE cnt_ab >= 3),
ranked AS (SELECT *, row_number() OVER (ORDER BY lift DESC, w1, w2) AS rank
           FROM scored)
SELECT w1, w2, cnt_ab, lift, rank FROM ranked WHERE rank <= 50
"""


# =====================================================================
# Time-series joins (training-pipeline family): as-of + trailing range
# =====================================================================

def q_asof_attribution(spark, sf):
    """Backward as-of join — attribute each click to the user's most
    recent view (ties: latest event_id). Spark has no ASOF JOIN
    built-in; operators/timeseries.py expresses it as a union-window
    plan (ONE shuffle on user_id, no range-condition blowup). The
    DuckDB twin is an independent formulation (nested correlated
    subqueries), not a re-implementation."""
    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    out = TS.asof_join(
        clicks,
        views,
        on="user_id",
        ts="ts",
        payload={"attributed_view": "event_id"},
        right_tiebreak="event_id",
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_timestamp(F.col("ts")).alias("click_epoch"),
        "attributed_view",
    )


SQL_ASOF_ATTRIBUTION = """
SELECT c.event_id AS click_id, c.user_id,
       cast(floor(epoch(c.ts)) as bigint) AS click_epoch,
       (SELECT max(v.event_id) FROM events v
         WHERE v.user_id = c.user_id AND v.event_type = 'view'
           AND v.ts = (SELECT max(v2.ts) FROM events v2
                        WHERE v2.user_id = c.user_id
                          AND v2.event_type = 'view' AND v2.ts <= c.ts))
         AS attributed_view
FROM events c WHERE c.event_type = 'click'
"""


def q_range_join_trailing(spark, sf):
    """Trailing-window range join — per click, count+sum the user's
    views in the preceding hour. A naive inequality join is a
    broadcast-nested-loop (O(n·m)); the operator bins both sides to
    1-hour buckets so it becomes an equi-join on (user, bin) with a
    2× probe explode, then filters the exact range residual."""
    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("vts"),
        F.col("value").alias("vvalue"),
    )
    out = TS.range_join_trailing(
        clicks,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="vts",
        window_s=3600,
        left_id="click_id",
        aggs=[
            F.count("*").alias("_n"),
            F.sum(F.col("vvalue").cast("decimal(18,6)")).alias("_sv"),
        ],
    )
    return out.select(
        "click_id",
        "user_id",
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_views_1h"),
        F.coalesce(F.col("_sv"), F.lit(0).cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_view_value"),
    )


SQL_RANGE_JOIN_TRAILING = """
SELECT c.event_id AS click_id, c.user_id,
       cast(count(v.vts) as bigint) AS n_views_1h,
       cast(coalesce(sum(cast(v.vvalue as decimal(18,6))), 0) as double)
           AS sum_view_value
FROM events c LEFT JOIN (
  SELECT user_id, ts AS vts, value AS vvalue FROM events
  WHERE event_type = 'view') v
  ON v.user_id = c.user_id
 AND v.vts > c.ts - INTERVAL 1 HOUR AND v.vts <= c.ts
WHERE c.event_type = 'click'
GROUP BY c.event_id, c.user_id
"""


def q_funnel_conversion(spark, sf):
    """Funnel step via FORWARD as-of join: for each view, the user's
    next click (smallest ts ≥ the view's; ties → smallest event_id)
    and whether it landed within the 1-hour conversion window. Same
    single-shuffle union-window plan as the backward direction."""
    ev = _t(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = TS.asof_join(
        views,
        clicks,
        on="user_id",
        ts="ts",
        payload={"next_click": "event_id", "_ct": "ts"},
        right_tiebreak="event_id",
        direction="forward",
    )
    return out.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.unix_timestamp(F.col("ts")).alias("view_epoch"),
        "next_click",
        F.coalesce(
            F.col("_ct") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"), F.lit(False)
        ).alias("converted"),
    )


SQL_FUNNEL_CONVERSION = """
WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
nc AS (
  SELECT v.event_id, v.user_id, v.ts,
         (SELECT min(c2.ts) FROM events c2
           WHERE c2.user_id = v.user_id AND c2.event_type = 'click'
             AND c2.ts >= v.ts) AS ct
  FROM v)
SELECT event_id AS view_id, user_id,
       cast(floor(epoch(ts)) as bigint) AS view_epoch,
       (SELECT min(c.event_id) FROM events c
         WHERE c.user_id = nc.user_id AND c.event_type = 'click'
           AND c.ts = nc.ct) AS next_click,
       coalesce(ct <= ts + INTERVAL 1 HOUR, false) AS converted
FROM nc
"""


def q_domain_mix(spark, sf):
    """Domain-mix rebalancing: integer-exact per-source sampling plan
    toward a uniform target mix — target = ceil(total/n_sources) docs
    per source, rate in millionths, kept = min(n_src, target). One
    tiny aggregate cross-joined back as a broadcast; the actual
    row-level sample then composes with sample_hash_mod's
    deterministic hash filter at the computed rate."""
    docs = _t(spark, sf, "documents")
    s = docs.groupBy("source").agg(F.count("*").alias("n_src"))
    t = s.agg(
        F.sum("n_src").cast("bigint").alias("total"),
        F.count("*").alias("n_sources"),
    )
    return (
        s.crossJoin(F.broadcast(t))
        .withColumn(
            "target", F.expr("(total + n_sources - 1) div n_sources").cast("bigint")
        )
        .withColumn(
            "rate_micro",
            F.least(F.lit(1000000).cast("bigint"),
                    F.expr("target * 1000000 div n_src").cast("bigint")),
        )
        .withColumn("keep_docs", F.least(F.col("n_src"), F.col("target")))
        .select("source", "n_src", "target", "rate_micro", "keep_docs")
    )


SQL_DOMAIN_MIX = """
WITH s AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
t AS (SELECT cast(sum(n_src) as bigint) AS total, count(*) AS n_sources FROM s)
SELECT source, n_src,
       cast((total + n_sources - 1) // n_sources as bigint) AS target,
       least(1000000,
             cast((total + n_sources - 1) // n_sources * 1000000 // n_src
                  as bigint)) AS rate_micro,
       least(n_src, cast((total + n_sources - 1) // n_sources as bigint))
           AS keep_docs
FROM s CROSS JOIN t
"""


def q_training_shards(spark, sf):
    """Training-shard sink round-trip: write the documents table as 8
    deterministic hash shards (sources/shards.py), then read the
    on-disk manifest back. The oracle recomputes the expected
    assignment from the hash contract alone — so the pair verifies the
    physical shard layout, not just an in-memory groupBy."""
    import os

    from ..sources import shards as SH

    docs = _t(spark, sf, "documents")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    out = os.path.join(base, "ncs_shards_q", os.path.basename(sf.rstrip("/")))
    SH.write_training_shards(docs, out, key_col="doc_id", n_shards=8)
    return SH.shard_manifest(spark, out).select(
        F.col("shard").cast("int").alias("shard"), "n_rows"
    )


SQL_TRAINING_SHARDS = """
SELECT cast(cast(('0x' || substr(md5(cast(doc_id as varchar)), 1, 8)) as bigint)
            % 8 as int) AS shard,
       count(*) AS n_rows
FROM documents GROUP BY 1
"""


# Ordered for the driver's correctness gate, which runs the FIRST ~50
# entries (VERDICT r2 item 2: 13 of 63 got no r2 row purely by
# position). Layout: [1] oracle-backed queries that have never had a
# driver row run first; [2] the other oracle-backed queries — round 4
# rotates the five r3-rotated-out greens back in (VERDICT r3 item 8)
# and rotates their machinery twins out instead; [3] rows-only queries
# (no SQL twin — weaker check by nature); [4] redundant oracle greens
# rotated out of the window — each is correctness-covered by pytest
# plus an in-window sibling exercising the same machinery
# (rollup↔cube, global_topk↔top_parts, salted_agg↔salted_join,
# stratified_sample↔sample_hash_mod, pricing_summary↔conditional_agg,
# union_extractors↔wordlist_extractors). Every oracle-backed query has
# a green driver row in round 3 or this rotation.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- [1] r4-rotated-out oracle greens returning to the window ----
    # (VERDICT r4 item 6: every oracle-backed query green within the
    # last two rounds) — their r1-r3 rows are the oldest, so they run
    # first this round
    "report_wordlist": q_report_wordlist,
    "dedup_keep_best": q_dedup_keep_best,
    "union_extractors": q_union_extractors,
    "salted_agg_two_level": q_salted_agg_two_level,
    "rollup_lineitem": q_rollup_lineitem,
    "global_topk_two_level": q_global_topk_two_level,
    "stratified_sample": q_stratified_sample,
    "pricing_summary": q_pricing_summary,
    # -- [2] oracle-backed (all green r4) -----------------------------
    "wordlist_showfile": q_wordlist_showfile,
    "wordlist_full": q_wordlist_full,
    "wordlist_mutator": q_wordlist_mutator,
    "embedding_norms": q_embedding_norms,
    "embedding_near_dup": q_embedding_near_dup,
    "cosine_near_dup_lsh": q_cosine_near_dup_lsh,
    "fuzzer_generate": q_fuzzer_generate,
    "fuzzer_random": q_fuzzer_random,
    "report_query_keys": q_report_query_keys,
    "slice_cap": q_slice_cap,
    "anti_join_resume": q_anti_join_resume,
    "cross_join_templates": q_cross_join_templates,
    "filtered_enqueue": q_filtered_enqueue,
    "window_dequeue": q_window_dequeue,
    "status_classify": q_status_classify,
    "shipping_priority": q_shipping_priority,
    "sessionize_events": q_sessionize_events,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_clusters": q_dedup_clusters,
    "dedup_simhash": q_dedup_simhash,
    "ngram_jaccard": q_ngram_jaccard,
    "near_dup_lsh_exact": q_near_dup_lsh_exact,
    "langid": q_langid,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "doc_fingerprint": q_fingerprint,
    "chunk_documents": q_chunk_documents,
    "tfidf_top_terms": q_tfidf_top_terms,
    "repetition_filter": q_repetition_filter,
    "contamination_overlap": q_contamination_overlap,
    "pack_sequences": q_pack_sequences,
    "pmi_bigrams": q_pmi_bigrams,
    "asof_attribution": q_asof_attribution,
    "range_join_trailing": q_range_join_trailing,
    "funnel_conversion": q_funnel_conversion,
    "domain_mix": q_domain_mix,
    "training_shards": q_training_shards,
    "pii_scrub": q_pii_scrub,
    "source_percentiles": q_source_percentiles,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    # -- [3] rows-only (no ANSI-SQL twin) ---------------------------
    "crawl_e2e": q_crawl_e2e,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_thumbs": q_multimodal_thumbs,
    "video_frames": q_video_frames,
    "audio_features": q_audio_features,
    "ann_lsh_topk": q_ann_lsh_topk,
    "dns_sweep": q_dns_sweep,
    "bucket_scan": q_bucket_scan,
    "httpscan_matrix": q_httpscan_matrix,
    # -- [4] rotated-out oracle greens (pytest + in-window sibling) --
    # all eight are green in CORRECTNESS_r04; each keeps an in-window
    # sibling exercising the same machinery (sort_wordlist_topk↔
    # report_wordlist, wordlist_extractors↔union_extractors,
    # top_parts_per_brand↔global_topk_two_level+dedup_keep_best
    # (window ranks), cube_orders↔rollup_lineitem, salted_join_skew↔
    # salted_agg_two_level, sample_hash_mod↔stratified_sample,
    # conditional_agg_events↔pricing_summary, join_orders_customers↔
    # shipping_priority (superset join)) and pytest covers every
    # oracle pair (test_queries_oracle runs ALL oracle keys)
    "sort_wordlist_topk": q_sort_wordlist_topk,
    "wordlist_extractors": q_wordlist_extractors,
    "top_parts_per_brand": q_top_parts_per_brand,
    "cube_orders": q_cube_orders,
    "salted_join_skew": q_salted_join_skew,
    "sample_hash_mod": q_sample_hash_mod,
    "conditional_agg_events": q_conditional_agg_events,
    "join_orders_customers": q_join_orders_customers,
}

ORACLES: dict[str, str] = {
    "report_wordlist": SQL_REPORT_WORDLIST,
    "report_query_keys": SQL_REPORT_QUERY_KEYS,
    "sort_wordlist_topk": SQL_SORT_WORDLIST_TOPK,
    "slice_cap": SQL_SLICE_CAP,
    "union_extractors": SQL_UNION_EXTRACTORS,
    "wordlist_extractors": SQL_WORDLIST_EXTRACTORS,
    "anti_join_resume": SQL_ANTI_JOIN_RESUME,
    "cross_join_templates": SQL_CROSS_JOIN_TEMPLATES,
    "filtered_enqueue": SQL_FILTERED_ENQUEUE,
    "window_dequeue": SQL_WINDOW_DEQUEUE,
    "status_classify": SQL_STATUS_CLASSIFY,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "join_orders_customers": SQL_JOIN_ORDERS_CUSTOMERS,
    "salted_join_skew": SQL_SALTED_JOIN_SKEW,
    "global_topk_two_level": SQL_GLOBAL_TOPK_TWO_LEVEL,
    "salted_agg_two_level": SQL_SALTED_AGG_TWO_LEVEL,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "rollup_lineitem": SQL_ROLLUP_LINEITEM,
    "cube_orders": SQL_CUBE_ORDERS,
    "top_parts_per_brand": SQL_TOP_PARTS_PER_BRAND,
    "conditional_agg_events": SQL_CONDITIONAL_AGG_EVENTS,
    "sessionize_events": SQL_SESSIONIZE_EVENTS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "near_dup_lsh_exact": SQL_NEAR_DUP_LSH_EXACT,
    "langid": SQL_LANGID,
    "quality_score": SQL_QUALITY_SCORE,
    "token_count": SQL_TOKEN_COUNT,
    "doc_fingerprint": SQL_FINGERPRINT,
    "chunk_documents": SQL_CHUNK_DOCUMENTS,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "sample_hash_mod": SQL_SAMPLE_HASH_MOD,
    "repetition_filter": SQL_REPETITION_FILTER,
    "contamination_overlap": SQL_CONTAMINATION_OVERLAP,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "pmi_bigrams": SQL_PMI_BIGRAMS,
    "asof_attribution": SQL_ASOF_ATTRIBUTION,
    "range_join_trailing": SQL_RANGE_JOIN_TRAILING,
    "funnel_conversion": SQL_FUNNEL_CONVERSION,
    "domain_mix": SQL_DOMAIN_MIX,
    "training_shards": SQL_TRAINING_SHARDS,
    "pii_scrub": SQL_PII_SCRUB,
    "source_percentiles": SQL_SOURCE_PERCENTILES,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "embedding_norms": SQL_EMBEDDING_NORMS,
    "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
    "cosine_near_dup_lsh": SQL_COSINE_NEAR_DUP_LSH,
    "wordlist_mutator": SQL_WORDLIST_MUTATOR,
    "wordlist_showfile": SQL_WORDLIST_SHOWFILE,
    "wordlist_full": SQL_WORDLIST_FULL,
    "fuzzer_generate": _sql_fuzzer(),
    "fuzzer_random": _sql_fuzzer_random(),
    # crawl_e2e / multimodal_decode / ann_lsh_topk / dns_sweep /
    # bucket_scan / httpscan_matrix: no SQL equivalent (stateful loop /
    # binary codecs / LSH probe / simulated connectors) → rows-only.
}
