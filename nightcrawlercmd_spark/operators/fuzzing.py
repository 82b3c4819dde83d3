"""Seeded deterministic fuzz-case generation (SURVEY.md O79, D10).

The reference fuzzer pins a PRNG seed and draws per-iteration choices
(mainFuzzer.go:87-117; config/fuzzinginput.json: seed 40039, 1000
iterations, BuildLogic "url"). A stateful PRNG doesn't distribute, so
the engine derives every choice from a *counter hash* instead:
choice(i, slot) = md5int(seed, i, slot) mod |options| — identical
results on any partitioning, and expressible in ANSI SQL for the
oracle (md5 is bit-identical across engines).

The vector classes mirror the reference's fuzzing input shape
(Vectors map[string][]string) with our own values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# our own small grammar (shape of D10's Vectors map; values ours)
DEFAULT_VECTORS: dict[str, list[str]] = {
    "scheme": ["http", "https"],
    "host": ["alpha.test", "beta.test", "gamma.test"],
    "path": ["/", "/p/1", "/search", "/a/b/c", "/index"],
    "payload": ["<x>", "'1=1", "%00", "AAAA", "../.."],
}
DEFAULT_SEED = 40039  # reference default, config/fuzzinginput.json:14


def _counter_hash(*parts: str):
    """The fuzzer's counter hash as a Column: first 8 hex chars of
    md5('|'.join(parts + [id])) as a bigint. Single shared
    construction — _pick and _slot_hash both ride on it, and the
    DuckDB oracles mirror it bit-for-bit, so there is exactly one
    place where the hash recipe can drift."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", *[F.lit(p) for p in parts], F.col("id").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")


def _pick(seed: int, slot: str, options: list[str]):
    """Counter-hash choice as a Column: md5int(seed|slot|id) % n."""
    n = len(options)
    idx = F.pmod(_counter_hash(str(seed), slot), F.lit(n))
    expr = F.lit(options[0])
    for i in range(1, n):
        expr = F.when(idx == i, F.lit(options[i])).otherwise(expr)
    return expr


def _validated(vectors, url_slots: bool):
    """Shared grammar validation for all four entry points (generate /
    generate_random and their DuckDB oracle twins — a bad grammar must
    fail the same usable way whichever side sees it first, not with a
    KeyError/IndexError from whichever expression builder trips)."""
    v = vectors or DEFAULT_VECTORS
    if not v:
        raise ValueError("the vector grammar needs at least one class")
    if url_slots:
        missing = {"scheme", "host", "path", "payload"} - set(v)
        if missing:
            raise ValueError(
                f"BuildLogic 'url' needs vector classes {sorted(missing)}; "
                f"got {sorted(v)}"
            )
    if any(not opts for opts in v.values()):
        raise ValueError("every vector class needs at least one option")
    return v


def generate(
    spark: SparkSession,
    iterations: int = 1000,
    seed: int = DEFAULT_SEED,
    vectors: dict[str, list[str]] | None = None,
) -> DataFrame:
    """One fuzz case per iteration: url assembled from hashed choices
    (BuildLogic 'url', mainFuzzer.go:96-117 shape).

    BuildLogic 'url' consumes the scheme/host/path/payload classes; a
    ``vectors`` grammar may carry extra unused classes (the reference's
    Vectors map can too) but must provide those four — a grammar
    without them raised an opaque UNRESOLVED_COLUMN from the final
    projection instead of a usable error."""
    v = _validated(vectors, url_slots=True)
    df = spark.range(iterations).select(F.col("id").cast("bigint").alias("id"))
    for slot in ("scheme", "host", "path", "payload"):
        df = df.withColumn(slot, _pick(seed, slot, v[slot]))
    return df.select(
        "id",
        F.concat(
            F.col("scheme"), F.lit("://"), F.col("host"), F.col("path"),
            F.lit("?q="), F.col("payload"),
        ).alias("fuzz_url"),
    )


def _slot_hash(seed: int, tag: str, y: int):
    """Counter-hash Column for (seed, tag, slot y, row id)."""
    return _counter_hash(str(seed), tag, str(y))


def generate_random(
    spark: SparkSession,
    iterations: int = 1000,
    slots_per_case: int = 4,
    seed: int = DEFAULT_SEED,
    vectors: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Random-key mode (no BuildLogic): the vector CLASS of each slot
    is itself a seeded choice, then a vector within that class
    (mainFuzzer.go:96-101 `keys[rand.Intn(len(keys))]`). Two reference
    quirks are deliberately not reproduced: (a) with empty BuildLogic
    the reference's `iterPerRun = len(fi.BuildLogic)` is 0, so its CLI
    random mode emits empty cases — this API takes an explicit
    ``slots_per_case``; (b) Go map key iteration order is randomized,
    so the reference's key list isn't even stable across its own runs —
    here keys are sorted, and both choices are counter hashes
    (md5int(seed|tag|slot|id)) so the output is deterministic, identical
    under any partitioning, and ANSI-SQL oracle-checkable."""
    v = _validated(vectors, url_slots=False)
    keys = sorted(v)
    df = spark.range(iterations).select(F.col("id").cast("bigint").alias("id"))
    parts = []
    for y in range(slots_per_case):
        kidx = F.pmod(_slot_hash(seed, "k", y), F.lit(len(keys)))
        expr = None
        for i, k in enumerate(keys):
            vecs = v[k]
            vidx = F.pmod(_slot_hash(seed, "v", y), F.lit(len(vecs)))
            inner = F.lit(vecs[0])
            for j in range(1, len(vecs)):
                inner = F.when(vidx == j, F.lit(vecs[j])).otherwise(inner)
            expr = inner if expr is None else F.when(kidx == i, inner).otherwise(expr)
        parts.append(expr)
    return df.select(
        "id", F.concat_ws("|", *parts).alias("fuzz_text")
    )


def oracle_random_sql(
    iterations: int = 1000,
    slots_per_case: int = 4,
    seed: int = DEFAULT_SEED,
    vectors: dict[str, list[str]] | None = None,
) -> str:
    """DuckDB twin of generate_random() — same md5 counter hashes.
    ``vectors`` must match the grammar passed to generate_random (a
    custom grammar checked against the default-vector oracle would
    silently mismatch)."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    def h(tag: str, y: int) -> str:
        return (
            f"cast(('0x' || substr(md5('{seed}|{tag}|{y}|' || "
            f"cast(id as varchar)), 1, 8)) as bigint)"
        )

    v = _validated(vectors, url_slots=False)
    keys = sorted(v)
    parts = []
    for y in range(slots_per_case):
        kh, vh = h("k", y), h("v", y)
        kn = len(keys)
        expr = None
        for i, k in enumerate(keys):
            vecs = v[k]
            n = len(vecs)
            inner = q(vecs[0])
            for j in range(1, n):
                inner = (
                    f"CASE WHEN ({vh} % {n} + {n}) % {n} = {j} "
                    f"THEN {q(vecs[j])} ELSE {inner} END"
                )
            expr = (
                inner
                if expr is None
                else f"CASE WHEN ({kh} % {kn} + {kn}) % {kn} = {i} "
                f"THEN {inner} ELSE {expr} END"
            )
        parts.append(expr)
    joined = " || '|' || ".join(f"({p})" for p in parts)
    return f"""
SELECT id, {joined} AS fuzz_text
FROM (SELECT unnest(generate_series(0, {iterations - 1})) AS id)
"""


def oracle_sql(
    iterations: int = 1000,
    seed: int = DEFAULT_SEED,
    vectors: dict[str, list[str]] | None = None,
) -> str:
    """DuckDB twin of generate() — same md5 counter-hash choices.
    ``vectors`` must match the grammar passed to generate()."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    def pick(slot: str, options: list[str]) -> str:
        n = len(options)
        h = (
            f"cast(('0x' || substr(md5('{seed}|{slot}|' || cast(id as varchar)), 1, 8)) as bigint)"
        )
        expr = q(options[0])
        for i in range(1, n):
            expr = f"CASE WHEN ({h} % {n} + {n}) % {n} = {i} THEN {q(options[i])} ELSE {expr} END"
        return expr

    v = _validated(vectors, url_slots=True)
    return f"""
SELECT id,
  {pick('scheme', v['scheme'])} || '://' || {pick('host', v['host'])} ||
  {pick('path', v['path'])} || '?q=' || {pick('payload', v['payload'])} AS fuzz_url
FROM (SELECT unnest(generate_series(0, {iterations - 1})) AS id)
"""
