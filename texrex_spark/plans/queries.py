"""Driver-contract query suite: every operator exposed as a (Spark, SQL) pair.

Each entry runs the Spark-native implementation of one SURVEY.md §2
operator over the driver's test tables and carries an ANSI-SQL oracle that
DuckDB executes on the same parquet — the driver compares row counts,
schemas, and value hashes (CORRECTNESS_r{N}.json).

Conventions that keep the comparison honest:
- every computed column is aliased identically on both sides;
- floats are rounded (4 dp) on both sides before comparison;
- sums over ints are cast to BIGINT on both sides (DuckDB widens to
  HUGEINT otherwise);
- deterministic ORDER-insensitive output (the driver sorts), ties broken
  by explicit keys inside window ranks.

The portable MinHash here hashes with md5 (shared by Spark and DuckDB) and
takes lexicographic minima of hex digests — a valid min-wise family for
correctness checking.  The *engine* MinHash used for reference parity is
the Rabin-64 kernel (functions/rabin.py, trshingler.pas:97-150); it is
exercised by pytest, not by this oracle suite.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

Query = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, Query] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn: Query) -> Query:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Classic relational operators (SURVEY.md §2.7 checklist)
# ---------------------------------------------------------------------------


@_register(
    "q_agg_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT)                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                    AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4)                         AS avg_qty,
           COUNT(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing(spark, sf_dir):
    """Hash aggregation with partial (map-side) combine — the tender
    pair-count aggregation pattern (trtenderapplication.pas:549-632)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "q_join_topk",
    """
    SELECT n.n_name AS nation,
           ROUND(SUM(o.o_totalprice), 2) AS revenue,
           COUNT(*) AS orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    LIMIT 5
    """,
)
def q_join_topk(spark, sf_dir):
    """Equi-joins with a broadcast dim + distributed top-k (sort+limit =
    TakeOrderedAndProject, the tecl/tender join family, SURVEY.md §2.5)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("orders"),
        )
        .orderBy(F.desc("revenue"), "nation")
        .limit(5)
    )


@_register(
    "q_window_running",
    """
    SELECT event_id, user_id, value,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
             AS running_value,
           ROUND(value - COALESCE(lag(value) OVER
             (PARTITION BY user_id ORDER BY ts, event_id), 0), 2) AS delta
    FROM events
    WHERE user_id < 50
    """,
)
def q_window_running(spark, sf_dir):
    """Window functions: running sum + lag, the deboilerplater's ±k-div
    smoothing pattern re-expressed relationally (trdeboilerplater.pas:540-616)."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0)), 2).alias(
            "delta"
        ),
    )


@_register(
    "q_stream_tumbling",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(AVG(value), 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark, sf_dir):
    """Tumbling-window aggregation — the batch-equivalent plan of the
    Structured-Streaming variant (readStream + window()); the crawl loop's
    per-round metrics roll up the same way (SURVEY.md §2.7 streaming)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))


@_register(
    "q_range_join_catalyst",
    """
    WITH blocks AS (
      SELECT CAST(i AS BIGINT) AS loc_id,
             CAST(i * 1000 AS BIGINT) AS lower_b,
             CAST((i + 1) * 1000 AS BIGINT) AS upper_b
      FROM (SELECT unnest(generate_series(0, 99)) AS i)
    ), points AS (
      SELECT event_id, (event_id * 37) % 100000 AS ipnum FROM events
    )
    SELECT b.loc_id, COUNT(*) AS n_points
    FROM points p JOIN blocks b
      ON p.ipnum >= b.lower_b AND p.ipnum < b.upper_b
    GROUP BY b.loc_id
    """,
)
def q_range_join_catalyst(spark, sf_dir):
    """Catalyst twin of the geolocation range join (trgeolocator.pas:
    116-173).  Blocks are broadcast; Catalyst plans a BroadcastNestedLoop
    over the interval predicate, the right physical choice for a small
    sorted dim.  The ENGINE path (np.searchsorted over broadcast sorted
    blocks, clean/geo.py) is the driver-verified q_range_join; this twin
    stays pytest-pinned in EXTRA_QUERIES."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", (F.col("event_id") * 37 % 100000).alias("ipnum")
    )
    blocks = spark.range(0, 100).select(
        F.col("id").alias("loc_id"),
        (F.col("id") * 1000).alias("lower_b"),
        ((F.col("id") + 1) * 1000).alias("upper_b"),
    )
    return (
        ev.join(
            F.broadcast(blocks),
            (ev.ipnum >= blocks.lower_b) & (ev.ipnum < blocks.upper_b),
        )
        .groupBy("loc_id")
        .agg(F.count("*").alias("n_points"))
    )


# ---------------------------------------------------------------------------
# Crawl-domain operators over deterministically derived tables
# ---------------------------------------------------------------------------

# Messy URLs derived from the documents table; both engines build the same
# strings, then OUR canonicalizer must produce the normative form.

_URL_DERIVE_SQL = """
  SELECT doc_id,
         'HTTP://Site' || CAST(doc_id % 37 AS VARCHAR) ||
         '.Example.COM:80/p/' || CAST(doc_id AS VARCHAR) || '?q=1#frag' AS url
  FROM documents
"""


def _url_derive(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTP://Site"),
            (F.col("doc_id") % 37).cast("string"),
            F.lit(".Example.COM:80/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?q=1#frag"),
        ).alias("url"),
    )


@_register(
    "q_url_canonicalize",
    f"""
    WITH urls AS ({_URL_DERIVE_SQL})
    SELECT doc_id,
           'http://site' || CAST(doc_id % 37 AS VARCHAR) ||
           '.example.com/p/' || CAST(doc_id AS VARCHAR) || '?q=1' AS url_norm,
           'site' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' AS host,
           'com' AS tld,
           '/p/' || CAST(doc_id AS VARCHAR) AS path
    FROM urls
    """,
)
def q_url_canonicalize(spark, sf_dir):
    """URL canonicalization (north-star mandate; host/TLD semantics
    trutilities.pas:393-405): lowercase scheme+host, strip default port,
    drop fragment.  The oracle states the expected output literally, so
    this checks the operator, not a shared bug."""
    from ..functions import urlnorm

    urls = _url_derive(spark, sf_dir)
    canon = urlnorm.canonicalize_col(F.col("url"))
    return urls.select(
        "doc_id",
        canon.alias("url_norm"),
        urlnorm.extract_host_col(canon).alias("host"),
        urlnorm.extract_tld_col(urlnorm.extract_host_col(canon)).alias("tld"),
        urlnorm.extract_path_col(canon).alias("path"),
    )


@_register(
    "q_robots_gate",
    """
    WITH frontier AS (
      SELECT doc_id,
             'site' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' AS host,
             '/p/' || CAST(doc_id AS VARCHAR) AS path
      FROM documents
    ), robots AS (
      SELECT 'site' || CAST(h AS VARCHAR) || '.example.com' AS host,
             (h % 4 = 0) AS has_robots,
             CASE WHEN h % 4 = 0 THEN ['/p/1', '/private'] ELSE [] END
               AS disallow_prefixes
      FROM (SELECT unnest(generate_series(0, 36)) AS h)
    )
    SELECT f.doc_id, f.host, f.path
    FROM frontier f LEFT JOIN robots r ON f.host = r.host
    WHERE r.has_robots IS NULL OR NOT r.has_robots
       OR NOT EXISTS (
            SELECT 1 FROM unnest(r.disallow_prefixes) AS t(p)
            WHERE starts_with(f.path, p))
    """,
)
def q_robots_gate(spark, sf_dir):
    """robots.txt gating via broadcast-joined rule table + JVM-side
    prefix-exists (trpoliteness.pas:333-349)."""
    from ..operators.robots import gate_frontier

    frontier = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("site"), (F.col("doc_id") % 37).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.concat(F.lit("/p/"), F.col("doc_id").cast("string")).alias("path"),
    )
    robots = spark.range(0, 37).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".example.com")).alias(
            "host"
        ),
        (F.col("id") % 4 == 0).alias("has_robots"),
        F.when(F.col("id") % 4 == 0, F.array(F.lit("/p/1"), F.lit("/private")))
        .otherwise(F.array().cast("array<string>"))
        .alias("disallow_prefixes"),
    )
    return gate_frontier(frontier, robots).select("doc_id", "host", "path")


@_register(
    "q_politeness_admit",
    """
    WITH frontier AS (
      SELECT doc_id,
             'site' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' AS host,
             doc_id AS priority,
             CAST(5 + (doc_id % 37) % 7 AS BIGINT) AS delay
      FROM documents
    ), r1 AS (
      SELECT doc_id, host, priority, delay,
             row_number() OVER (PARTITION BY host ORDER BY priority) AS host_rank
      FROM frontier
    ), a1 AS (
      SELECT doc_id, host, host_rank, delay,
             CAST((host_rank - 1) * delay AS BIGINT) AS fetch_time
      FROM r1 WHERE host_rank <= 60 / delay
    ), hs2 AS (
      SELECT host, MAX(fetch_time) AS last_access FROM a1 GROUP BY host
    ), f2 AS (
      SELECT f.* FROM frontier f
      LEFT JOIN a1 ON f.doc_id = a1.doc_id
      WHERE a1.doc_id IS NULL
    ), r2 AS (
      SELECT f2.doc_id, f2.host, f2.delay, hs2.last_access,
             row_number() OVER (PARTITION BY f2.host ORDER BY f2.priority)
               AS host_rank
      FROM f2 JOIN hs2 ON f2.host = hs2.host
    ), a2 AS (
      SELECT doc_id, host, host_rank,
             CAST(greatest(last_access + delay, 30)
                  + (host_rank - 1) * delay AS BIGINT) AS fetch_time
      FROM r2
      WHERE host_rank <= 60 / delay
        AND greatest(last_access + delay, 30) + (host_rank - 1) * delay < 90
    )
    SELECT 1 AS round, doc_id, host, host_rank, fetch_time FROM a1
    UNION ALL
    SELECT 2 AS round, doc_id, host, host_rank, fetch_time FROM a2
    """,
)
def q_politeness_admit(spark, sf_dir):
    """TWO politeness rounds so the host REGISTRY is load-bearing: round 1
    admits from a fresh registry (trpoliteness.pas:320-362 ->
    operators/politeness.admit); advance_host_state folds the admitted
    fetch times back into (host, last_access, crawl_delay); round 2 opens
    at now=30 — inside round 1's tail — so its fetch times start at
    greatest(last_access + delay, 30), i.e. they are wrong unless the
    registry fold is right (TTrPolitenessManager host map,
    trpoliteness.pas + frontier.py:316)."""
    from ..operators.politeness import admit, advance_host_state

    frontier = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("site"), (F.col("doc_id") % 37).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.col("doc_id").alias("priority"),
    ).withColumn("url_norm", F.col("doc_id").cast("string"))
    host_state = frontier.select("host").distinct().select(
        "host",
        F.lit(-1).cast("long").alias("last_access"),
        (
            F.lit(5)
            + F.regexp_extract("host", r"site(\d+)\.", 1).cast("int") % 7
        ).alias("crawl_delay"),
    )
    a1 = admit(
        frontier, host_state, min_politeness=1, round_seconds=60, now=0
    )
    hs2 = advance_host_state(host_state, a1)
    f2 = frontier.join(a1.select("doc_id"), "doc_id", "left_anti")
    a2 = admit(f2, hs2, min_politeness=1, round_seconds=60, now=30)
    cols = lambda rnd, df: df.select(  # noqa: E731
        F.lit(rnd).alias("round"),
        "doc_id",
        "host",
        "host_rank",
        F.col("fetch_time").cast("bigint").alias("fetch_time"),
    )
    return cols(1, a1).unionAll(cols(2, a2))


@_register(
    "q_frontier_dedup",
    """
    WITH seen AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
    SELECT d.doc_id, d.n_chars
    FROM documents d
    LEFT JOIN seen s ON d.doc_id = s.doc_id
    WHERE s.doc_id IS NULL
    """,
)
def q_frontier_dedup(spark, sf_dir):
    """URL-seen check+add through the REAL partitioned scaling-bloom set
    (operators/seenset.py; trwalkers.pas:826-845), with the GROWTH path
    forced: 40k synthetic volume URLs overflow each bucket's initial
    capacity (error_rate 1e-4 -> 10k members), so the scaling chain
    (TTrScalingBloomFilter, trbloom.pas:449-582) must append filters —
    asserted via the bloom_scalings lineage column.  The probe is then
    exact against the SQL anti-join oracle: blooms have no false
    negatives, and the false-positive expectation on the 333 unseen doc
    URLs is 333 * 1e-4 ~ 0.03 (deterministic fixture, verified
    empirically, stable across runs)."""
    import tempfile

    from ..operators.seenset import PartitionedSeenSet

    docs = _t(spark, sf_dir, "documents")
    seen = PartitionedSeenSet(
        tempfile.mkdtemp(prefix="texrex-bloomgrow-"),
        partitions=2,
        error_rate=1e-4,
    )
    volume = spark.range(40_000).select(
        F.concat(F.lit("http://vol.example/u"), F.col("id").cast("string")).alias(
            "url_norm"
        )
    )
    grown = seen.check_and_add(volume).agg(F.max("bloom_scalings")).collect()[0][0]
    assert grown >= 1, "scaling bloom never grew; growth path not exercised"
    urls = docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("http://h"), (F.col("doc_id") % 97).cast("string"),
            F.lit(".example/p"), F.col("doc_id").cast("string"),
        ).alias("url_norm"),
    )
    seen.check_and_add(urls.where(F.col("doc_id") % 3 == 0)).count()
    return (
        seen.probe(urls)
        .where(~F.col("seen"))
        .select("doc_id", "n_chars")
    )


@_register(
    "q_link_relation",
    """
    WITH pairs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'www.blog' ELSE 'forum' END ||
               '.site' || CAST(doc_id % 11 AS VARCHAR) || '.de' AS src_host,
             CASE WHEN doc_id % 2 = 0 THEN 'www.blog' ELSE 'shop' END ||
               '.site' || CAST(doc_id % 7 AS VARCHAR) || '.de' AS dst_host
      FROM documents
    )
    SELECT doc_id, src_host, dst_host,
      CASE
        WHEN src_host = dst_host THEN 'trlSameFullHost'
        WHEN (string_split(src_host, '.'))[-1] = (string_split(dst_host, '.'))[-1]
         AND (string_split(src_host, '.'))[-2] = (string_split(dst_host, '.'))[-2]
        THEN 'trlSameNonVirtualHost'
        ELSE 'trlDifferentHosts'
      END AS relation
    FROM pairs
    """,
)
def q_link_relation(spark, sf_dir):
    """Link relation classification (trutilities.pas:420-471): same full
    host / same non-virtual host (last two segments) / different."""
    from ..functions.urlnorm import link_relation_col

    pairs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("www.blog")).otherwise(
                F.lit("forum")
            ),
            F.lit(".site"),
            (F.col("doc_id") % 11).cast("string"),
            F.lit(".de"),
        ).alias("src_host"),
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("www.blog")).otherwise(
                F.lit("shop")
            ),
            F.lit(".site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".de"),
        ).alias("dst_host"),
    )
    return pairs.select(
        "doc_id",
        "src_host",
        "dst_host",
        link_relation_col(F.col("src_host"), F.col("dst_host")).alias("relation"),
    )


# ---------------------------------------------------------------------------
# Deduplication family (SURVEY.md §2.5 + training-data ops)
# ---------------------------------------------------------------------------


@_register(
    "q_dedup_exact",
    """
    WITH ranked AS (
      SELECT doc_id, md5(text) AS text_hash,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, text_hash FROM ranked WHERE rn = 1
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Perfect-duplicate removal, keep-first-by-id (trduplicatedetector.pas:
    114-122 — content fingerprint into a seen-set; exact variant)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# Portable MinHash: 8 md5-keyed min-wise functions over 5-token shingles.
_SHINGLE_SQL = """
  WITH tokarr AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  ), toks AS (
    SELECT doc_id, u.i AS pos, ts[u.i] AS tok
    FROM tokarr, unnest(generate_series(1, len(ts))) AS u(i)
  ), sh AS (
    SELECT doc_id,
           tok || lead(tok, 1) OVER w || lead(tok, 2) OVER w ||
           lead(tok, 3) OVER w || lead(tok, 4) OVER w AS shingle
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    QUALIFY lead(tok, 4) OVER w IS NOT NULL
  )
"""

_MINHASH_SQL = (
    _SHINGLE_SQL
    + """
  , hashes AS (
    SELECT doc_id, j.j AS j,
           min(substr(md5(CAST(j.j AS VARCHAR) || ':' || shingle), 1, 15)) AS minhash
    FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) j
    GROUP BY doc_id, j.j
  )
"""
)


def _shingles(spark, sf_dir):
    """(doc_id, shingle) rows — shingle i = tokens[i..i+4] concatenated.

    r06: built by exploding a 0-based position sequence over the token
    array instead of posexplode + four window leads; identical multiset of
    rows, but the window's Exchange + per-doc sort disappear (guide §2.4)
    — measured 1.28 s -> 0.77 s for the shingle stream at sf1.0."""
    t = F.split("text", " ")
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", t.alias("t"))
        .where(F.size("t") >= 5)
        .select("doc_id", "t", F.posexplode(F.expr("sequence(0, size(t)-5)")))
    )
    return d.select(
        "doc_id",
        F.concat(
            F.col("t")[F.col("col")],
            F.col("t")[F.col("col") + 1],
            F.col("t")[F.col("col") + 2],
            F.col("t")[F.col("col") + 3],
            F.col("t")[F.col("col") + 4],
        ).alias("shingle"),
    )


_MINHASH_PREFIXES = [f"{j}:".encode() for j in range(8)]


def _md5_minhash8(text: str) -> list[str] | None:
    """Portable 8-function MinHash of one document: min over the 5-token
    shingles of the first 15 md5 hex digits of f"{j}:{shingle}" — exactly
    the quantity the SQL oracle derives.  Minima are taken on the raw
    8-byte digest prefix (64-bit big-endian compare == lexicographic hex
    compare; the low nibble beyond bit 60 never changes the >>4 result)
    and formatted to 15 hex digits once at the end."""
    from hashlib import md5

    toks = text.split(" ")
    n = len(toks) - 4
    if n < 1:
        return None
    best = [b"\xff" * 9] * 8
    for i in range(n):
        e = "".join(toks[i : i + 5]).encode("utf-8")
        for j in range(8):
            d = md5(_MINHASH_PREFIXES[j] + e).digest()[:8]
            if d < best[j]:
                best[j] = d
    return [format(int.from_bytes(d, "big") >> 4, "015x") for d in best]


def _minhash_docs(spark, sf_dir, with_size: bool = False):
    """Per-document portable-MinHash signatures through ONE map-only Arrow
    stage: (doc_id [, doc_size], mh array<string> of the 8 minima).

    r06 rewrite (guide §2.4 "remove shuffles outright" + §4.2): the old
    derivation was posexplode -> window lead (Exchange + sort on ~50x the
    doc count) -> crossJoin x8 (8x the shingle rows through md5) ->
    groupBy(doc_id, j) (second Exchange).  All of it is a per-document
    computation, so it now runs inside mapInPandas with zero Exchanges;
    the md5 minima are bit-identical (oracle-checked).  Docs with < 5
    tokens emit nothing, matching the old lead-4-not-null filter."""
    from typing import Iterator

    docs = _t(spark, sf_dir, "documents")
    cols = ["doc_id", "text"] + (["n_chars"] if with_size else [])
    schema = (
        "doc_id bigint"
        + (", doc_size bigint" if with_size else "")
        + ", mh array<string>"
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"]}
            if with_size:
                out["doc_size"] = pdf["n_chars"]
            out["mh"] = [_md5_minhash8(t) for t in pdf["text"]]
            res = pd.DataFrame(out)
            yield res[res["mh"].notna()]

    # The documents table is a single small parquet file at bench scale, so
    # the scan is 1-2 tasks; without a redistribution the kernel would run
    # on one core.  Hash-repartition on doc_id (deterministic, no
    # sort-before-repartition cost — guide §2.5) to the session's
    # parallelism; the shuffle moves only (doc_id, text), a few MB.
    n_parts = spark.sparkContext.defaultParallelism
    return docs.select(*cols).repartition(n_parts, "doc_id").mapInPandas(work, schema)


def _minhash(spark, sf_dir):
    sig = _minhash_docs(spark, sf_dir)
    return sig.select("doc_id", F.posexplode("mh").alias("j", "minhash")).select(
        "doc_id", F.col("j").cast("int").alias("j"), "minhash"
    )


@_register("q_minhash_signature", _MINHASH_SQL + "SELECT doc_id, j, minhash FROM hashes")
def q_minhash_signature(spark, sf_dir):
    """MinHash signatures: w-shingling with 5-token n-grams, min per hash
    function (trshingler.pas:97-150).  Portable md5 family; the bit-exact
    Rabin family is the engine path (tests/test_shingler.py)."""
    return _minhash(spark, sf_dir)


_PAIRS_SQL = (
    _MINHASH_SQL
    + """
  , buckets AS (
    SELECT j, minhash, list(doc_id ORDER BY doc_id) AS ids
    FROM hashes GROUP BY j, minhash
    HAVING count(*) BETWEEN 2 AND 200
  ), pairs AS (
    SELECT a.x AS doc_a, b.x AS doc_b
    FROM buckets, unnest(ids) AS a(x), unnest(ids) AS b(x)
    WHERE a.x < b.x
  )
"""
)


@_register(
    "q_neardup_pairs",
    _PAIRS_SQL
    + """
    SELECT doc_a, doc_b, COUNT(*) AS shared
    FROM pairs GROUP BY doc_a, doc_b HAVING COUNT(*) >= 3
    """,
)
def q_neardup_pairs(spark, sf_dir):
    """tender pair generation + threshold: docs sharing >= 3 of 8 minhashes
    (scaled from >=5 of 100, trtenderapplication.pas:146), redundancy cap
    200 per bucket (trshinglehelpers.pas:436-438) — the explicit hot-key
    guard for the groupBy."""
    mh = _minhash(spark, sf_dir)
    buckets = (
        mh.groupBy("j", "minhash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids").between(2, 200))
    )
    pairs = (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
    )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= 3)
    )


@_register(
    "q_neardup_survivors",
    _MINHASH_SQL
    + """
  , prior AS (SELECT doc_id FROM documents WHERE doc_id % 37 = 1)
  , kept AS (
    SELECT h.* FROM hashes h LEFT JOIN prior p ON h.doc_id = p.doc_id
    WHERE p.doc_id IS NULL
  ), buckets AS (
    SELECT j, minhash, list(doc_id ORDER BY doc_id) AS ids
    FROM kept GROUP BY j, minhash
    HAVING count(*) BETWEEN 2 AND 200
  ), pairs AS (
    SELECT a.x AS doc_a, b.x AS doc_b
    FROM buckets, unnest(ids) AS a(x), unnest(ids) AS b(x)
    WHERE a.x < b.x
  ), counted AS (
    SELECT doc_a, doc_b FROM pairs GROUP BY doc_a, doc_b HAVING COUNT(*) >= 3
  ), blacklist AS (
    SELECT DISTINCT x AS doc_id FROM (
      SELECT CASE WHEN a.n_chars < b.n_chars THEN doc_a
                  WHEN a.n_chars > b.n_chars THEN doc_b
                  WHEN doc_a < doc_b THEN doc_a ELSE doc_b END AS x
      FROM counted
      JOIN documents a ON a.doc_id = doc_a
      JOIN documents b ON b.doc_id = doc_b)
  )
  SELECT d.doc_id, d.lang FROM documents d
  LEFT JOIN blacklist bl ON d.doc_id = bl.doc_id
  LEFT JOIN prior p ON d.doc_id = p.doc_id
  WHERE bl.doc_id IS NULL AND p.doc_id IS NULL
    """,
)
def q_neardup_survivors(spark, sf_dir):
    """The full tender + tecl pipeline through the OPERATOR functions:
    prior-blacklist pre-filter (docs already blacklisted by an earlier run
    are excluded before grouping, trtenderapplication.pas:383-387), pair
    generation with the 200-redundancy cap, blacklist (smaller doc loses,
    trtenderapplication.pas:549-632), then the tecl anti-join against
    prior + new blacklists (trteclapplication.pas:255-369).  The prior
    set is the deterministic doc_id % 37 == 1 slice, so the pre-filter's
    effect on bucket contents is observable in the oracle."""
    from ..operators.neardup import tecl, tender

    docs = _t(spark, sf_dir, "documents")
    # doc(doc_id, fingerprint, doc_size) shape tender consumes; tag each
    # minhash with its hash index so tender's by-value bucketing equals
    # the oracle's (j, minhash) grouping exactly.  r06: the fingerprint
    # array and doc_size come straight out of the map-only signature stage
    # (_minhash_docs carries n_chars through), deleting the old
    # groupBy(doc_id).collect_list Exchange AND the join back to documents
    # (guide §2.4) — tender's first shuffle is now the bucket groupBy.
    fp = _minhash_docs(spark, sf_dir, with_size=True).select(
        "doc_id",
        F.expr(
            "transform(mh, (m, j) -> concat(cast(j as string), ':', m))"
        ).alias("fingerprint"),
        "doc_size",
    )
    prior = docs.where(F.col("doc_id") % 37 == 1).select("doc_id")
    bl = tender(fp, min_shared=3, max_redundancy=200, prior_blacklist=prior)
    return tecl(docs, bl.unionByName(prior)).select("doc_id", "lang")


@_register(
    "q_ngram_jaccard",
    _SHINGLE_SQL
    + """
  , sets AS (SELECT doc_id, shingle FROM sh GROUP BY doc_id, shingle),
  sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM sets a JOIN sets b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  )
  SELECT doc_a, doc_b,
         ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
    """,
)
def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup (the quantity MinHash estimates;
    doc/texrex manual w-shingling) via shingle-set self-join."""
    sets = _shingles(spark, sf_dir).distinct()
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sets.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sets.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Text analysis (training-data ops; texrex assessment/tokenizer family)
# ---------------------------------------------------------------------------


@_register(
    "q_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
                 len(string_split(text, ' ')), 4) AS ttr
    FROM documents
    """,
)
def q_token_stats(spark, sf_dir):
    """Type/token counting (TTrTypeTokenData, trdata.pas:69-121)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_types"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 4
        ).alias("ttr"),
    )


@_register(
    "q_top_tokens",
    """
    WITH toks AS (
      SELECT t.tok FROM documents, unnest(string_split(text, ' ')) AS t(tok)
    ), counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok)
    SELECT tok, n, CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rnk
    FROM counts
    ORDER BY rnk LIMIT 20
    """,
)
def q_top_tokens(spark, sf_dir):
    """Top-k token output (TrWriteTokens, trwritetools.pas:274-310):
    explode + count + rank window + limit."""
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "tok")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .orderBy("rnk")
        .limit(20)
    )


_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "on", "for"]


@_register(
    "q_quality_score",
    f"""
    WITH feats AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains({_STOPWORDS!r}, t))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
           ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS avg_token_len,
           (n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens >= 0.05)
             AS passes
    FROM feats
    """,
)
def q_quality_score(spark, sf_dir):
    """Text-quality scoring: stopword-profile deviation gate — the
    TTrTextAssessment shape (trtextassessment.pas:210-260) on simple,
    portable features."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_tokens = F.size(toks)
    ratio = n_stop.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        F.round(ratio, 4).alias("stopword_ratio"),
        F.round(F.col("n_chars").cast("double") / n_tokens, 4).alias("avg_token_len"),
        ((n_tokens >= 20) & (ratio >= 0.05)).alias("passes"),
    )


_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "los", "que"],
}


@_register(
    "q_langid",
    f"""
    WITH scores AS (
      SELECT doc_id,
        len(list_filter(string_split(text,' '), t -> list_contains({_LANG_PROFILES['en']!r}, t))) AS s_en,
        len(list_filter(string_split(text,' '), t -> list_contains({_LANG_PROFILES['de']!r}, t))) AS s_de,
        len(list_filter(string_split(text,' '), t -> list_contains({_LANG_PROFILES['es']!r}, t))) AS s_es
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
           WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred_lang
    FROM scores
    """,
)
def q_langid(spark, sf_dir):
    """Language ID by profile-hit argmax — the multi-language assessment's
    keep-argmin-badness shape (trtextassessment.pas:127-165)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def score(lang):
        arr = F.array(*[F.lit(s) for s in _LANG_PROFILES[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    s_en, s_de, s_es = score("en"), score("de"), score("es")
    return docs.select(
        "doc_id",
        F.when((s_en >= s_de) & (s_en >= s_es), F.lit("en"))
        .when(s_de >= s_es, F.lit("de"))
        .otherwise(F.lit("es"))
        .alias("pred_lang"),
    )


# ---------------------------------------------------------------------------
# Embedding similarity (training-data ops)
# ---------------------------------------------------------------------------


@_register(
    "q_ann_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT q.qid, e.vec_id,
             ROUND(list_cosine_similarity(q.qv, e.embedding), 4) AS cos
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id != q.qid
    )
    SELECT qid, vec_id, cos FROM (
      SELECT qid, vec_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-k: the exact baseline for ANN (JVM-side
    zip_with/aggregate dot product; the LSH-bucketed scale path reuses the
    minhash bucketing machinery)."""
    # single-file scan = 1 task: without the repartition every interpreted
    # dot product of the crossJoin runs on one core (guide §2.5/§6 —
    # measured 4x on the IVF twin; the shuffle moves ~10 MB of vectors)
    emb = (
        _t(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda a: F.sqrt(dot(a, a))  # noqa: E731
    # norms are computed once per side instead of inside the crossJoin
    # projection (identical expression on identical data, so identical
    # IEEE values; 3 interpreted folds per joined row -> 1; guide §1.2)
    c = emb.select("vec_id", "v", norm(F.col("v")).alias("_cn"))
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        norm(F.col("v")).alias("_qn"),
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("_qn") * F.col("_cn")), 4
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5).drop("rn")
    )


@_register(
    "q_embedding_neardup",
    """
    WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
    twin AS (
      SELECT vec_id + 1000 AS vec_id,
             list_transform(embedding, x -> x + 0.02) AS embedding
      FROM base
    ), sub AS (SELECT * FROM base UNION ALL SELECT * FROM twin)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.9
    """,
)
def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate detection through the banded
    sign-LSH pruning path (similarity.lsh_neardup) — candidate pairs come
    from (band, signature) bucket joins, never an all-pairs product, then
    exact cosine re-ranks.  This IS the plan a 100 TB run uses.

    The fixture plants a +0.02-shifted twin of every base vector
    (cos ~ 0.988 vs a 0.41 max among non-twins), and the oracle is the
    EXACT all-pairs SQL — so the row only matches if LSH recall on the
    planted twins is 1.0 (precision is 1.0 by construction: the re-rank
    is exact).  At 16 bands x 6 bits a cos-0.988 pair misses all bands
    with p ~ 5e-10; with the pinned seed the outcome is deterministic.
    test_plans pins the no-crossJoin shape of this row."""
    from ..operators.similarity import lsh_neardup

    base = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    twin = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.02)).alias("v"),
    )
    emb = base.unionByName(twin)
    pairs = lsh_neardup(
        emb, dim=64, bands=16, bits=6, threshold=0.9,
        vec_col="v", id_col="vec_id", seed=42,
    )
    return pairs.select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))


# ---------------------------------------------------------------------------
# Engine-native operators exposed to the driver gate
# ---------------------------------------------------------------------------


@_register(
    "q_clean_chain",
    """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'text' AS kind, text,
           0 AS offset, TRUE AS valid
    FROM documents
    """,
)
def q_clean_chain(spark, sf_dir):
    """End-to-end cleaning chain over HTML-wrapped documents.  The oracle
    states the invariant: wrapping clean text in <body><p>...</p></body>
    and running the FULL chain (strip -> entities -> validate -> normalize
    -> NFC -> div-dedup) must reproduce the text byte-for-byte as a single
    span (trworker.pas:417-649 ordering)."""
    from pyspark.sql import functions as F

    from ..clean.chain import ChainConfig, clean_docs

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("http://docs.example/"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.concat(
            F.lit("<html><head><title>t</title></head><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("raw_html"),
    )
    cleaned = clean_docs(
        docs, ChainConfig(use_assessment=False, use_shingler=False)
    )
    return cleaned.select(
        "doc_id", F.explode("spans").alias("s"), "valid"
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.offset").alias("offset"),
        "valid",
    )


_SIMHASH_WS = "[ \\t\\n\\r\\f]+"  # same class on both engines (Java \\s adds \\x0B, RE2 doesn't)


@_register(
    "q_simhash_neardup",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(string_split_regex(text, '{_SIMHASH_WS}')) AS t
            FROM documents)
      WHERE t <> ''
    ),
    votes AS (
      SELECT doc_id, j, SUM(2 * ((h >> j) & 1) - 1) AS vote
      FROM toks, (SELECT unnest(generate_series(0, 59)) AS j)
      GROUP BY doc_id, j
    ),
    sh AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j)
                           ELSE 0 END) AS BIGINT) AS sh
      FROM votes GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, sh, i AS band, (sh >> (i * 16)) & 65535 AS key
      FROM sh, (SELECT unnest(generate_series(0, 3)) AS i)
    ),
    sized AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.sh, b.sh)) AS hamming
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.key = b.key
                  AND a.doc_id < b.doc_id
      JOIN sized s ON s.band = a.band AND s.key = a.key
      WHERE s.n BETWEEN 2 AND 200
    )
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 8
    """,
)
def q_simhash_neardup(spark, sf_dir):
    """SimHash near-duplicate pairs over the documents table (Charikar
    sketch, banded Hamming join via the ENGINE hamming_neardup operator,
    operators/textops.py).  The simhash here is the portable md5 twin —
    60-bit token hashes from md5 prefixes, +-1 bit votes, pure Catalyst
    (explode -> one partial-agg groupBy -> bit assembly, no UDF) — so
    DuckDB can mirror the ENTIRE derivation including the band join,
    bucket cap, and popcount filter.  The engine's Rabin simhash kernel
    stays pinned separately by q_simhash_engine's snapshot oracle."""
    from pyspark.sql import functions as F

    from ..operators.textops import hamming_neardup, simhash_md5_udf

    # r06 (guide §2.4 + §4.2): the signature derivation used to be
    # explode(tokens) -> Exchange -> groupBy(doc_id) with 61 aggregation
    # buffers (count + 60 bit sums) — a full shuffle of every token row
    # for a per-document quantity.  It is now ONE map-only Arrow stage
    # (textops.simhash_md5_batch: batched md5 + numpy bit-plane votes,
    # bit-identical by the same 2*sum(bit) > n identity, oracle-checked);
    # token-less docs yield NULL and are filtered, matching the old
    # no-rows-after-explode behaviour.  2.1 s -> 0.8 s for the signature
    # stage at sf0.1; the banded Hamming join below is unchanged.
    docs = _t(spark, sf_dir, "documents")
    # single-file scan -> 1 task; spread the Arrow kernel over the session
    # parallelism first (deterministic hash repartition, guide §2.5)
    sh = (
        docs.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", simhash_md5_udf()(F.col("text")).alias("simhash"))
        .where(F.col("simhash").isNotNull())
    )
    # no trailing orderBy: the driver's comparison is order-insensitive
    # (it sorts both sides), and the global sort was a whole extra
    # range-partition Exchange over the full pair set (guide §2.4)
    return hamming_neardup(sh, max_distance=8)


@_register(
    "q_range_join",
    ORACLE_SQL["q_range_join_catalyst"],  # same derivation, same expected output
)
def q_range_join(spark, sf_dir):
    """The ENGINE range join (clean/geo.py: broadcast sorted blocks +
    np.searchsorted in mapInPandas, trgeolocator.pas:134-171) — checked
    against the identical SQL oracle, proving the custom kernel equals the
    relational semantics.  This is the driver-verified geolocator row; the
    Catalyst BNLJ twin is q_range_join_catalyst (EXTRA_QUERIES)."""
    from pyspark.sql import functions as F

    from ..clean.geo import GeoBlocks, geolocate

    ev = _t(spark, sf_dir, "events").select(
        "event_id", (F.col("event_id") * 37 % 100000).alias("ipnum")
    )
    # ipnum -> dotted IPv4 so the geolocator's ip_to_int path is exercised
    ip = F.concat_ws(
        ".",
        (F.col("ipnum") / 16777216).cast("int").cast("string"),
        (F.col("ipnum") / 65536 % 256).cast("int").cast("string"),
        (F.col("ipnum") / 256 % 256).cast("int").cast("string"),
        (F.col("ipnum") % 256).cast("string"),
    )
    # single-file events scan = 1-2 tasks; fan the Arrow kernel out over
    # the session parallelism first (deterministic hash repartition on the
    # key column — guide §2.5; same fix as the minhash/simhash kernels)
    points = ev.select("event_id", ip.alias("ip")).repartition(
        spark.sparkContext.defaultParallelism, "event_id"
    )
    blocks = GeoBlocks(
        lowers=[i * 1000 for i in range(100)],
        uppers=[(i + 1) * 1000 - 1 for i in range(100)],  # [lower, upper] incl.
        loc_ids=list(range(100)),
        locations={i: {"country": f"C{i}", "region": "", "city": ""} for i in range(100)},
    )
    located = geolocate(points, blocks)
    return (
        located.where(F.col("country").isNotNull())
        .select(F.regexp_extract("country", r"C(\d+)", 1).cast("bigint").alias("loc_id"))
        .groupBy("loc_id")
        .agg(F.count("*").alias("n_points"))
    )


# ---------------------------------------------------------------------------
# Round 2: reference-trained artifacts + template/VALUES oracles
# (fixtures.py pattern: doc_id % K selects a template in BOTH engines; the
# oracle embeds the pure-Python kernel's expected output as a VALUES table)
# ---------------------------------------------------------------------------

from decimal import ROUND_HALF_UP, Decimal  # noqa: E402

import pandas as pd  # noqa: E402,F401  (pandas_udf type-hint resolution)

from .. import refdata  # noqa: E402
from . import fixtures  # noqa: E402


def _r4(x: float) -> float:
    """HALF_UP 4-dp rounding matching Spark's F.round on doubles."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _tpl_docs(spark, sf_dir, k: int):
    """documents -> (doc_id, tpl, doc_id-derived url, template raw_html)."""
    docs = _t(spark, sf_dir, "documents")
    tpl = (F.col("doc_id") % k).cast("int")
    html = F.element_at(
        F.array(*[F.lit(t) for t in fixtures.TEMPLATES[:k]]), tpl + 1
    )
    return docs.select(
        F.col("doc_id"),
        tpl.alias("tpl"),
        F.concat(
            F.lit("http://tpl"), tpl.cast("string"), F.lit(".example.com/x")
        ).alias("url"),
        html.alias("raw_html"),
    )


if refdata.available():
    _CHAIN_SPAN_ROWS = [
        (e["tpl"], off, text, e["valid"], e["language"], _r4(e["badness"]), e["killed_by"])
        for e in fixtures.chain_expected()
        for (text, off) in e["spans"]
    ]

    @_register(
        "q_chain_refnet",
        f"""
        SELECT d.doc_id, e.off AS offset, e.text, e.valid, e.language,
               e.badness, e.killed_by
        FROM documents d
        JOIN {fixtures.sql_values(_CHAIN_SPAN_ROWS, ["tpl", "off", "text", "valid", "language", "badness", "killed_by"])}
          ON d.doc_id % {fixtures.N_TEMPLATES} = e.tpl
        """,
    )
    def q_chain_refnet(spark, sf_dir):
        """Full cleaning chain under the reference's DEFAULT job config —
        trained boilerplate.iso.net, de|en|es|fr .prof profiles, utf8.norm
        replacement table (data/texrex.ini:122-151,185).  Expected side =
        the pure-Python kernel on the same templates, so this certifies the
        distributed execution (Arrow transport, schema, partitioning) of
        the trained-model chain, spans + language + badness + kill stage."""
        from ..clean.chain import clean_docs

        docs = _tpl_docs(spark, sf_dir, fixtures.N_TEMPLATES)
        cleaned = clean_docs(
            docs.select(F.col("doc_id").cast("string").alias("doc_id"), "url", "raw_html"),
            fixtures.ref_chain_config(),
        )
        return cleaned.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.explode("spans").alias("s"),
            "valid",
            "language",
            F.round("badness", 4).alias("badness"),
            "killed_by",
        ).select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            F.col("s.text").alias("text"),
            "valid",
            "language",
            "badness",
            "killed_by",
        )

    _BP_ROWS = [
        (
            e["tpl"], i, d["container"], d["valid"], d["dup_of"],
            _r4(d["boilerplate_score"]),
            bool(d["boilerplate_score"] > 0.55),
        )
        for e in fixtures.chain_expected()
        for i, d in enumerate(e["div_stats"])
    ]

    @_register(
        "q_boilerplate_refnet",
        f"""
        SELECT d.doc_id, e.div_idx, e.container, e.div_valid, e.dup_of,
               e.bp_score, e.is_boilerplate
        FROM documents d
        JOIN {fixtures.sql_values(_BP_ROWS, ["tpl", "div_idx", "container", "div_valid", "dup_of", "bp_score", "is_boilerplate"])}
          ON d.doc_id % {fixtures.N_TEMPLATES} = e.tpl
        """,
    )
    def q_boilerplate_refnet(spark, sf_dir):
        """Per-div deboilerplater output with the reference-trained FANN
        net (trdeboilerplater.pas:619-699 decision at threshold 0.55,
        texrex.ini:126) + in-doc div-dedup back-references — the trained
        model's div classifications, engine vs kernel snapshot."""
        from ..clean.chain import clean_docs_full

        docs = _tpl_docs(spark, sf_dir, fixtures.N_TEMPLATES)
        cleaned = clean_docs_full(
            docs.select(F.col("doc_id").cast("string").alias("doc_id"), "url", "raw_html"),
            fixtures.ref_chain_config(),
        )
        return cleaned.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.posexplode("div_stats").alias("div_idx", "d"),
        ).select(
            "doc_id",
            "div_idx",
            F.col("d.container").alias("container"),
            F.col("d.valid").alias("div_valid"),
            F.col("d.dup_of").alias("dup_of"),
            F.round("d.boilerplate_score", 4).alias("bp_score"),
            (F.col("d.boilerplate_score") > 0.55).alias("is_boilerplate"),
        )


@_register(
    "q_hydra",
    f"""
    SELECT d.doc_id, e.fixed
    FROM documents d
    JOIN {fixtures.sql_values(fixtures.hydra_expected(), ["tpl", "fixed"])}
      ON d.doc_id % {len(fixtures.HYDRA_LINES)} = e.tpl
    """,
)
def q_hydra(spark, sf_dir):
    """HyDRA de-hyphenation (trhydraapplication.pas:419-536): unigram-
    probability argmax over concat/merger/parts + German NN-compound
    fallback, as a broadcast-table pandas UDF; engine vs kernel snapshot."""
    from ..clean.hydra import Unigrams, hydra_udf

    k = len(fixtures.HYDRA_LINES)
    docs = _t(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(ln) for ln in fixtures.HYDRA_LINES]),
            (F.col("doc_id") % k).cast("int") + 1,
        ).alias("line"),
    )
    uni_bc = spark.sparkContext.broadcast(Unigrams(dict(fixtures.HYDRA_UNIGRAMS)))
    return lines.select("doc_id", hydra_udf(uni_bc, german=True)(F.col("line")).alias("fixed"))


@_register(
    "q_rofl",
    f"""
    SELECT d.doc_id, e.fixed
    FROM documents d
    JOIN {fixtures.sql_values(fixtures.rofl_expected(), ["tpl", "fixed"])}
      ON d.doc_id % {len(fixtures.ROFL_LINES)} = e.tpl
    """,
)
def q_rofl(spark, sf_dir):
    """rofl run-together sentence fix (trroflapplication.pas:117,384-426):
    split after [!?:.] when both halves are known words and not in the
    prefix/suffix ignore lists; engine vs kernel snapshot."""
    from ..clean.rofl import rofl_udf

    k = len(fixtures.ROFL_LINES)
    docs = _t(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(ln) for ln in fixtures.ROFL_LINES]),
            (F.col("doc_id") % k).cast("int") + 1,
        ).alias("line"),
    )
    sc = spark.sparkContext
    words_bc = sc.broadcast(set(fixtures.ROFL_WORDS))
    pre_bc = sc.broadcast(set(fixtures.ROFL_PREFIX_IGNORE))
    suf_bc = sc.broadcast(set(fixtures.ROFL_SUFFIX_IGNORE))
    return lines.select(
        "doc_id", rofl_udf(words_bc, pre_bc, suf_bc)(F.col("line")).alias("fixed")
    )


@_register(
    "q_charset_convert",
    f"""
    SELECT d.doc_id, e.text, e.charset
    FROM documents d
    JOIN {fixtures.sql_values(fixtures.charset_expected(), ["tpl", "text", "charset"])}
      ON d.doc_id % {len(fixtures.CHARSET_CASES)} = e.tpl
    """,
)
def q_charset_convert(spark, sf_dir):
    """Charset conversion (trcharsetconverter.pas:93-147): declared wins,
    ISO-8859-1 -> Windows-1252 override, 32KB-clamped detection fallback;
    engine (Arrow-batched UDF over raw bytes) vs kernel snapshot."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..clean.charset import to_utf8

    cases = fixtures.CHARSET_CASES
    k = len(cases)

    @pandas_udf("struct<text:string,charset:string>")
    def conv(ks: pd.Series) -> pd.DataFrame:
        rows = [to_utf8(cases[int(i)][1], cases[int(i)][0]) for i in ks]
        return pd.DataFrame(rows, columns=["text", "charset"])

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", conv((F.col("doc_id") % k).cast("int")).alias("c")
    ).select("doc_id", F.col("c.text").alias("text"), F.col("c.charset").alias("charset"))


@_register(
    "q_warc_roundtrip",
    f"""
    WITH series AS (
      SELECT unnest(generate_series(0, {fixtures.WARC_N_RECORDS - 1})) AS i
    ), surv AS (
      SELECT i, CAST(1000 + (i * 137) % 4000 AS INT) AS body_size FROM series
      WHERE 1000 + (i * 137) % 4000
            BETWEEN {fixtures.WARC_MIN} AND {fixtures.WARC_MAX}
    )
    SELECT 'http://w' || CAST(i % 37 AS VARCHAR) || '.example.com/p/' ||
             CAST(i AS VARCHAR) AS url,
           'utf-8' AS charset, body_size
    FROM surv
    UNION ALL
    SELECT 'http://a' || CAST(i % 37 AS VARCHAR) || '.example.com/p/' ||
             CAST(i AS VARCHAR) AS url,
           '' AS charset, body_size
    FROM surv
    """,
)
def q_warc_roundtrip(spark, sf_dir):
    """WARC ingestion (trreader.pas:236-305,423-517) PLUS its ARC twin
    (trreader.pas:314-391, begin regex :316) and transparent gunzip
    (trfilein.pas:275-295): binaryFile + mapInPandas segmentation, header
    extraction (URI/charset; ARC's one-line header has no charset), and
    the min/max doc-size window — read back deterministic WARC and
    gzipped-ARC fixtures of the same records and check every surviving
    record against the generating formula."""
    import tempfile

    from ..sources.warc import read_arc, read_warc

    wpath = f"{tempfile.gettempdir()}/texrex_warc_fixture.warc"
    apath = f"{tempfile.gettempdir()}/texrex_arc_fixture.arc.gz"
    fixtures.build_warc_fixture(wpath)
    fixtures.build_arc_fixture(apath)
    cols = [
        "url",
        "charset",
        F.octet_length("raw_html").cast("int").alias("body_size"),
    ]
    w = read_warc(spark, wpath, fixtures.WARC_MIN, fixtures.WARC_MAX).select(*cols)
    a = read_arc(spark, apath, fixtures.WARC_MIN, fixtures.WARC_MAX).select(*cols)
    return w.unionByName(a)


_XML_ENC_SQL = (
    "replace(replace(replace(replace(replace({0}, '&', '&amp;'), "
    "'\"', '&quot;'), '''', '&apos;'), '<', '&lt;'), '>', '&gt;')"
)


@_register(
    "q_xml_export",
    f"""
    WITH src AS (
      SELECT CAST(doc_id AS VARCHAR) AS id,
             'http://x' || CAST(doc_id AS VARCHAR) || '.example.com/p?a=1&b=2' AS url,
             'x' || CAST(doc_id AS VARCHAR) || '.example.com' AS host,
             'Q&A "' || CAST(doc_id AS VARCHAR) || '" <report>' AS title,
             CAST(doc_id % 9 AS DOUBLE) AS badness,
             text,
             'img/' || CAST(doc_id AS VARCHAR) || '.jpg' AS media_ref
      FROM documents
    )
    SELECT id AS doc_id,
           '<doc url="' || {_XML_ENC_SQL.format("url")} ||
           '" id="' || {_XML_ENC_SQL.format("id")} ||
           '" bdc="' || chr(CAST(round(badness / 2) AS INT) + 97) ||
           '" bdv="' || CAST(round(badness, 4) AS VARCHAR) ||
           '" host="' || {_XML_ENC_SQL.format("host")} ||
           '" tld="com">' || chr(10) ||
           '<meta name="title" content="' || {_XML_ENC_SQL.format("title")} || '" />' ||
           '<div idx="0">' || {_XML_ENC_SQL.format("text")} || '</div>' || chr(10) ||
           '<media idx="1" src="' || media_ref || '" />' || chr(10) ||
           '</doc>' AS xml
    FROM src
    """,
)
def q_xml_export(spark, sf_dir):
    """XML corpus sink (TrWriteXmlDoc, trwritetools.pas:81-271): doc/meta
    attribute projection, TrXmlEncode entity encoding in the reference's
    replacement order (trutilities.pas:910-921), TrBadnessToBdc grade chars
    (:965-968), interleaved text+media spans — assembled entirely in
    Catalyst by operators/export.xml_corpus, vs a DuckDB restatement."""
    from ..operators.export import xml_corpus

    docs = _t(spark, sf_dir, "documents")
    ds = F.col("doc_id").cast("string")
    cleaned = docs.select(
        ds.alias("doc_id"),
        F.concat(F.lit("http://x"), ds, F.lit(".example.com/p?a=1&b=2")).alias("url"),
        F.lit(True).alias("valid"),
        (F.col("doc_id") % 9).cast("double").alias("badness"),
        F.create_map(
            F.lit("host"), F.concat(F.lit("x"), ds, F.lit(".example.com")),
            F.lit("tld"), F.lit("com"),
            F.lit("title"), F.concat(F.lit('Q&A "'), ds, F.lit('" <report>')),
        ).alias("meta"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"), F.col("text").alias("text"),
                F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"), F.lit("").alias("text"),
                F.concat(F.lit("img/"), ds, F.lit(".jpg")).alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
        ).alias("spans"),
    )
    return xml_corpus(cleaned)


@_register(
    "q_cowinterleave",
    """
    WITH src AS (
      SELECT doc_id,
             'l1' || chr(10) || text || chr(9) || 'end' AS t0,
             'img/' || CAST(doc_id AS VARCHAR) || '.png' AS m1
      FROM documents
    )
    SELECT doc_id, 0 AS offset,
           replace(replace(t0, chr(10), '<ci_l/>'), chr(9), '<ci_t/>') AS line
    FROM src
    UNION ALL
    SELECT doc_id, 1 AS offset, '<media ' || m1 || '/>' AS line FROM src
    """,
)
def q_cowinterleave(spark, sf_dir):
    """cowinterleave (trcowinterleaveapplication.pas:171-173,258-322):
    span-per-line flattening with <ci_l/>/<ci_t/> placeholders so each
    record is self-contained (shuffle-safe); media spans interleave as
    <media .../> lines.  The result is then routed through a cowsplit
    round trip (cowsplit_write -> read back;
    trcowsplitapplication.pas semantics): size-capped output files that
    never split a document.  Both invariants are asserted here — >1 file
    produced AND no doc_id straddles two files — so the sink is
    driver-row-certified, and the oracle (unchanged: content equality)
    certifies the round trip lost nothing."""
    import os
    import tempfile

    from ..operators.export import cowinterleave, cowsplit_write

    docs = _t(spark, sf_dir, "documents")
    ds = F.col("doc_id").cast("string")
    cleaned = docs.select(
        "doc_id",
        F.lit(True).alias("valid"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("l1\n"), F.col("text"), F.lit("\tend")).alias("text"),
                F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"), F.lit("").alias("text"),
                F.concat(F.lit("img/"), ds, F.lit(".png")).alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
        ).alias("spans"),
    )
    flat = cowinterleave(cleaned)
    # Stable per-process path (NOT cleaned up here: the returned DataFrame
    # reads it lazily and the caller collects after we return; overwrite
    # mode keeps reruns idempotent).
    out = os.path.join(
        tempfile.gettempdir(), f"texrex-cowsplit-{os.getpid()}"
    )
    cowsplit_write(flat, out, max_records_per_file=64)
    back = spark.read.parquet(out)
    max_files_per_doc = (
        back.select("doc_id", F.input_file_name().alias("f"))
        .groupBy("doc_id")
        .agg(F.countDistinct("f").alias("nf"))
        .agg(F.max("nf"))
        .collect()[0][0]
    )
    n_files = back.select(F.input_file_name()).distinct().count()
    assert max_files_per_doc == 1, "cowsplit split a document"
    assert n_files > 1, "cowsplit produced a single file; cap not exercised"
    return back.select("doc_id", "offset", "line")


@_register(
    "q_simple_filter",
    """
    WITH spans AS (
      SELECT doc_id,
             [text,
              CASE WHEN doc_id % 3 = 0 THEN '' ELSE substr(text, 1, 50) END]
               AS divs
      FROM documents
    )
    SELECT doc_id,
           (len(list_filter(divs, x -> x != '')) >= 2 AND
            CAST(list_sum(list_transform(list_filter(divs, x -> x != ''),
                 x -> strlen(x))) AS BIGINT) >= 200) AS passes
    FROM spans
    """,
)
def q_simple_filter(spark, sf_dir):
    """Simple document filter (trsimpledocumentfilter.pas:81-89): kill when
    valid UTF-8 mass < size threshold or valid div count < div threshold —
    evaluated by the JVM-side valid_col over a spans array."""
    from ..clean.simplefilter import valid_col

    docs = _t(spark, sf_dir, "documents")
    spans = F.array(
        F.struct(
            F.lit("text").alias("kind"), F.col("text").alias("text"),
            F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("")).otherwise(
                F.substring("text", 1, 50)
            ).alias("text"),
            F.lit("").alias("media_ref"), F.lit(1).alias("offset"),
        ),
    )
    return docs.select(
        "doc_id",
        valid_col(spans, size_threshold=200, div_threshold=2).alias("passes"),
    )


_HEADER_SQL = """
      SELECT doc_id,
             '<html><head><title>  Doc ' || CAST(doc_id AS VARCHAR) ||
             '   report  </title>' ||
             '<meta name="keywords" content="k' || CAST(doc_id % 7 AS VARCHAR) ||
             ',web,corpus">' ||
             CASE WHEN doc_id % 3 = 0
                  THEN '<meta name="author" content="Author ' ||
                       CAST(doc_id % 5 AS VARCHAR) || '">'
                  ELSE '' END ||
             '</head>' AS raw_header
      FROM documents
"""


@_register(
    "q_meta_extract",
    f"""
    WITH src AS ({_HEADER_SQL})
    SELECT doc_id,
           'Doc ' || CAST(doc_id AS VARCHAR) || ' report' AS title,
           'k' || CAST(doc_id % 7 AS VARCHAR) || ',web,corpus' AS keywords,
           CASE WHEN doc_id % 3 = 0
                THEN 'Author ' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END AS author
    FROM src
    """,
)
def q_meta_extract(spark, sf_dir):
    """Meta extractor (trmetaextractor.pas:101-179): title/keywords/author
    regexes over the raw header with whitespace collapse — the engine's
    extract_meta kernel Arrow-batched; the oracle states the expected
    fields literally from the shared derivation."""
    from pyspark.sql.functions import pandas_udf

    from ..clean.metaextract import extract_meta

    @pandas_udf("struct<title:string,keywords:string,author:string>")
    def meta(headers: pd.Series) -> pd.DataFrame:
        rows = [extract_meta(h) for h in headers]
        return pd.DataFrame(
            [(r.get("title"), r.get("keywords"), r.get("author")) for r in rows],
            columns=["title", "keywords", "author"],
        )

    docs = _t(spark, sf_dir, "documents")
    ds = F.col("doc_id").cast("string")
    header = F.concat(
        F.lit("<html><head><title>  Doc "), ds, F.lit("   report  </title>"),
        F.lit('<meta name="keywords" content="k'), (F.col("doc_id") % 7).cast("string"),
        F.lit(',web,corpus">'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit('<meta name="author" content="Author '),
                     (F.col("doc_id") % 5).cast("string"), F.lit('">')),
        ).otherwise(F.lit("")),
        F.lit("</head>"),
    )
    return docs.select("doc_id", meta(header).alias("m")).select(
        "doc_id",
        F.col("m.title").alias("title"),
        F.col("m.keywords").alias("keywords"),
        F.coalesce(F.col("m.author"), F.lit("")).alias("author"),
    )


@_register(
    "q_tokens_sink",
    """
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           unnest(regexp_split_to_array(upper(text), '[^A-ZÀ-Þ]+')) AS t(tok)
      WHERE t.tok != ''
    ), counts AS (
      SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok
    )
    SELECT doc_id, tok, n, rnk FROM (
      SELECT doc_id, tok, n,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, tok)
                  AS INT) AS rnk
      FROM counts)
    WHERE rnk <= 5
    """,
)
def q_tokens_sink(spark, sf_dir):
    """Tokens sink (TrWriteTokens, trwritetools.pas:274-310): per-doc top-k
    types by frequency through operators/export.tokens_sink over a spans
    array (explode + count + rank window, all Catalyst)."""
    from ..operators.export import tokens_sink

    docs = _t(spark, sf_dir, "documents")
    cleaned = docs.select(
        "doc_id",
        F.lit(True).alias("valid"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"), F.col("text").alias("text"),
                F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    out = tokens_sink(cleaned, top_k=5)
    return out.select("doc_id", "tok", "n", F.col("rnk").cast("int").alias("rnk"))


@_register(
    "q_links_sink",
    """
    WITH src AS (
      SELECT doc_id,
             'http://s' || CAST(doc_id AS VARCHAR) || '.example.com/p' AS url,
             CAST(doc_id % 9 AS DOUBLE) AS badness
      FROM documents
    )
    SELECT url AS src_url,
           'http://t' || CAST(doc_id % 13 AS VARCHAR) || '.example.org/q/' ||
             CAST(doc_id AS VARCHAR) AS link,
           'trlDifferentHosts' AS relation,
           badness
    FROM src WHERE doc_id % 4 != 0
    UNION ALL
    SELECT url,
           'http://s' || CAST(doc_id AS VARCHAR) || '.example.com/other/page',
           'trlSameFullHost', badness
    FROM src WHERE doc_id % 4 != 0
    """,
)
def q_links_sink(spark, sf_dir):
    """Links sink (TrWriteLinks, trwritetools.pas:373-416): explode
    harvested (url, relation) pairs of valid docs with the doc's badness —
    invalid docs (doc_id % 4 == 0 here) emit nothing."""
    from ..operators.export import links_sink

    docs = _t(spark, sf_dir, "documents")
    ds = F.col("doc_id").cast("string")
    cleaned = docs.select(
        "doc_id",
        F.concat(F.lit("http://s"), ds, F.lit(".example.com/p")).alias("url"),
        (F.col("doc_id") % 4 != 0).alias("valid"),
        (F.col("doc_id") % 9).cast("double").alias("badness"),
        F.array(
            F.struct(
                F.concat(
                    F.lit("http://t"), (F.col("doc_id") % 13).cast("string"),
                    F.lit(".example.org/q/"), ds,
                ).alias("url"),
                F.lit("trlDifferentHosts").alias("relation"),
            ),
            F.struct(
                F.concat(F.lit("http://s"), ds, F.lit(".example.com/other/page")).alias("url"),
                F.lit("trlSameFullHost").alias("relation"),
            ),
        ).alias("links"),
    )
    return links_sink(cleaned)


@_register(
    "q_nfc_normalize",
    """
    SELECT doc_id,
           nfc_normalize('Cafe' || chr(769) || ' no' || chr(776) || 'el ' ||
                         CAST(doc_id AS VARCHAR)) AS normalized
    FROM documents
    """,
)
def q_nfc_normalize(spark, sf_dir):
    """NFC normalizer (trnfcnormalizer.pas:93-105): combining marks fold
    into precomposed forms — the engine's unicodedata kernel (the exact
    code path of normalize.nfc_divs) vs DuckDB's independent nfc_normalize
    implementation: a true cross-library NFC check."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: unicodedata.normalize("NFC", t))

    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("Café nöel "), F.col("doc_id").cast("string")
    )
    return docs.select("doc_id", nfc(raw).alias("normalized"))


# Engine Rabin-64 MinHash (trshingler.pas:97-150): 20-hash fingerprints of
# 5 fixed token streams, snapshot of the numpy kernel as the oracle.
def _minhash_engine_rows():
    from ..clean.shingle import fingerprint_signed

    streams = [
        ("the quick brown fox jumps over the lazy dog and runs far away "
         "into the deep dark forest tonight").split(),
        ("die forscher haben in der studie gezeigt dass die ergebnisse von "
         "der methode abhaengen und die daten").split(),
        ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
         "mu nu xi omicron pi rho sigma").split(),
        ("one two three four five six seven eight nine ten eleven twelve "
         "thirteen fourteen fifteen sixteen").split(),
        ("w x y z w x y z w x y z longer tokens follow here every time "
         "padding padding padding").split(),
    ]
    rows = []
    for k, toks in enumerate(streams):
        fp = fingerprint_signed(toks, hashes=20)
        for j, h in enumerate(fp):
            rows.append((k, j, int(h)))
    return rows


@_register(
    "q_minhash_engine",
    f"""
    SELECT d.doc_id, e.j, e.minhash
    FROM documents d
    JOIN {fixtures.sql_values(_minhash_engine_rows(), ["tpl", "j", "minhash"])}
      ON d.doc_id % 5 = e.tpl
    """,
)
def q_minhash_engine(spark, sf_dir):
    """The ENGINE MinHash path — 5-token w-shingles (>=9-char pad) hashed
    by the first-n deterministic Rabin-64 polynomials, min per function
    (trshingler.pas:97-150, trrabinhash.pas:294-306) — distributed through
    the chain's mapInPandas vs the kernel snapshot.  Complements the
    portable md5 q_minhash_signature with the bit-exact reference family."""
    from typing import Iterator

    from ..clean.shingle import fingerprint_signed

    streams = [
        ("the quick brown fox jumps over the lazy dog and runs far away "
         "into the deep dark forest tonight"),
        ("die forscher haben in der studie gezeigt dass die ergebnisse von "
         "der methode abhaengen und die daten"),
        ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
         "mu nu xi omicron pi rho sigma"),
        ("one two three four five six seven eight nine ten eleven twelve "
         "thirteen fourteen fifteen sixteen"),
        ("w x y z w x y z w x y z longer tokens follow here every time "
         "padding padding padding"),
    ]

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                fp = fingerprint_signed(streams[int(doc_id) % 5].split(), hashes=20)
                out.extend(
                    {"doc_id": int(doc_id), "j": j, "minhash": int(h)}
                    for j, h in enumerate(fp)
                )
            yield pd.DataFrame(out, columns=["doc_id", "j", "minhash"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(work, "doc_id bigint, j int, minhash bigint")


@_register(
    "q_tarc_sink",
    """
    SELECT doc_id,
           'http://s' || CAST(doc_id AS VARCHAR) || '.example.com/p' AS url,
           hex(encode(text)) AS raw_hex,
           CAST(strlen(text) AS INT) AS raw_length
    FROM documents
    """,
)
def q_tarc_sink(spark, sf_dir):
    """TARC sink (TrWriteTarc, trwritetools.pas:313-369): raw payload bytes
    + length bookkeeping for random access (the arcxi extractor becomes a
    filter+select on this table).  The driver row projects hex(raw) — the
    sink itself keeps the binary column, but pandas can't canonicalize
    bytearray values (the r02 harness crash), and hex certifies the same
    bytes."""
    from ..operators.export import tarc_sink

    docs = _t(spark, sf_dir, "documents")
    ds = F.col("doc_id").cast("string")
    src = docs.select(
        "doc_id",
        F.concat(F.lit("http://s"), ds, F.lit(".example.com/p")).alias("url"),
        F.col("text").alias("raw_html"),
    )
    out = tarc_sink(src)
    return out.select(
        "doc_id", "url",
        F.hex(F.col("raw")).alias("raw_hex"),
        F.col("raw_length").cast("int").alias("raw_length"),
    )


# ---------------------------------------------------------------------------
# Round 2: stateful sessionization, IVF ANN, normalizer-table fidelity,
# engine-kernel snapshots (simhash / fingerprint / divdedup), snapshot
# catalog time travel.
# ---------------------------------------------------------------------------


@_register(
    "q_sessionize",
    """
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
    ), l AS (
      SELECT user_id, ts_s,
             CASE WHEN lag(ts_s) OVER w IS NULL
                    OR ts_s - lag(ts_s) OVER w > 1800
                  THEN 1 ELSE 0 END AS brk
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
    ), s AS (
      SELECT user_id, ts_s,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_s
                                 ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
      FROM l
    )
    SELECT user_id, session_id, CAST(COUNT(*) AS INT) AS n_events,
           MIN(ts_s) AS start_s, MAX(ts_s) AS end_s
    FROM s GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark, sf_dir):
    """Stateful sessionization (30-min inactivity gap) over the events
    stream — the DEFAULT pure-Catalyst plan (operators/sessionize.py:
    lag -> running sum -> groupBy, zero Python boundary, ONE exchange
    reused between window and agg; 5.5x the Arrow kernel in BENCH_r02)
    vs the independent SQL lag+cumsum derivation.  The Arrow-kernel
    formulation is q_sessionize_kernel; the applyInPandasWithState
    streaming twin (streaming/sessionize.py) is pinned equal by
    tests/test_sessionize_ivf.py."""
    from ..operators.sessionize import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap_sec=1800)


# The duplicate-class key must collapse EXACTLY the whitespace set the
# engine fingerprint collapses (Python ``' '.join(text.split())``, i.e.
# every codepoint where str.isspace() holds) — a narrower class would
# split one fingerprint class into several oracle keys on corpora with
# \x85/\xa0/U+2028-style whitespace (ADVICE r03 #5).  The same set,
# spelled for each regex engine:
_PY_WS_SPARK = (  # Java regex: the same codepoints, \uXXXX-escaped
    "[\t\n\x0b\f\r\x1c-\x1f \x85\xa0\u1680"
    "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+"
)
_PY_WS_DUCK = (  # RE2: \x{..} escapes keep the SQL text 7-bit clean
    r"[\x{09}-\x{0D}\x{1C}-\x{1F}\x{20}\x{85}\x{A0}\x{1680}"
    r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+"
)


@_register(
    "q_dedup_stream",
    f"""
    SELECT DISTINCT
           md5(trim(regexp_replace(text, '{_PY_WS_DUCK}', ' ', 'g'), ' '))
             AS class_key
    FROM documents
    """,
)
def q_dedup_stream(spark, sf_dir):
    """Streaming exact-dedup (streaming/dedup.py): the documents table
    replayed as an availableNow file stream through
    dropDuplicatesWithinWatermark on the Rabin fingerprint of
    whitespace-normalized text; the oracle lists every duplicate class
    (md5 of the normalized text) — one survivor per class, so the
    survivors' class keys must equal the distinct-class set exactly, not
    just in count.  (WHICH doc survives per class depends on micro-batch
    arrival order, so the comparison keys on the class, not the doc id.)
    Both sides collapse the same whitespace class then strip edge spaces,
    matching the engine fingerprint's ' '.join(text.split())."""
    import os
    import tempfile

    from ..streaming.dedup import dedup_stream

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")).alias(
            "ingested_at"
        ),
    )
    src = tempfile.mkdtemp(prefix="texrex-sdedup-")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, ingested_at timestamp"
    ).parquet(src)
    name = "sdedup_" + os.path.basename(src).replace("-", "_")
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # No .distinct() on this side: one survivor per class is the claim
    # under test — a duplicate survivor must surface as an extra row.
    norm = F.trim(F.regexp_replace(F.col("text"), _PY_WS_SPARK, " "))
    return spark.table(name).select(F.md5(norm).alias("class_key"))


@_register(
    "q_sessionize_kernel",
    ORACLE_SQL["q_sessionize"],
)
def q_sessionize_kernel(spark, sf_dir):
    """The Arrow-kernel sessionization formulation (numpy gap kernel in
    applyInPandas — the batch shape the applyInPandasWithState streaming
    twin builds on) vs the same SQL oracle — pins kernel == catalyst ==
    SQL three ways together with q_sessionize."""
    from ..operators.sessionize import sessionize_kernel

    return sessionize_kernel(_t(spark, sf_dir, "events"), gap_sec=1800)


@_register(
    "q_ann_ivf",
    """
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cents AS (
      SELECT vec_id AS cell, v FROM emb WHERE vec_id < 16
    ), assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND(list_cosine_similarity(e.v, c.v), 4) DESC, c.cell
               ) AS rn
        FROM emb e CROSS JOIN cents c)
      WHERE rn = 1
    ), q AS (
      SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id >= 100 AND vec_id < 108
    ), probed AS (
      SELECT qid, qv, cell FROM (
        SELECT q.qid, q.qv, c.cell,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY ROUND(list_cosine_similarity(q.qv, c.v), 4) DESC, c.cell
               ) AS rn
        FROM q CROSS JOIN cents c)
      WHERE rn <= 4
    ), cand AS (
      SELECT p.qid, a.vec_id,
             ROUND(list_cosine_similarity(p.qv, a.v), 4) AS cos
      FROM probed p JOIN assigned a ON a.cell = p.cell
      WHERE a.vec_id != p.qid
    )
    SELECT qid AS query_id, vec_id, cos FROM (
      SELECT qid, vec_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      FROM cand)
    WHERE rn <= 5
    """,
)
def q_ann_ivf(spark, sf_dir):
    """IVF approximate nearest neighbours — the inverted-file scale path
    for ANN over the embeddings table (operators/similarity.ivf_topk):
    map-only coarse assignment vs broadcast centroids, candidate
    generation as an equi-join on the cell id (NOT the N x Q cross
    product), exact rerank inside probed cells only.  Deterministic seed
    centroids + 4-dp rounded ranks make the SQL mirror exact."""
    from ..operators.similarity import ivf_topk

    # fan the single-file scan out first: the coarse-assign stage computes
    # n_cells interpreted dots per corpus row map-side, and inherits the
    # scan's 1-task layout otherwise (guide §2.5/§6; 2.5 s -> 0.5 s for
    # the assign stage at sf1.0)
    emb = _t(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    queries = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 108))
    return ivf_topk(emb, queries, n_cells=16, n_probe=4, k=5)


def _norm_table_sql() -> str:
    """Oracle twin of clean/normalize.normalize_text + the utf8.norm
    replacement table (trnormalizer.pas:165-226): NBSP/ZWSP deletion, the
    FULL table as a chained replace() in load order, then the illegal-
    codepoint sweep as an RE2 class.  Built at import time from the same
    refdata the engine loads, so both sides see the identical table."""
    from .. import refdata

    pairs = refdata.load_norm_table()
    sample = "".join(l for l, _ in pairs[:8])
    head = fixtures.sql_str("mojib " + sample + " x")
    raw = (
        f"{head} || CAST(doc_id AS VARCHAR) || chr(160) || 'tail' || "
        "chr(8203) || chr(1) || 'end'"
    )
    # DuckDB's expression binder caps nesting at 128, so the ~170-pair
    # chain is folded in chunks of 50 across nested subqueries.
    expr = f"replace(replace({raw}, chr(160), ''), chr(8203), '')"
    sql = f"SELECT doc_id, {expr} AS t FROM documents"
    for lo in range(0, len(pairs), 50):
        expr = "t"
        for l, r in pairs[lo : lo + 50]:
            expr = f"replace({expr}, {fixtures.sql_str(l)}, {fixtures.sql_str(r)})"
        sql = f"SELECT doc_id, {expr} AS t FROM ({sql})"
    illegal = (
        "[\\x{0001}-\\x{001F}\\x{007F}-\\x{009F}\\x{E000}-\\x{F8FF}"
        "\\x{FDD0}-\\x{FDEF}\\x{FFFD}-\\x{FFFF}\\x{FEFF}]"
    )
    return (
        f"SELECT doc_id, regexp_replace(t, '{illegal}', ' ', 'g') AS normalized "
        f"FROM ({sql})"
    )


@_register("q_normalize_utf8", _norm_table_sql())
def q_normalize_utf8(spark, sf_dir):
    """Normalizer with the reference's shipped utf8.norm table
    (trnormalizer.pas:165-226 loader semantics, refdata.load_norm_table):
    mojibake repair + NBSP/ZWSP deletion + illegal-codepoint sweep — the
    engine's normalize_text kernel vs an independently-derived DuckDB
    replace chain over the same table."""
    from pyspark.sql.functions import pandas_udf

    from .. import refdata
    from ..clean.normalize import normalize_text

    pairs = refdata.load_norm_table()
    sample = "".join(l for l, _ in pairs[:8])

    @pandas_udf("string")
    def norm(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: normalize_text(t, pairs))

    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("mojib " + sample + " x"),
        F.col("doc_id").cast("string"),
        F.lit("\xa0tail\u200b\x01end"),
    )
    return docs.select("doc_id", norm(raw).alias("normalized"))


# Engine-kernel snapshot oracles (the q_minhash_engine pattern): fixed
# template inputs, the local kernel's output embedded as VALUES, the
# DISTRIBUTED kernel recomputing them through the real pandas-UDF path.

_SIMHASH_TEMPLATES = [
    "the quick brown fox jumps over the lazy dog again and again tonight",
    "die forscher zeigen dass die ergebnisse stark von der methode abhaengen",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu",
    "one two three four five six seven eight nine ten eleven twelve thirteen",
    "w x y z w x y z repeated short tokens with padding padding padding",
]


def _simhash_engine_rows():
    from ..operators.textops import simhash_batch

    sims = simhash_batch(pd.Series(_SIMHASH_TEMPLATES))
    return [(k, int(s)) for k, s in enumerate(sims)]


@_register(
    "q_simhash_engine",
    f"""
    SELECT d.doc_id, e.simhash
    FROM documents d
    JOIN {fixtures.sql_values(_simhash_engine_rows(), ["tpl", "simhash"])}
      ON d.doc_id % 5 = e.tpl
    """,
)
def q_simhash_engine(spark, sf_dir):
    """The ENGINE SimHash (Charikar sketch over Rabin-64 token hashes,
    whole-Arrow-batch numpy kernel, operators/textops.simhash_batch) run
    through the distributed pandas-UDF path vs the local-kernel snapshot —
    certifies the banded Hamming near-dup's signature input
    (q_simhash_neardup stays the rows-only engine-native check)."""
    from ..operators.textops import simhash_udf

    docs = _t(spark, sf_dir, "documents")
    tpl = F.element_at(
        F.array(*[F.lit(t) for t in _SIMHASH_TEMPLATES]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    return docs.select("doc_id", simhash_udf()(tpl).alias("simhash"))


_FP_TEMPLATES = [
    "plain single spaced text",
    "  leading   and   internal\twhitespace\ncollapses  ",
    "unicode tokens: \xe4\xf6\xfc stra\xdfe",
    "",
    "repeat repeat repeat repeat repeat",
]


def _fingerprint_rows():
    import numpy as np

    from ..operators.textops import _hasher

    rows = []
    h = _hasher()
    for k, t in enumerate(_FP_TEMPLATES):
        key = " ".join(t.split()).encode("utf-8")
        v = int(np.uint64(h.hash(key)).astype(np.int64)) if t else 0
        rows.append((k, v))
    return rows


@_register(
    "q_doc_fingerprint",
    f"""
    SELECT d.doc_id, e.fp
    FROM documents d
    JOIN {fixtures.sql_values(_fingerprint_rows(), ["tpl", "fp"])}
      ON d.doc_id % 5 = e.tpl
    """,
)
def q_doc_fingerprint(spark, sf_dir):
    """Rolling Rabin-64 document fingerprint of whitespace-normalized text
    (the perfect-dedup content key, trduplicatedetector.pas:114-122) —
    distributed doc_fingerprint_udf vs the local-kernel snapshot."""
    from ..operators.textops import doc_fingerprint_udf

    docs = _t(spark, sf_dir, "documents")
    tpl = F.element_at(
        F.array(*[F.lit(t) for t in _FP_TEMPLATES]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    return docs.select("doc_id", doc_fingerprint_udf()(tpl).alias("fp"))


_DIVDEDUP_TEMPLATES = [
    ["hello world", "foo bar baz", "hello world", "ab", "foo bar baz"],
    ["aaa", "bbb", "aaa", "bbb", "ccc", "aaa"],
    ["only one div so the whole document is skipped"],
]


def _divdedup_rows():
    from ..clean.divdedup import dedupe_divs
    from ..clean.stripper import Div

    rows = []
    for k, texts in enumerate(_DIVDEDUP_TEMPLATES):
        divs = [Div(text=t) for t in texts]
        dedupe_divs(divs)
        rows.extend((k, i, d.dup_of) for i, d in enumerate(divs))
    return rows


@_register(
    "q_divdedup",
    f"""
    SELECT d.doc_id, e.div_idx, e.dup_of
    FROM documents d
    JOIN {fixtures.sql_values(_divdedup_rows(), ["tpl", "div_idx", "dup_of"])}
      ON d.doc_id % 3 = e.tpl
    """,
)
def q_divdedup(spark, sf_dir):
    """In-document div deduplication (trdivdeduplicator.pas:148-216:
    default-poly Rabin-64 per div, later identical div -> dup_of first,
    < 3 chars skipped, < 2 divs skips the doc) — the kernel run through
    the distributed mapInPandas path vs the local snapshot."""
    from typing import Iterator

    from ..clean.divdedup import dedupe_divs
    from ..clean.stripper import Div

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                texts = _DIVDEDUP_TEMPLATES[int(doc_id) % 3]
                divs = [Div(text=t) for t in texts]
                dedupe_divs(divs)
                out.extend(
                    {"doc_id": int(doc_id), "div_idx": i, "dup_of": d.dup_of}
                    for i, d in enumerate(divs)
                )
            yield pd.DataFrame(out, columns=["doc_id", "div_idx", "dup_of"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(work, "doc_id bigint, div_idx int, dup_of int")


@_register(
    "q_snapshot_timetravel",
    """
    SELECT doc_id, CAST(length(text) AS INT) AS doc_len
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q_snapshot_timetravel(spark, sf_dir):
    """Snapshot-catalog time travel (operators/snapshots.py — the
    Iceberg-equivalent layer per the BASELINE.md waiver): commit v1 (a
    filtered subset), commit v2 (the full table), then read v1 BACK by
    snapshot id.  The oracle is the v1 derivation — proving the pinned
    manifest serves the superseded version, not the latest."""
    import tempfile

    from ..operators.snapshots import SnapshotCatalog

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("int").alias("doc_len")
    )
    cat = SnapshotCatalog(tempfile.mkdtemp(prefix="texrex-ttq-"))
    v1 = docs.where(F.col("doc_id") % 3 == 0)
    sid1 = cat.commit({"docs": v1}, round_no=1)
    cat.commit({"docs": docs}, round_no=2)
    return cat.read(spark, "docs", snapshot_id=sid1)


@_register(
    "q_seen_cuckoo",
    """
    SELECT doc_id,
           'http://h' || CAST(doc_id % 97 AS VARCHAR) || '.example/p' ||
             CAST(doc_id AS VARCHAR) AS url_norm,
           (doc_id % 6 = 3) AS seen
    FROM documents
    """,
)
def q_seen_cuckoo(spark, sf_dir):
    """The CUCKOO URL-seen set end-to-end through the partitioned
    mapInPandas path (functions/cuckoo.py, operators/seenset.py):
    round 1 adds every doc_id%3==0 URL, round 2 RETRACTS the doc_id%6==0
    half (the delete the bloom filter cannot do), round 3 probes the full
    table — so seen == (doc_id%6==3) exactly.  The oracle is that exact
    set; at this scale the 16-bit-fingerprint false-positive rate is 0
    (deterministic input, verified empirically, stable across runs)."""
    import tempfile

    from ..operators.seenset import PartitionedSeenSet

    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://h"), (F.col("doc_id") % 97).cast("string"),
            F.lit(".example/p"), F.col("doc_id").cast("string"),
        ).alias("url_norm"),
    )
    seen = PartitionedSeenSet(
        tempfile.mkdtemp(prefix="texrex-cuckooq-"),
        partitions=8,
        filter_kind="cuckoo",
        cuckoo_capacity_per_bucket=100_000,
    )
    seen.check_and_add(urls.where(F.col("doc_id") % 3 == 0)).count()
    seen.retract(urls.where(F.col("doc_id") % 6 == 0)).count()
    return seen.probe(urls).select("doc_id", "url_norm", "seen")


def _round4(x: float) -> float:
    """Round to 4 places the way Spark's F.round does: HALF_UP on the
    shortest decimal representation of the double (Python's built-in
    round is half-even on the binary value, which diverges on exact
    .xxxx5 boundaries — e.g. a mean of 127.19375)."""
    import decimal

    return float(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _media_feature_rows():
    from ..operators.multimodal import feature_row, synth_media_row

    rows = []
    for k in range(5):
        m = synth_media_row(f"img/{k}.jpg")
        f = feature_row(m["media_ref"], m["payload"], m["meta"])
        rows.append(
            (
                k,
                m["media_ref"],
                f["width"],
                f["height"],
                _round4(f["mean_intensity"]),
                _round4(f["std_intensity"]),
                int(f["phash"]),
            )
        )
    return rows


@_register(
    "q_media_features",
    f"""
    SELECT d.doc_id, e.media_ref, e.width, e.height,
           e.mean_intensity, e.std_intensity, e.phash
    FROM documents d
    JOIN {fixtures.sql_values(
        _media_feature_rows(),
        ["tpl", "media_ref", "width", "height",
         "mean_intensity", "std_intensity", "phash"],
    )}
      ON d.doc_id % 5 = e.tpl
    """,
)
def q_media_features(spark, sf_dir):
    """Multimodal decode -> feature-extract over the media table
    (operators/multimodal.py): interleaved spans reference binary
    payloads by media_ref; features (intensity stats + 64-bit
    average-hash) come out of the real mapInPandas batch path with the
    deterministic stub decoder, vs the local-kernel snapshot.  The
    equi-join back to docs is on media_ref (broadcastable here; at scale
    the media table shuffles on its natural key)."""
    from ..operators.multimodal import extract_features, synth_media_df

    docs = _t(spark, sf_dir, "documents")
    ref = F.concat(F.lit("img/"), (F.col("doc_id") % 5).cast("string"), F.lit(".jpg"))
    spans = docs.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("media").alias("kind"), F.lit("").alias("text"),
                ref.alias("media_ref"), F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    media = synth_media_df(spark, spans)
    feats = extract_features(media).select(
        "media_ref", "width", "height",
        F.round("mean_intensity", 4).alias("mean_intensity"),
        F.round("std_intensity", 4).alias("std_intensity"),
        "phash",
    )
    refs = docs.select("doc_id", ref.alias("media_ref"))
    return refs.join(F.broadcast(feats), "media_ref").select(
        "doc_id", "media_ref", "width", "height",
        "mean_intensity", "std_intensity", "phash",
    )


def _real_media_rows():
    from ..operators.multimodal import (
        audio_feature_row, feature_row, synth_real_media_row,
    )

    from ..operators.multimodal import video_feature_row

    rows = []
    # prefix "m/": md5-hash picks over m/0..m/47 hit ALL TWELVE codec
    # branches (PGM, PPM, BMP, PNG, JPEG, GIF, WebP, TIFF, ICO, WAV,
    # FLAC, MJPEG-MP4) — asserted below so a synth change can't silently
    # drop a format from the oracle
    for k in range(48):
        m = synth_real_media_row(f"m/{k}")
        if m["kind"] == "audio":
            a = audio_feature_row(m["media_ref"], m["payload"])
            rows.append((k, m["media_ref"], m["meta"]["mime"], "audio",
                         a["n_samples"], a["channels"], _round4(a["rms"])))
        elif m["kind"] == "video":
            v = video_feature_row(m["media_ref"], m["payload"])
            rows.append((k, m["media_ref"], m["meta"]["mime"], "video",
                         v["n_frames"], v["width"],
                         _round4(v["mean_intensity"])))
        else:
            f = feature_row(m["media_ref"], m["payload"], m["meta"])
            rows.append((k, m["media_ref"], m["meta"]["mime"], "image",
                         f["width"], f["height"],
                         _round4(f["mean_intensity"])))
    assert {r[2] for r in rows} == {
        "image/x-portable-graymap", "image/x-portable-pixmap",
        "image/bmp", "image/png", "image/jpeg", "image/gif",
        "image/webp", "image/tiff", "image/x-icon",
        "audio/wav", "audio/flac", "video/mp4",
    }, "q_media_decode fixture must exercise every real codec"
    return rows


@_register(
    "q_media_decode",
    f"""
    SELECT d.doc_id, e.media_ref, e.mime, e.kind, e.dim_a, e.dim_b, e.stat
    FROM documents d
    JOIN {fixtures.sql_values(
        _real_media_rows(),
        ["tpl", "media_ref", "mime", "kind", "dim_a", "dim_b", "stat"],
    )}
      ON d.doc_id % 48 = e.tpl
    """,
)
def q_media_decode(spark, sf_dir):
    """REAL byte-level codecs (pure numpy/stdlib, multimodal.py): PGM,
    PPM, uncompressed 24-bit BMP, and PCM WAV payloads synthesized by the
    matching encoders, decoded and featured through the distributed
    mapInPandas path, vs the local-kernel snapshot — plus the four
    pure-stdlib compressed codecs (PNG, operators/multimodal.py; JPEG —
    baseline incl. 4:2:0 AND progressive SOF2, operators/jpeg.py; GIF,
    operators/gif.py; lossless VP8L WebP — transforms, LZ77, color
    cache, operators/webp.py; TIFF — LZW/PackBits strips + predictor,
    operators/tiff.py; ICO favicons — DIB XOR+AND masks and PNG entries,
    operators/ico.py; FLAC — fixed/LPC predictors + Rice residuals,
    container-sniffed beside WAV, operators/flac.py) and MJPEG-in-MP4 video (full ISO BMFF
    sample-table parse + every-2nd-frame decode, operators/mp4.py).  Images report (width,
    height, mean luma); audio (n_samples, channels, RMS); video
    (n_frames, width, mean sampled luma).  Inter-frame video codecs stay
    NotImplementedError — their libraries are not in this container."""
    from ..operators.multimodal import (
        extract_audio_features, extract_features, extract_video_features,
        synth_real_media_df,
    )

    docs = _t(spark, sf_dir, "documents")
    ref = F.concat(F.lit("m/"), (F.col("doc_id") % 48).cast("string"))
    spans = docs.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("media").alias("kind"), F.lit("").alias("text"),
                ref.alias("media_ref"), F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    media = synth_real_media_df(spark, spans).cache()
    img = extract_features(media.where(F.col("kind") == "image")).select(
        "media_ref",
        F.col("width").alias("dim_a"), F.col("height").alias("dim_b"),
        F.round("mean_intensity", 4).alias("stat"),
    )
    aud = extract_audio_features(media).select(
        "media_ref",
        F.col("n_samples").alias("dim_a"), F.col("channels").alias("dim_b"),
        F.round("rms", 4).alias("stat"),
    )
    vid = extract_video_features(media).select(
        "media_ref",
        F.col("n_frames").alias("dim_a"), F.col("width").alias("dim_b"),
        F.round("mean_intensity", 4).alias("stat"),
    )
    feats = img.unionByName(aud).unionByName(vid)
    meta = media.select(
        "media_ref", "kind", F.col("meta.mime").alias("mime")
    )
    refs = docs.select("doc_id", ref.alias("media_ref"))
    return (
        refs.join(F.broadcast(feats.join(meta, "media_ref")), "media_ref")
        .select("doc_id", "media_ref", "mime", "kind", "dim_a", "dim_b", "stat")
    )


@_register(
    "q_embed_quantize",
    """
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             greatest(list_max(list_transform(v, x -> abs(x))) / 127.0,
                      1e-12) AS scale
      FROM emb
    )
    SELECT vec_id,
           generate_subscripts(v, 1) AS j,
           CAST(floor(unnest(v) / scale + 0.5) AS INT) AS q,
           ROUND(scale, 6) AS scale
    FROM s
    """,
)
def q_embed_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column (the storage
    path for billion-vector ANN: 4x smaller than float32, scale kept
    per row).  Pure Catalyst — array_max/transform/posexplode, no UDF —
    vs the identical SQL derivation; floor(x/scale + 0.5) is used on
    BOTH sides so rounding ties break identically."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    scaled = emb.select(
        "vec_id", "v",
        F.greatest(
            F.array_max(F.transform("v", F.abs)) / F.lit(127.0), F.lit(1e-12)
        ).alias("scale"),
    )
    return scaled.select(
        "vec_id",
        F.posexplode("v").alias("pos", "x"),
        "scale",
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("j"),
        F.floor(F.col("x") / F.col("scale") + 0.5).cast("int").alias("q"),
        F.round("scale", 6).alias("scale"),
    )


def _walk_order_setup():
    from ..operators.walkstate import WalkConfig
    from ..sources import synth

    corpus = synth.generate(n_hosts=10, n_docs=120, seed=13, n_seeds=16)
    # max_steps=16 makes the FIFO document cache LOAD-BEARING: this walk
    # produces 3 http='cached' log rows (cache hits skip politeness+fetch
    # and re-push the cached link list, trwalkers.pas:346-396,881-894), so
    # the oracle row-for-row match certifies the cache, not just the walk.
    cfg = WalkConfig(
        seed=13, n_walkers=3, max_steps=16, random_jump_probability=0.1,
        min_politeness=2, cache_size=15,
    )
    return corpus, cfg


def _walk_order_rows():
    from ..oracle.crawl import crawl as oracle_crawl

    corpus, cfg = _walk_order_setup()
    res = oracle_crawl(corpus, cfg)
    return [
        (r.walker_id, r.seq, r.clock, r.follow, r.url, r.http, r.process,
         r.seen, r.links_found)
        for r in res.log
    ]


@_register(
    "q_crawl_order",
    f"""
    SELECT walker_id, seq, clock, follow, url, http, process, seen,
           links_found
    FROM {fixtures.sql_values(
        _walk_order_rows(),
        ["walker_id", "seq", "clock", "follow", "url", "http", "process",
         "seen", "links_found"],
    )}
    """,
)
def q_crawl_order(spark, sf_dir):
    """THE BASELINE correctness gate as a driver row: the distributed
    superstep crawl (operators/walker.py, applyInPandas per walker, pinned
    RNG protocol trwalkers.pas:859-997) must reproduce the sequential
    oracle's crawl log row for row — same seed list, same politeness
    budget, same follow/jump decisions, same seen-set verdicts, same
    FIFO document-cache hits (3 'cached' rows in this fixture).  The
    oracle side is the pure-Python reference crawl embedded as VALUES;
    tests/test_walk_parity.py additionally pins partitioning invariance
    and checkpoint resume."""
    from ..operators.walker import SparkCrawl
    from ..sources import synth

    corpus, cfg = _walk_order_setup()
    sc = SparkCrawl(spark, cfg)
    out = sc.run(synth.docs_df(spark, corpus), corpus.seeds, corpus.robots)
    return out["crawl_log"].select(
        "walker_id", "seq", "clock", "follow", "url", "http", "process",
        "seen", "links_found",
    )


_EDGE_SQL = """
      SELECT 'h' || CAST(doc_id % 11 AS VARCHAR) AS src,
             'h' || CAST((doc_id * 7) % 13 AS VARCHAR) AS dst
      FROM documents
"""


def _edges_df(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 11).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("doc_id") * 7) % 13).cast("string")).alias("dst"),
    )


@_register(
    "q_link_indegree",
    f"""
    WITH edges AS ({_EDGE_SQL})
    SELECT dst, COUNT(*) AS in_degree FROM edges GROUP BY dst
    """,
)
def q_link_indegree(spark, sf_dir):
    """Host in-degree over the harvested link graph (the links sink's
    (src, dst) rows, trwritetools WriteLinks) — one partial-agg groupBy."""
    from ..operators.linkgraph import in_degree

    return in_degree(_edges_df(spark, sf_dir))


def _pagerank_sql(iterations: int = 3, damping: float = 0.85) -> str:
    parts = [
        f"WITH edges AS ({_EDGE_SQL})",
        ", nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION SELECT dst FROM edges))",
        ", outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        ", r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f", c{k} AS (SELECT e.dst AS node, SUM(r.rank / o.outdeg) AS mass "
            f"FROM edges e JOIN outdeg o ON e.src = o.src "
            f"JOIN r{k-1} r ON e.src = r.node GROUP BY e.dst)"
        )
        parts.append(
            f", r{k} AS (SELECT n.node, {1.0 - damping} + {damping} * "
            f"COALESCE(c.mass, 0) AS rank FROM nodes n "
            f"LEFT JOIN c{k} c ON n.node = c.node)"
        )
    parts.append(
        f"SELECT node, ROUND(rank, 4) AS rank FROM r{iterations}"
    )
    return "\n".join(parts)


@_register("q_pagerank", _pagerank_sql(3))
def q_pagerank(spark, sf_dir):
    """Iterative PageRank over the host link graph
    (operators/linkgraph.pagerank): K synchronous DataFrame rounds — one
    dst-shuffle per round, broadcast out-degree, lineage truncated every
    iteration — vs the identical K-times-unrolled SQL recurrence.  Ranks
    feed frontier prioritization (rank-weighted priority instead of the
    uniform hash)."""
    from ..operators.linkgraph import pagerank

    ranks = pagerank(_edges_df(spark, sf_dir), iterations=3)
    return ranks.select("node", F.round("rank", 4).alias("rank"))


@_register(
    "q_host_metrics",
    f"""
    WITH log AS (
      SELECT * FROM {fixtures.sql_values(
        _walk_order_rows(),
        ["walker_id", "seq", "clock", "follow", "url", "http", "process",
         "seen", "links_found"],
      )}
    ),
    hosted AS (
      SELECT regexp_extract(url, 'https?://([^/]+)/', 1) AS host, *
      FROM log WHERE url != ''
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS fetches,
           CAST(SUM(CASE WHEN http = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS oks,
           CAST(SUM(CASE WHEN process = 'valid' THEN 1 ELSE 0 END) AS BIGINT)
             AS valid_docs,
           CAST(SUM(links_found) AS BIGINT) AS links_found
    FROM hosted GROUP BY host
    """,
)
def q_host_metrics(spark, sf_dir):
    """Per-host fetch/clean metrics rolled up from the crawl log (the
    north rule's metrics table; reference: walk statistics,
    trwalkers.pas stats + statswatcher.inc) — the distributed crawl's
    log aggregated per host vs the same rollup over the sequential
    oracle's log."""
    from ..operators.walker import SparkCrawl
    from ..sources import synth

    corpus, cfg = _walk_order_setup()
    sc = SparkCrawl(spark, cfg)
    out = sc.run(synth.docs_df(spark, corpus), corpus.seeds, corpus.robots)
    log = out["crawl_log"].where(F.col("url") != "")
    return (
        log.select(
            F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
            "http", "process", "links_found",
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("fetches"),
            F.sum(F.when(F.col("http") == "ok", 1).otherwise(0)).alias("oks"),
            F.sum(F.when(F.col("process") == "valid", 1).otherwise(0)).alias(
                "valid_docs"
            ),
            F.sum("links_found").alias("links_found"),
        )
    )


def _pq_setup():
    import numpy as np

    from ..operators.pq import train_codebooks

    # deterministic templates: 32 train vectors + 5 probe vectors, dim 64
    rng = np.random.default_rng(20260816)
    train = rng.standard_normal((32, 64))
    probes = rng.standard_normal((5, 64))
    books = train_codebooks(train, m=8, k=16, iterations=2)
    return books, probes


def _pq_code_rows():
    from ..operators.pq import encode_batch

    books, probes = _pq_setup()
    codes = encode_batch(probes, books)
    return [
        (t, j, int(codes[t, j])) for t in range(len(probes)) for j in range(8)
    ]


@_register(
    "q_pq_codes",
    f"""
    SELECT d.doc_id, e.j, e.code
    FROM documents d
    JOIN {fixtures.sql_values(_pq_code_rows(), ["tpl", "j", "code"])}
      ON d.doc_id % 5 = e.tpl
    """,
)
def q_pq_codes(spark, sf_dir):
    """Product-quantization encode (Jegou et al. 2011; operators/pq.py):
    deterministic codebooks (seeded Lloyd on a fixed sample), the
    DISTRIBUTED map-only Arrow encode pass vs the local-kernel snapshot.
    The 8-byte codes are the 32x-compressed storage tier under ADC search
    (pq_topk; recall contract in tests/test_pq.py)."""
    from ..operators.pq import pq_encode

    books, probes = _pq_setup()
    docs = _t(spark, sf_dir, "documents")
    vec = F.element_at(
        F.array(*[
            F.array(*[F.lit(float(x)) for x in p]) for p in probes
        ]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    src = docs.select(F.col("doc_id").cast("long").alias("vec_id"), vec.alias("v"))
    enc = pq_encode(src, books, vec_col="v", id_col="vec_id")
    return enc.select(
        F.col("vec_id").alias("doc_id"),
        F.posexplode("codes").alias("j", "code"),
    )


# ---------------------------------------------------------------------------
# Registry split.  The correctness driver verifies the FIRST 50 registered
# queries, so the registry holds AT MOST 50 — every registered query is
# externally verified, none hides past a truncation window.  Redundant
# parity twins (a second formulation of semantics already certified by a
# registered row — e.g. the Catalyst BNLJ twin of the engine range join,
# the portable-md5 minhash twin of the engine Rabin minhash, the Arrow
# sessionize kernel twin of the Catalyst default, and three generic
# relational/windowing demos that exercise no §2 operator) live in
# EXTRA_QUERIES/EXTRA_ORACLE_SQL: same oracle contract, pinned by the same
# pytest parametrization (tests/test_queries_oracle.py) and benched, just
# not registered with the driver.  test_plans.py asserts len(QUERIES)<=50
# and that every §2 flagship is registered.
# ---------------------------------------------------------------------------

_FRONT = [
    "q_agg_pricing", "q_range_join",
    "q_crawl_order", "q_host_metrics", "q_pagerank", "q_link_indegree",
    "q_media_decode", "q_embed_quantize", "q_pq_codes",
]
_EXTRA = [
    "q_join_topk", "q_window_running", "q_stream_tumbling", "q_top_tokens",
    "q_minhash_signature", "q_sessionize_kernel", "q_range_join_catalyst",
]

EXTRA_QUERIES: dict = {}
EXTRA_ORACLE_SQL: dict = {}


def _finalize_registry() -> None:
    for n in _EXTRA:
        if n in QUERIES:
            EXTRA_QUERIES[n] = QUERIES.pop(n)
        if n in ORACLE_SQL:
            EXTRA_ORACLE_SQL[n] = ORACLE_SQL.pop(n)
    order = [n for n in _FRONT if n in QUERIES]
    order += [n for n in QUERIES if n not in _FRONT]
    for d in (QUERIES, ORACLE_SQL):
        ordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(ordered)
    assert len(QUERIES) <= 50, f"driver registry overflow: {len(QUERIES)}"


_finalize_registry()
