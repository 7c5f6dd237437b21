"""Round-7 gated queries: web-corpus curation primitives (Gopher rules,
C4 line filters, parameter-aware URL canonicalization), boolean
retrieval, winnowing fingerprints, negative sampling, and snapshot-layer
schema evolution / change-data-feed.

Same contract as every other queries module: each entry has a Spark
implementation in R7_QUERIES and (where SQL-expressible) a DuckDB oracle
in R7_ORACLES whose stringified, column-sorted, order-insensitive hash
must match (tools/check_correctness.py replica of the driver gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table


def _noisy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with PLANTED Gopher violations (the fixture corpus is
    clean word salad, so violations are appended deterministically by
    doc_id residue — the same synthesis trick as domain_curation's URLs;
    the oracle rebuilds the identical strings)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" ### ### ### ... ... 123 456 789 000"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 9 == 0,
                F.lit(" a a a a a a a a a a a a a a a a a a a a"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rule census (Rae et al. 2021 A1.1 word-level
    rules — operators/text.gopher_rules): word-count bounds, mean word
    length in [3,10], symbol-word and non-alpha-word caps, stopword
    presence — every threshold an exact integer cross-multiplication, so
    flags are engine-bit-equal. Violations are planted by doc_id residue
    (symbol runs on %7, a 1-char-word flood that drags mean length below
    3 on %9). One tokenize pass per doc, one census aggregate per source
    — scan-shaped, no shuffle besides the final rollup."""
    from m13_sparkstreaming_python_azure_spark.operators.text import (
        gopher_rules,
    )

    flags = gopher_rules(_noisy_docs(spark, sf_dir))
    b = lambda c: F.sum(F.col(c).cast("long")).alias(f"n_{c}")  # noqa: E731
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        b("pass_word_count"),
        b("pass_mean_len"),
        b("pass_symbols"),
        b("pass_alpha"),
        b("pass_stopwords"),
        b("pass_all"),
    )


_GOPHER_SQL = """
    WITH noisy AS (
        SELECT doc_id, source,
               text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' ### ### ### ... ... 123 456 789 000'
                       ELSE '' END
               || CASE WHEN doc_id % 9 = 0
                       THEN ' a a a a a a a a a a a a a a a a a a a a'
                       ELSE '' END AS text
        FROM documents
    ), toks AS (
        SELECT doc_id, source,
               list_filter(str_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM noisy
    ), flags AS (
        SELECT source,
               len(t) AS n,
               coalesce(list_sum(list_transform(t, x -> length(x))), 0)
                   AS sum_len,
               len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
                   AS n_alpha,
               len(list_filter(t, x -> regexp_matches(x, '^#+$')
                                       OR contains(x, '...'))) AS n_sym,
               len(list_filter(t, x -> x IN ('the','be','to','of','and',
                                             'that','have','with')))
                   AS n_stop
        FROM toks
    ), p AS (
        SELECT source,
               (n >= 50 AND n <= 100000) AS pass_word_count,
               (sum_len >= 3 * n AND sum_len <= 10 * n) AS pass_mean_len,
               (10 * n_sym <= n) AS pass_symbols,
               (5 * n_alpha >= 4 * n) AS pass_alpha,
               (n_stop >= 2) AS pass_stopwords
        FROM flags
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN pass_word_count THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_word_count,
           CAST(sum(CASE WHEN pass_mean_len THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_mean_len,
           CAST(sum(CASE WHEN pass_symbols THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_symbols,
           CAST(sum(CASE WHEN pass_alpha THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_alpha,
           CAST(sum(CASE WHEN pass_stopwords THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_stopwords,
           CAST(sum(CASE WHEN pass_word_count AND pass_mean_len
                          AND pass_symbols AND pass_alpha
                          AND pass_stopwords THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_all
    FROM p GROUP BY source
"""


def q_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning census (Raffel et al. 2020 §2.2 —
    operators/text.c4_keep_line): documents split into 6-token lines;
    terminal punctuation synthesized content-derived (md5(line) % 3 > 0
    → '.', so both engines agree per line); 'javascript' lines planted
    on doc_id % 11, a 'lorem ipsum' line on % 13. Line rules: terminal
    punctuation, ≥ 3 words, no javascript; doc rules: no lorem-ipsum /
    no '{', and ≥ 3 surviving lines. Census per source. Explode is
    4 rows/doc; everything else is scan-shaped JVM expressions."""
    from m13_sparkstreaming_python_azure_spark.operators.text import (
        c4_keep_line,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    raw_lines = F.array(
        *[
            F.concat(
                F.concat_ws(" ", F.slice(t, i * 6 + 1, 6)),
                F.when(
                    (F.lit(i) == 1) & (F.col("doc_id") % 11 == 0),
                    F.lit(" javascript library"),
                ).otherwise(F.lit("")),
            )
            for i in range(4)
        ]
    )
    lines = F.transform(
        raw_lines,
        lambda ln: F.when(ln == "", ln).otherwise(
            F.concat(
                ln,
                F.when(
                    F.conv(F.substring(F.md5(ln), 1, 4), 16, 10).cast(
                        "long"
                    )
                    % 3
                    > 0,
                    F.lit("."),
                ).otherwise(F.lit("")),
            )
        ),
    )
    lines = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(
            F.slice(lines, 1, 2),
            F.array(F.lit("lorem ipsum dolor sit amet.")),
            F.slice(lines, 4, 1),
        ),
    ).otherwise(lines)
    per_line = docs.select(
        "doc_id", "source", F.explode(lines).alias("line")
    ).filter(F.col("line") != "")
    flagged = per_line.withColumn("keep", c4_keep_line(F.col("line")))
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.max(
            F.lower(F.col("line")).contains("lorem ipsum").cast("int")
        ).alias("has_lorem"),
    )
    return per_doc.groupBy("source").agg(
        F.sum("n_lines").alias("lines_total"),
        F.sum("n_kept").alias("lines_kept"),
        F.count(F.lit(1)).alias("docs_total"),
        F.sum(
            (
                (F.col("has_lorem") == 0) & (F.col("n_kept") >= 3)
            ).cast("long")
        ).alias("docs_kept"),
    )


_C4_SQL = """
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(str_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), rawlines AS (
        SELECT doc_id, source, i,
               coalesce(array_to_string(t[i*6+1 : i*6+6], ' '), '')
               || CASE WHEN i = 1 AND doc_id % 11 = 0
                       THEN ' javascript library' ELSE '' END AS ln
        FROM toks, unnest([0, 1, 2, 3]) AS u(i)
    ), punct AS (
        SELECT doc_id, source, i,
               CASE WHEN ln = '' THEN ln
                    WHEN ('0x' || substring(md5(ln), 1, 4))::BIGINT % 3 > 0
                        THEN ln || '.'
                    ELSE ln END AS ln
        FROM rawlines
    ), lines AS (
        SELECT doc_id, source, i,
               CASE WHEN doc_id % 13 = 0 AND i = 2
                    THEN 'lorem ipsum dolor sit amet.' ELSE ln END AS line
        FROM punct
    ), per_line AS (
        SELECT doc_id, source, line,
               (regexp_matches(line, '[.!?"'']$')
                AND len(list_filter(str_split_regex(lower(line), '\\s+'),
                                    x -> x <> '')) >= 3
                AND NOT contains(lower(line), 'javascript')) AS keep
        FROM lines WHERE line <> ''
    ), per_doc AS (
        SELECT doc_id, source,
               count(*) AS n_lines,
               sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
               max(CASE WHEN contains(lower(line), 'lorem ipsum')
                        THEN 1 ELSE 0 END) AS has_lorem
        FROM per_line GROUP BY doc_id, source
    )
    SELECT source,
           CAST(sum(n_lines) AS BIGINT) AS lines_total,
           CAST(sum(n_kept) AS BIGINT) AS lines_kept,
           CAST(count(*) AS BIGINT) AS docs_total,
           CAST(sum(CASE WHEN has_lorem = 0 AND n_kept >= 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept
    FROM per_doc GROUP BY source
"""


def _synth_url() -> F.Column:
    did = F.col("doc_id")
    s = lambda x: x.cast("string")  # noqa: E731
    return F.concat(
        F.element_at(F.array(F.lit("http"), F.lit("HTTPS")), s(did % 2).cast("int") + 1),
        F.lit("://"),
        F.element_at(
            F.array(F.lit("WWW."), F.lit("cdn."), F.lit("")),
            s(did % 3).cast("int") + 1,
        ),
        F.col("source"),
        s(did % 7),
        F.lit(".com"),
        F.element_at(
            F.array(F.lit(":443"), F.lit(""), F.lit(":8080"), F.lit(":80")),
            s(did % 4).cast("int") + 1,
        ),
        F.lit("/Page"),
        s(did % 5),
        F.when(did % 6 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="),
        s(did % 10),
        F.when(did % 8 == 0, F.lit("&fbclid=xyz&b=2&a=1")).otherwise(
            F.lit("")
        ),
        F.lit("#frag"),
    )


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameter-aware URL canonicalization census
    (operators/webcuration.canonicalize_url): synthetic URLs per doc with
    scheme-case / subdomain / default-port / trailing-slash / tracking-
    param / fragment variety planted by doc_id residue; canonicalization
    lowercases the host, strips :80/:443, drops the fragment and
    utm_*/fbclid-class params, sorts survivors, trims trailing slashes.
    Output: per canonical URL, how many raw variants collapsed onto it —
    the URL-dedup merge census. All JVM regexp/array expressions at scan
    speed; the oracle mirrors every regexp verbatim."""
    from m13_sparkstreaming_python_azure_spark.operators.webcuration import (
        canonicalize_url,
    )

    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id", _synth_url().alias("url")
    ).select("doc_id", "url", canonicalize_url(F.col("url")).alias("canonical"))
    return urls.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.min("doc_id").alias("min_doc_id"),
    )


_URL_SQL = """
    WITH urls AS (
        SELECT doc_id,
               ['http','HTTPS'][(doc_id % 2)::INT + 1] || '://'
               || ['WWW.','cdn.',''][(doc_id % 3)::INT + 1]
               || source || CAST(doc_id % 7 AS VARCHAR) || '.com'
               || [':443','',':8080',':80'][(doc_id % 4)::INT + 1]
               || '/Page' || CAST(doc_id % 5 AS VARCHAR)
               || CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END
               || '?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR)
               || CASE WHEN doc_id % 8 = 0 THEN '&fbclid=xyz&b=2&a=1'
                       ELSE '' END
               || '#frag' AS url
        FROM documents
    ), parts AS (
        SELECT doc_id, url,
               regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '')
                   AS rest,
               regexp_extract(url, '\\?([^#]*)', 1) AS query
        FROM urls
    ), pieces AS (
        SELECT doc_id,
               regexp_replace(lower(regexp_extract(rest, '^([^/?#]+)', 1)),
                              ':(80|443)$', '') AS host,
               regexp_replace(
                   regexp_extract(rest, '^[^/?#]+([^?#]*)', 1),
                   '/+$', '') AS path,
               array_to_string(
                   list_sort(
                       list_filter(str_split(query, '&'),
                           p -> p <> '' AND NOT regexp_matches(
                               str_split(lower(p), '=')[1],
                               '^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid)$'))),
                   '&') AS qs
        FROM parts
    ), canon AS (
        SELECT doc_id,
               host || path
               || CASE WHEN coalesce(qs, '') <> '' THEN '?' || qs
                       ELSE '' END AS canonical
        FROM pieces
    )
    SELECT canonical,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM canon GROUP BY canonical
"""


_BOOL_CLAUSES = [
    {"all": ["spark", "window"], "none": ["merge"]},
    {"all": ["hash", "join"]},
]


def q_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean (DNF) retrieval over token postings
    (operators/retrieval.boolean_search): documents matching
    (spark AND window AND NOT merge) OR (hash AND join), tagged with the
    lowest matching clause. Postings are pruned to the query vocabulary
    BEFORE the per-doc flag aggregate — O(query terms) rows per doc, the
    inverted-index probe shape, never a full-corpus pivot."""
    from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
        boolean_search,
    )

    docs = load_table(spark, sf_dir, "documents")
    return boolean_search(docs, _BOOL_CLAUSES).select(
        "doc_id", F.col("clause").cast("long").alias("clause")
    )


_BOOL_SQL = """
    WITH flags AS (
        SELECT doc_id,
               list_filter(str_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), f2 AS (
        SELECT doc_id,
               list_contains(t, 'spark') AS has_spark,
               list_contains(t, 'window') AS has_window,
               list_contains(t, 'merge') AS has_merge,
               list_contains(t, 'hash') AS has_hash,
               list_contains(t, 'join') AS has_join
        FROM flags
    )
    SELECT doc_id,
           CAST(CASE WHEN has_spark AND has_window AND NOT has_merge THEN 0
                     WHEN has_hash AND has_join THEN 1 END AS BIGINT)
               AS clause
    FROM f2
    WHERE (has_spark AND has_window AND NOT has_merge)
       OR (has_hash AND has_join)
"""


def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup detection (Schleimer et al. SIGMOD'03, the MOSS
    fingerprinter — operators/spans.winnowing_fingerprints): 5-gram md5
    hashes, rightmost-min of each 4-window selected via a unique
    composite key (hash·2²⁰ + 2²⁰−1−pos), matches = pairs sharing ≥ 2
    selected fingerprints through a fingerprint-keyed equi-join (the
    LSH-band shape, never all-pairs). Guarantee: any shared run of
    ≥ w+k−1 = 8 tokens yields a shared fingerprint. Output: matching
    pairs with shared-fingerprint counts."""
    from m13_sparkstreaming_python_azure_spark.operators.spans import (
        winnowing_fingerprints,
        winnowing_matches,
    )

    docs = load_table(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(docs, "doc_id", k=5, w=4)
    return winnowing_matches(fps, "doc_id", min_shared=2)


_WINNOW_SQL = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(str_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, i - 1 AS pos,
               ('0x' || substring(
                    md5(array_to_string(t[i : i+4], ' ')), 1, 10))::BIGINT
                   AS h
        FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
        WHERE len(t) >= 5
    ), sel AS (
        SELECT DISTINCT doc_id,
               arg_min(pos, h * 1048576 + (1048575 - pos)) OVER wnd AS pos,
               arg_min(h,   h * 1048576 + (1048575 - pos)) OVER wnd AS h
        FROM grams
        WINDOW wnd AS (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM (SELECT DISTINCT doc_id, h FROM sel) a
    JOIN (SELECT DISTINCT doc_id, h FROM sel) b
      ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
"""


def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling draw census
    (operators/sampling.negative_sampling): 10k draws from the corpus
    unigram distribution^0.75 — weights are floor(sqrt(sqrt(n³))·1000)
    (two IEEE sqrts, engine-exact, unlike pow), draw targets are 16-bit
    md5 residues scaled by exact integer arithmetic, and each draw lands
    on its vocab slot via an interval probe of the BROADCAST cumulative
    weight table. The census (token, n_draws) is exact in both engines."""
    from m13_sparkstreaming_python_azure_spark.operators.sampling import (
        negative_sampling,
    )

    docs = load_table(spark, sf_dir, "documents")
    return negative_sampling(docs, n_samples=10_000, salt="neg7")


_NEGSAMPLE_SQL = """
    WITH vocab AS (
        SELECT token, count(*) AS n
        FROM (
            SELECT unnest(list_filter(
                str_split_regex(lower(text), '\\s+'), x -> x <> ''))
                AS token
            FROM documents
        ) GROUP BY token
    ), weighted AS (
        SELECT token,
               CAST(floor(sqrt(sqrt(
                   CAST(least(n, 100000) AS DOUBLE)
                   * CAST(least(n, 100000) AS DOUBLE)
                   * CAST(least(n, 100000) AS DOUBLE))) * CAST(1000 AS DOUBLE))
                   AS BIGINT) AS w
        FROM vocab
    ), cum AS (
        SELECT token, w,
               sum(w) OVER (ORDER BY token
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM weighted
    ), draws AS (
        SELECT (('0x' || substring(md5('neg7:' || CAST(s AS VARCHAR)),
                                   1, 4))::BIGINT
                * (SELECT max(cum) FROM cum)) // 65536 AS t
        FROM range(10000) AS r(s)
    )
    SELECT c.token, CAST(count(*) AS BIGINT) AS n_draws
    FROM draws d JOIN cum c
      ON d.t >= c.cum - c.w AND d.t < c.cum
    GROUP BY c.token
"""


def _cents(col: str = "o_totalprice") -> F.Column:
    return (
        F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long").alias("cents")
    )


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the snapshot layer (Delta mergeSchema parity):
    v1 writes (o_orderkey, cents); v2 APPENDS rows carrying a NEW column
    (status_len) — the manifest's schema DDL evolves (schema_history
    shows when the column appeared), old files read the column as NULL
    under a mergeSchema read. Gate output: census by column presence —
    row counts and exact sums on both column generations."""
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        read_manifest,
        read_snapshot,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders")
    table = tempfile.mkdtemp(prefix="schema-evo-")
    v1 = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", _cents()
    )
    write_snapshot(v1.coalesce(4), table)
    v2 = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        _cents(),
        F.length("o_orderstatus").cast("long").alias("status_len"),
    )
    append_snapshot(v2.coalesce(4), table)
    assert "status_len" in read_manifest(table)["schema"]
    merged = read_snapshot(spark, table, merge_schema=True)
    return merged.groupBy(
        F.col("status_len").isNotNull().alias("has_new_col")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("sum_cents"),
        F.sum(F.coalesce(F.col("status_len"), F.lit(0))).alias(
            "sum_status_len"
        ),
    )


_SCHEMA_EVO_SQL = """
    WITH v1 AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               CAST(NULL AS BIGINT) AS status_len
        FROM orders WHERE o_orderkey % 3 <> 0
    ), v2 AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               CAST(length(o_orderstatus) AS BIGINT) AS status_len
        FROM orders WHERE o_orderkey % 3 = 0
    ), merged AS (
        SELECT * FROM v1 UNION ALL SELECT * FROM v2
    )
    SELECT status_len IS NOT NULL AS has_new_col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(coalesce(status_len, 0)) AS BIGINT) AS sum_status_len
    FROM merged GROUP BY 1
"""


def q_table_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental change data feed from manifest deltas
    (sources/snapshots.snapshot_changes_incremental — the Delta CDF
    shape): v1 base write, v2 append, v3 DV delete; the feed over
    (v1, v3] reads ONLY the appended files and the DV'd positions'
    files — O(changed data), never two full version reads. Rows appear
    with (_change_type, _commit_version); a row inserted at v2 and
    deleted at v3 appears as BOTH (correct CDC semantics). The oracle
    restates both change sets directly from orders."""
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        delete_where,
        snapshot_changes_incremental,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders")
    table = tempfile.mkdtemp(prefix="cdf-")
    base = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", _cents()
    )
    write_snapshot(base.coalesce(4), table)  # v1
    appended = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", _cents()
    )
    append_snapshot(appended.coalesce(4), table)  # v2
    delete_where(spark, table, "cents % 7 = 0")  # v3
    return snapshot_changes_incremental(spark, table, 1, 3).select(
        "o_orderkey", "cents", "_change_type", "_commit_version"
    )


_CDF_SQL = """
    WITH cents AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_orderkey, cents,
           'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
    FROM cents WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, cents,
           'delete' AS _change_type, CAST(3 AS BIGINT) AS _commit_version
    FROM cents WHERE cents % 7 = 0
"""


def q_triangle_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients via DEGREE-ORDERED triangle counting
    (operators/graph.triangle_clustering — Suri-Vassilvitskii): the
    customer chain+chord+tree graph plants a triangle at every
    consecutive triple (k−2, k−1, k). Wedges generate at the
    (degree,id)-smallest endpoint — out-degree O(√m) even on hubs — and
    close with one equi-join. clustering = 2·tri/(deg·(deg−1)) is a
    ratio of identically-derived BIGINTs (IEEE-bit-equal, no grid). The
    oracle counts the same triangles via the orientation-independent
    a<b<c enumeration — per-node counts must agree exactly."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        triangle_clustering,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k")
    )
    chain = cust.filter(F.col("k") >= 1).select(
        F.col("k").alias("src"), (F.col("k") - 1).alias("dst")
    )
    chord = cust.filter(F.col("k") >= 2).select(
        F.col("k").alias("src"), (F.col("k") - 2).alias("dst")
    )
    tree = cust.filter(F.col("k") >= 2).select(
        F.col("k").alias("src"),
        (F.col("k") / 2).cast("bigint").alias("dst"),
    )
    edges = chain.unionByName(chord).unionByName(tree)
    return triangle_clustering(edges).select(
        F.col("node").alias("custkey"),
        "degree",
        "n_triangles",
        "clustering",
    )


_TRIANGLE_SQL = """
    WITH cust AS (
        SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
    ), e0 AS (
        SELECT k AS u, k - 1 AS v FROM cust WHERE k >= 1
        UNION ALL
        SELECT k AS u, k - 2 AS v FROM cust WHERE k >= 2
        UNION ALL
        SELECT k AS u, k // 2 AS v FROM cust WHERE k >= 2
    ), e AS (
        SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
        FROM e0 WHERE u <> v
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        GROUP BY node
    ), tri AS (
        SELECT x.a AS a, x.b AS b, y.b AS c
        FROM e x JOIN e y ON x.a = y.a AND x.b < y.b
        JOIN e z ON z.a = x.b AND z.b = y.b
    ), per_node AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    )
    SELECT d.node AS custkey, d.degree,
           coalesce(p.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN CAST(2 * coalesce(p.n_triangles, 0) AS DOUBLE)
                     / CAST(d.degree * (d.degree - 1) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS clustering
    FROM deg d LEFT JOIN per_node p ON d.node = p.node
"""


def q_streaming_table_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot table consumed AS A STREAMING SOURCE via the incremental
    CDF (sources/snapshots.consume_table_feed — the Delta
    stream-from-table shape): three append commits land event chunks, a
    DV delete revokes every 5th event; a cursor consumer polls THREE
    times (one poll spans two source versions), each poll appending the
    O(changed-data) feed to a sink snapshot with the consumed version as
    batch_id; a deliberately REPLAYED poll after the last commit must
    no-op (the cursor lives in the sink manifest — crash-replay safe).
    Gate output: per event type, inserts/deletes/net-live-cents from the
    SINK — must equal the oracle's direct restatement from events."""
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        consume_table_feed,
        delete_where,
        read_snapshot,
        write_snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    src = tempfile.mkdtemp(prefix="feed-src-")
    sink = tempfile.mkdtemp(prefix="feed-sink-")
    write_snapshot(ev.filter(F.col("event_id") % 3 == 0).coalesce(4), src)
    assert consume_table_feed(spark, src, sink) == 1  # poll 1
    append_snapshot(ev.filter(F.col("event_id") % 3 == 1).coalesce(4), src)
    append_snapshot(ev.filter(F.col("event_id") % 3 == 2).coalesce(4), src)
    assert consume_table_feed(spark, src, sink) == 3  # poll spans v2..v3
    delete_where(spark, src, "event_id % 5 = 0")
    assert consume_table_feed(spark, src, sink) == 4  # poll 3
    assert consume_table_feed(spark, src, sink) is None  # replay → no-op
    changes = read_snapshot(spark, sink)
    ins = (F.col("_change_type") == "insert").cast("long")
    dele = (F.col("_change_type") == "delete").cast("long")
    return changes.groupBy("event_type").agg(
        F.sum(ins).alias("n_inserts"),
        F.sum(dele).alias("n_deletes"),
        F.sum(
            F.when(F.col("_change_type") == "insert", F.col("cents"))
            .otherwise(-F.col("cents"))
        ).alias("net_live_cents"),
    )


_TABLE_FEED_SQL = """
    WITH c AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_inserts,
           CAST(sum(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_deletes,
           CAST(sum(CASE WHEN event_id % 5 = 0 THEN 0 ELSE cents END)
               AS BIGINT) AS net_live_cents
    FROM c GROUP BY event_type
"""


def q_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style GENERATED columns on the snapshot layer
    (sources/snapshots.add_generated_column): the table is created from
    raw events WITHOUT derived columns; ``cents AS floor(value·100+.5)``
    and ``event_date AS date_format(ts, ...)`` are declared AFTER the
    first commit — the reference's own derived-date pattern
    (upload.py:67 withColumn(processed_date)). A later append omits both
    (materialized at write); the pre-declaration files are completed at
    READ (computed where missing). Census by (event_date is stable,
    event_type) with exact cent sums — both column generations must
    agree with the oracle's direct derivation."""
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        add_generated_column,
        append_snapshot,
        read_snapshot,
        write_snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    table = tempfile.mkdtemp(prefix="gencol-")
    write_snapshot(ev.filter(F.col("event_id") % 2 == 0).coalesce(4), table)
    add_generated_column(
        spark, table, "cents", "CAST(floor(value * 100 + 0.5) AS BIGINT)"
    )
    add_generated_column(
        spark, table, "event_date", "date_format(ts, 'yyyy-MM-dd')"
    )
    append_snapshot(
        ev.filter(F.col("event_id") % 2 == 1).coalesce(4), table
    )
    t = read_snapshot(spark, table, merge_schema=True)
    return t.groupBy("event_date", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )


_GENCOL_SQL = """
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    GROUP BY 1, 2
"""


def q_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss peeling (operators/graph.k_truss, Cohen 2008) on the
    customer chain+chord+tree graph: 4 fixed rounds of triangle-support
    filtering (edge survives iff ≥ k−2 = 2 triangles among survivors) —
    the edge-grain cohesion filter that drops the weak bridges k-core
    keeps. Each round = one id-ordered triangle enumeration + one
    edge-keyed aggregate, lineage-truncated; the oracle unrolls the SAME
    4 rounds as MATERIALIZED CTEs (plain CTEs inline exponentially —
    the r6 HITS lesson). Returns surviving edges with last-round
    support."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        k_truss,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k")
    )
    chain = cust.filter(F.col("k") >= 1).select(
        F.col("k").alias("src"), (F.col("k") - 1).alias("dst")
    )
    chord = cust.filter(F.col("k") >= 2).select(
        F.col("k").alias("src"), (F.col("k") - 2).alias("dst")
    )
    tree = cust.filter(F.col("k") >= 2).select(
        F.col("k").alias("src"),
        (F.col("k") / 2).cast("bigint").alias("dst"),
    )
    edges = chain.unionByName(chord).unionByName(tree)
    return k_truss(edges, k=4, rounds=4)


def _truss_round_sql(i: int) -> str:
    return f"""
    tri{i} AS MATERIALIZED (
        SELECT x.a AS ta, x.b AS tb, y.b AS tc
        FROM e{i} x
        JOIN e{i} y ON x.a = y.a AND x.b < y.b
        JOIN e{i} z ON z.a = x.b AND z.b = y.b
    ), s{i} AS MATERIALIZED (
        SELECT a, b, CAST(count(*) AS BIGINT) AS support
        FROM (
            SELECT ta AS a, tb AS b FROM tri{i}
            UNION ALL SELECT ta, tc FROM tri{i}
            UNION ALL SELECT tb, tc FROM tri{i}
        ) GROUP BY a, b
    ), e{i + 1} AS MATERIALIZED (
        SELECT a, b FROM s{i} WHERE support >= 2
    )"""


_KTRUSS_SQL = (
    """
    WITH cust AS (
        SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
    ), e_raw AS (
        SELECT k AS u, k - 1 AS v FROM cust WHERE k >= 1
        UNION ALL
        SELECT k AS u, k - 2 AS v FROM cust WHERE k >= 2
        UNION ALL
        SELECT k AS u, k // 2 AS v FROM cust WHERE k >= 2
    ), e0 AS MATERIALIZED (
        SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
        FROM e_raw WHERE u <> v
    ), """
    + ", ".join(_truss_round_sql(i).strip() for i in range(4))
    + """
    SELECT a, b, support FROM s3 WHERE support >= 2
"""
)


def q_trailing_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day — the windowed
    COUNT(DISTINCT) Spark windows can't express natively (DISTINCT isn't
    allowed over a frame): the day calendar (bounded) fans out to its 7
    trailing source days (explode of a 7-element sequence), joins the
    per-(day, user) DISTINCT activity table on the source day, and a
    day-keyed exact distinct count closes it. Cost: 7× the per-day
    activity table — rows, not raw events; the raw stream collapses to
    (day, user) FIRST. Epoch-day integers everywhere (calendar functions
    diverge across engines — memory rule)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
        )
        .cast("long")
        .alias("day"),
        "user_id",
    ).distinct()
    days = ev.select("day").distinct()
    expanded = days.select(
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
    ).select("day", (F.col("day") - F.col("off")).alias("src_day"))
    joined = expanded.join(
        ev.withColumnRenamed("day", "src_day"), "src_day"
    )
    return joined.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_active_7d")
    )


_TRAILING_SQL = """
    WITH ev AS (
        SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               user_id
        FROM events
    ), days AS (
        SELECT DISTINCT day FROM ev
    ), expanded AS (
        SELECT d.day, d.day - o.off AS src_day
        FROM days d, unnest([0, 1, 2, 3, 4, 5, 6]) AS o(off)
    )
    SELECT e.day, CAST(count(DISTINCT v.user_id) AS BIGINT) AS n_active_7d
    FROM expanded e JOIN ev v ON v.day = e.src_day
    GROUP BY e.day
"""


R7_QUERIES = {
    "k_truss": q_k_truss,
    "trailing_distinct_users": q_trailing_distinct_users,
    "generated_columns": q_generated_columns,
    "streaming_table_feed": q_streaming_table_feed,
    "triangle_clustering": q_triangle_clustering,
    "schema_evolution": q_schema_evolution,
    "table_changes_feed": q_table_changes_feed,
    "winnowing_fingerprints": q_winnowing_fingerprints,
    "negative_sampling": q_negative_sampling,
    "gopher_quality_rules": q_gopher_quality_rules,
    "c4_line_filters": q_c4_line_filters,
    "url_canonicalize": q_url_canonicalize,
    "boolean_retrieval": q_boolean_retrieval,
}

R7_ORACLES = {
    "k_truss": _KTRUSS_SQL,
    "trailing_distinct_users": _TRAILING_SQL,
    "generated_columns": _GENCOL_SQL,
    "streaming_table_feed": _TABLE_FEED_SQL,
    "triangle_clustering": _TRIANGLE_SQL,
    "schema_evolution": _SCHEMA_EVO_SQL,
    "table_changes_feed": _CDF_SQL,
    "winnowing_fingerprints": _WINNOW_SQL,
    "negative_sampling": _NEGSAMPLE_SQL,
    "gopher_quality_rules": _GOPHER_SQL,
    "c4_line_filters": _C4_SQL,
    "url_canonicalize": _URL_SQL,
    "boolean_retrieval": _BOOL_SQL,
}
