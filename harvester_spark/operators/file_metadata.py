"""File-metadata operators: P9 tri-state, P10 URL validation, P11 MIME map,
A3 tree rollup — the harvester's per-file normalization chain on generic
inputs (SURVEY.md §2.2/§2.4).

Synthetic file rows derive deterministically from ``documents`` (url/copyright/
access per doc_id) so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from harvester_spark.operators.common import load

# MIME → technical_type (90-entry map in the reference,
# /root/reference/harvester/files/models/datatypes/file.py:167-172 +
# settings/base.py:418-489); representative subset, same lookup shape.
MIME_MAP = {
    "application/pdf": "document",
    "text/html": "website",
    "video/mp4": "video",
    "audio/mpeg": "audio",
    "image/png": "image",
    "application/zip": "archive",
}
_EXT_MIME = {
    "pdf": "application/pdf",
    "html": "text/html",
    "mp4": "video/mp4",
    "mp3": "audio/mpeg",
    "png": "image/png",
    "zip": "application/zip",
}
_EXTS = list(_EXT_MIME)
_COPYRIGHTS = ["open-access", "restricted-access", "closed-access"]
_RIGHTS = ["OpenAccess", "RestrictedAccess", "ClosedAccess"]


def _files(spark, sf_dir):
    """Synthetic file rows: url with extension, copyright, access_rights."""
    docs = load(spark, sf_dir, "documents")
    ext = F.element_at(F.array(*[F.lit(e) for e in _EXTS]), (F.col("doc_id") % 6 + 1).cast("int"))
    bad = F.col("doc_id") % 17 == 0  # invalid-url rows
    url = F.when(
        bad, F.concat(F.lit("not a url "), F.col("doc_id").cast("string"))
    ).otherwise(
        F.concat(
            F.lit("https://files.example.org/store/"),
            F.col("doc_id").cast("string"),
            F.lit("/item."),
            ext,
        )
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        ext.alias("ext"),
        F.element_at(F.array(*[F.lit(c) for c in _COPYRIGHTS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("copyright"),
        F.element_at(F.array(*[F.lit(r) for r in _RIGHTS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("access_rights"),
    )


_SQL_FILES = """
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0
              THEN 'not a url ' || CAST(doc_id AS VARCHAR)
              ELSE 'https://files.example.org/store/' || CAST(doc_id AS VARCHAR)
                   || '/item.' || ['pdf','html','mp4','mp3','png','zip'][CAST(doc_id % 6 + 1 AS INT)]
         END AS url,
         ['pdf','html','mp4','mp3','png','zip'][CAST(doc_id % 6 + 1 AS INT)] AS ext,
         ['open-access','restricted-access','closed-access'][CAST(doc_id % 3 + 1 AS INT)] AS copyright,
         ['OpenAccess','RestrictedAccess','ClosedAccess'][CAST(doc_id % 3 + 1 AS INT)] AS access_rights
  FROM documents
"""


def p10_url_validation(spark, sf_dir):
    """URL validity + host extraction (files/models/datatypes/file.py:158-166):
    invalid urls flag ``is_not_found``; hosts via parse_url."""
    f = _files(spark, sf_dir)
    valid = F.col("url").rlike(r"^https?://[^\s/]+\.[^\s/]+/")
    return f.select(
        "doc_id",
        "url",
        valid.alias("is_valid"),
        (~valid).alias("is_not_found"),
        F.when(valid, F.parse_url(F.col("url"), F.lit("HOST"))).alias("host"),
    )


SQL_P10 = f"""
WITH files AS ({_SQL_FILES})
SELECT doc_id, url,
       regexp_matches(url, '^https?://[^\\s/]+\\.[^\\s/]+/') AS is_valid,
       NOT regexp_matches(url, '^https?://[^\\s/]+\\.[^\\s/]+/') AS is_not_found,
       CASE WHEN regexp_matches(url, '^https?://[^\\s/]+\\.[^\\s/]+/')
            THEN regexp_extract(url, '^https?://([^/]+)/', 1) END AS host
FROM files
"""


def p11_mime_mapping(spark, sf_dir):
    """suffix → MIME → technical_type via a broadcast map join (the 90-entry
    dict lookup, file.py:167-172): unknown → 'unknown'."""
    f = _files(spark, sf_dir)
    mime_df = spark.createDataFrame(
        [(e, m, MIME_MAP[m]) for e, m in _EXT_MIME.items()],
        "ext string, mime string, technical_type string",
    )
    return (
        f.join(F.broadcast(mime_df), "ext", "left")
        .select(
            "doc_id",
            "ext",
            F.coalesce("mime", F.lit("application/octet-stream")).alias("mime"),
            F.coalesce("technical_type", F.lit("unknown")).alias("technical_type"),
        )
    )


_sql_mime_rows = ", ".join(
    f"('{e}', '{m}', '{MIME_MAP[m]}')" for e, m in _EXT_MIME.items()
)
SQL_P11 = f"""
WITH files AS ({_SQL_FILES}),
mime_map(ext, mime, technical_type) AS (VALUES {_sql_mime_rows})
SELECT f.doc_id, f.ext,
       coalesce(m.mime, 'application/octet-stream') AS mime,
       coalesce(m.technical_type, 'unknown') AS technical_type
FROM files f LEFT JOIN mime_map m USING (ext)
"""


def p9_analysis_allowed(spark, sf_dir):
    """Tri-state is_analysis_allowed from (access_rights, copyright)
    (file.py:148-156): Open → true, Restricted → derived from copyright,
    Closed → false."""
    f = _files(spark, sf_dir)
    allowed = (
        F.when(F.col("access_rights") == "OpenAccess", F.lit(True))
        .when(
            F.col("access_rights") == "RestrictedAccess",
            F.col("copyright").startswith("open"),
        )
        .otherwise(F.lit(False))
    )
    return f.select("doc_id", "access_rights", "copyright", allowed.alias("is_analysis_allowed"))


SQL_P9 = f"""
WITH files AS ({_SQL_FILES})
SELECT doc_id, access_rights, copyright,
       CASE WHEN access_rights = 'OpenAccess' THEN true
            WHEN access_rights = 'RestrictedAccess' THEN starts_with(copyright, 'open')
            ELSE false END AS is_analysis_allowed
FROM files
"""


def a3_tree_rollup(spark, sf_dir):
    """Tree-rollup frequency (metadata/models/value.py:93-97): leaf counts
    summed into every ancestor of a region→nation 2-level facet tree, via
    ancestor-explode + groupBy (the MPTT closure pattern)."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    orders = load(spark, sf_dir, "orders")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    per_order = orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
    # ancestor-explode: each order counts for its nation AND its region node
    nodes = per_order.select(
        F.explode(
            F.array(
                F.concat(F.lit("nation:"), F.col("n_name")),
                F.concat(F.lit("region:"), F.col("r_name")),
            )
        ).alias("node")
    )
    return nodes.groupBy("node").agg(F.count("*").alias("frequency"))


SQL_A3 = """
WITH per_order AS (
  SELECT n.n_name, r.r_name
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
),
nodes AS (
  SELECT 'nation:' || n_name AS node FROM per_order
  UNION ALL
  SELECT 'region:' || r_name AS node FROM per_order
)
SELECT node, count(*) AS frequency FROM nodes GROUP BY node
"""


QUERIES = {
    "p9_analysis_allowed": (p9_analysis_allowed, SQL_P9),
    "p10_url_validation": (p10_url_validation, SQL_P10),
    "p11_mime_mapping": (p11_mime_mapping, SQL_P11),
    "a3_tree_rollup": (a3_tree_rollup, SQL_A3),
}
