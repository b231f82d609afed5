"""Corpus-preparation operators, round 2: the two remaining transforms a
pretraining data pipeline runs between "cleaned corpus" and "training
shards".

- ``x_chunk_docs`` — overlapping token-window chunking (window 64, stride
  48): the context-window prep step that turns documents into model-sized
  pieces. Entirely narrow: tokenize → start offsets via an array
  ``sequence`` → ``posexplode`` — zero shuffles at any scale (plan-test
  asserted), because chunking is per-document and never needs another row.
  Trailing windows fully contained in the previous one are dropped (the
  standard rule: a new chunk must contribute at least stride new tokens,
  except the first).
- ``x_embed_quantize`` — scalar uint8 quantization of the embedding
  column: global [min, max] over all elements → per-element code
  ``floor((v - min) / (max - min) * 256)`` clamped to 255. The stats side
  is a 1-row two-phase aggregate broadcast back over the corpus (the same
  broadcast-scalar shape as x_text_tfidf's doc count), so the whole
  operator is one narrow pass plus a driver-free 1-row exchange. ``floor``
  (not ``round``) keeps the code grid exactly reproducible cross-engine:
  no decimal-midpoint rule is ever consulted (canonical.py hazard #2).
  At 100 TB this is the 4× storage/IO lever before ANN indexing
  (x_sim_ivf consumes the same vectors); codes are exact integers, so
  shards reconcile byte-for-byte after requantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

# ---------------------------------------------------------------------------
# x_chunk_docs — overlapping token-window chunking
# ---------------------------------------------------------------------------

_WINDOW = 64
_STRIDE = 48

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
s AS (
  SELECT doc_id, toks, n,
         list_filter(range(0, n, {_STRIDE}),
                     x -> x = 0 OR x < n - {_WINDOW - _STRIDE}) AS starts
  FROM t
),
e AS (
  SELECT doc_id, toks, n,
         generate_subscripts(starts, 1) - 1 AS chunk_idx,
         unnest(starts) AS c_start
  FROM s
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(c_start AS INT) AS chunk_start,
       CAST(LEAST({_WINDOW}, n - c_start) AS INT) AS n_tokens,
       md5(array_to_string(
         list_slice(toks, c_start + 1, c_start + {_WINDOW}), ' ')) AS chunk_md5
FROM e
"""


@query("x_chunk_docs", oracle=_CHUNK_ORACLE)
def x_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into 64-token chunks with 16-token overlap
    (stride 48). Start offsets are an array-side ``sequence`` filtered to
    drop trailing windows that add fewer than stride new tokens; the md5
    of each chunk's text is the shard-level identity later dedup/recon
    stages key on. Narrow end-to-end: the output is chunk-count-sized but
    no row ever crosses a partition boundary."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    keep_new_tokens = _WINDOW - _STRIDE
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(_STRIDE)),
        lambda s: (s == 0) | (s < n - keep_new_tokens),
    )
    exploded = d.select(
        "doc_id", "text", F.posexplode(starts).alias("chunk_idx", "chunk_start")
    )
    toks2 = F.split("text", " ")
    n2 = F.size(toks2)
    chunk_text = F.concat_ws(
        " ", F.slice(toks2, F.col("chunk_start") + 1, F.lit(_WINDOW))
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.least(F.lit(_WINDOW), n2 - F.col("chunk_start"))
        .cast("int")
        .alias("n_tokens"),
        F.md5(chunk_text).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# x_embed_quantize — scalar uint8 quantization of the embedding column
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH stats AS (
  SELECT CAST(MIN(list_min(embedding)) AS DOUBLE) AS mn,
         CAST(MAX(list_max(embedding)) AS DOUBLE) AS mx
  FROM embeddings
)
SELECT vec_id,
       CAST(len(embedding) AS INT) AS n_dims,
       array_to_string(list_transform(embedding,
         v -> CAST(LEAST(FLOOR((CAST(v AS DOUBLE) - mn) / (mx - mn) * 256),
                         255) AS INT)), ',') AS codes,
       mn AS scale_min,
       mx AS scale_max
FROM embeddings, stats
"""


@query("x_embed_quantize", oracle=_QUANT_ORACLE)
def x_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uint8 scalar quantization: one global [min, max] (1-row broadcast)
    and a narrow per-element ``floor`` onto the 256-level grid. Codes are
    exact integers — float→double promotion, subtraction, division and
    floor are bit-deterministic IEEE ops evaluated with identical
    association on both engines, so the full code string is hash-checked
    (not rows-only). Per-dimension (rather than global) scales would be
    the quality upgrade at scale: same plan with a posexplode + 64-row
    broadcast instead of the 1-row one."""
    e = load(spark, sf_dir, "embeddings")
    stats = e.agg(
        F.min(F.array_min("embedding")).cast("double").alias("mn"),
        F.max(F.array_max("embedding")).cast("double").alias("mx"),
    )
    mn, mx = F.col("mn"), F.col("mx")
    codes = F.transform(
        "embedding",
        lambda v: F.least(
            F.floor((v.cast("double") - mn) / (mx - mn) * 256), F.lit(255)
        ).cast("int"),
    )
    return e.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        F.size("embedding").cast("int").alias("n_dims"),
        F.concat_ws(",", codes.cast("array<string>")).alias("codes"),
        mn.alias("scale_min"),
        mx.alias("scale_max"),
    )


# ---------------------------------------------------------------------------
# x_embed_quantize_perdim — per-dimension uint8 quantization
# ---------------------------------------------------------------------------

_QUANT_PERDIM_ORACLE = """
WITH flat AS (
  SELECT vec_id,
         unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
stats AS (
  SELECT pos,
         CAST(MIN(x) AS DOUBLE) AS mn,
         CAST(MAX(x) AS DOUBLE) AS mx
  FROM flat GROUP BY pos
),
codes AS (
  SELECT f.vec_id, f.pos,
         CAST(LEAST(FLOOR((CAST(f.x AS DOUBLE) - s.mn) / (s.mx - s.mn) * 256),
                    255) AS INT) AS code
  FROM flat f JOIN stats s USING (pos)
)
SELECT vec_id,
       CAST(COUNT(*) AS INT) AS n_dims,
       string_agg(code, ',' ORDER BY pos) AS codes
FROM codes GROUP BY vec_id
"""


@query("x_embed_quantize_perdim", oracle=_QUANT_PERDIM_ORACLE)
def x_embed_quantize_perdim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension uint8 quantization — the quality upgrade over
    x_embed_quantize's single global scale: each of the 64 dimensions gets
    its own [min, max] grid, so a dimension with small dynamic range keeps
    its resolution instead of collapsing into a few global levels.
    Plan: posexplode → 64-row per-dimension stats aggregate → broadcast
    join back on pos → floor onto the 256-level grid → re-assemble codes
    in pos order (array_sort over collected (pos, code) structs — no
    second window shuffle). Same cross-engine exactness argument as the
    global variant: float→double promotion, subtraction, division and
    floor consult no midpoint rule. The stats side is dims-count-sized
    (64 rows at any corpus scale) — always broadcastable."""
    e = load(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
    stats = flat.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    code = F.least(
        F.floor((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 256),
        F.lit(255),
    ).cast("int")
    coded = flat.join(F.broadcast(stats), "pos").select(
        "vec_id", "pos", code.alias("code")
    )
    return coded.groupBy("vec_id").agg(
        F.count("*").cast("int").alias("n_dims"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "code"))),
                lambda s: s["code"].cast("string"),
            ),
            ",",
        ).alias("codes"),
    )
