"""Media-dedup gates: perceptual dHash fingerprints through the REAL
image decoder, and banded Hamming near-duplicate pairs. The oracle
replays the hash bit-for-bit from the md5-derived synthetic PPM bytes
(``multimodal.attach_ppm_payload``'s contract), so these rows certify
the decoder + luma + bit packing, not just the join plumbing.
"""

from __future__ import annotations

from ..operators import multimodal, phash
from .pipeline_queries import _hexcat_sql
from .relational import t as _t


def q_image_dhash(spark, sf_dir):
    """Per-image 28-bit difference hash via the real PPM decoder
    (mapInPandas, no shuffle)."""
    media = multimodal.attach_ppm_payload(_t(spark, sf_dir, "documents"))
    return phash.image_dhash(
        media, repartition_to=spark.sparkContext.defaultParallelism
    )


# Rebuild the decoder's view from the same md5 hex: pixel p has RGB at
# bytes 3p..3p+2; integer BT.601 luma (77R+150G+29B)//256; dHash bit
# y*7+x set iff luma(y,x+1) > luma(y,x). Any stride/channel/shift error
# in the real decode path diverges.
_DHASH_CTE = f"""
px AS (
  SELECT doc_id, {_hexcat_sql('px', 6)} AS hex FROM documents
),
byt AS (
  SELECT doc_id, i,
         CAST(('0x' || substring(hex, 2 * i + 1, 2)) AS BIGINT) AS v
  FROM px, range(0, 96) AS r(i)
),
luma AS (
  SELECT doc_id, i // 3 AS p,
         SUM(CASE WHEN i % 3 = 0 THEN 77 * v
                  WHEN i % 3 = 1 THEN 150 * v
                  ELSE 29 * v END) // 256 AS y
  FROM byt GROUP BY doc_id, i // 3
),
grad AS (
  SELECT doc_id, p, y,
         lead(y) OVER (PARTITION BY doc_id ORDER BY p) AS nxt
  FROM luma
),
dh AS (
  SELECT doc_id,
         CAST(COALESCE(SUM(CASE WHEN p % 8 < 7 AND nxt > y
           THEN (CAST(1 AS BIGINT) << ((p // 8) * 7 + (p % 8))) END), 0)
           AS BIGINT) AS dhash,
         CAST(28 AS INT) AS n_bits
  FROM grad GROUP BY doc_id
)
"""

ORACLE_IMAGE_DHASH = f"""
WITH {_DHASH_CTE}
SELECT doc_id, dhash, n_bits FROM dh
"""


def q_image_near_dup_pairs(spark, sf_dir):
    """Near-duplicate image pairs: banded Hamming join over the real
    decoder's fingerprints (exact recall at distance ≤ 3 with 4 bands —
    pigeonhole); the oracle is the direct all-pairs comparison."""
    media = multimodal.attach_ppm_payload(_t(spark, sf_dir, "documents"))
    hashes = phash.image_dhash(
        media, repartition_to=spark.sparkContext.defaultParallelism
    )
    return phash.dhash_near_pairs(hashes, n_bits=28, bands=4, max_distance=3)


ORACLE_IMAGE_NEAR_DUP = f"""
WITH {_DHASH_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM dh a JOIN dh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
"""


MEDIA_QUERIES = {
    "image_dhash": (q_image_dhash, ORACLE_IMAGE_DHASH),
    "image_near_dup_pairs": (q_image_near_dup_pairs, ORACLE_IMAGE_NEAR_DUP),
}
