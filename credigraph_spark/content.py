"""Content-table operators (SURVEY.md §2.2 P3/P6, §2.5 W1, §2.6 O4).

Reference: tgrag/cc-scripts/wet_extract_domain_content.py — per-domain WET
text selection: length filter, language filter, then keep the top-2 and
bottom-2 records by Content_Length per domain (row_number windows, union,
distinct, :157-170).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def length_filter(df: DataFrame, col: str = "Content_Length", min_len: int = 500) -> DataFrame:
    """P3 (wet_extract_domain_content.py:157)."""
    return df.where(F.col(col) >= min_len)


def language_filter(df: DataFrame, col: str = "WARC_Identified_Content_Language",
                    langs: tuple[str, ...] = ("eng", "fra")) -> DataFrame:
    """P6: any of the comma-joined record languages intersects the allowed
    set (wet_extract_domain_content.py:35,76-87) — arrays_overlap, no UDF."""
    return df.where(
        F.arrays_overlap(F.split(F.col(col), ","), F.array(*[F.lit(x) for x in langs]))
    )


def top_bottom_k_per_group(df: DataFrame, group_col: str, order_col: str,
                           k: int = 2, tiebreak: str | None = None) -> DataFrame:
    """W1: per group keep k largest and k smallest by order_col, union,
    distinct (wet_extract_domain_content.py:158-170). The ONE genuine
    window op in the reference — kept as two ranked windows. Pass
    ``tiebreak`` (e.g. a key column) to make row_number deterministic
    under order_col ties."""
    tb = [F.col(tiebreak).asc()] if tiebreak else []
    w_desc = Window.partitionBy(group_col).orderBy(F.col(order_col).desc(), *tb)
    w_asc = Window.partitionBy(group_col).orderBy(F.col(order_col).asc(), *tb)
    top = df.withColumn("_rn", F.row_number().over(w_desc)).where(F.col("_rn") <= k)
    bot = df.withColumn("_rn", F.row_number().over(w_asc)).where(F.col("_rn") <= k)
    return top.unionByName(bot).drop("_rn").distinct()
