"""Directed triad census over the connected-triangle classes (X194).

Not present in the reference (its analytics stop at undirected triangle
counts, tgrag/algorithms — see SURVEY.md §2.9 G7); this extends the
motif family to the directed Holland–Leinhardt classes restricted to
triads whose three dyads are all connected — the seven triangle classes
030T, 030C, 120D, 120U, 120C, 210, 300 (networkx label convention:
with one mutual dyad and third node w, indeg(w)=2 -> 120D,
outdeg(w)=2 -> 120U, mixed -> 120C).

Physical design: triangles are enumerated once on the UNDIRECTED
support with the same degree-orientation scheme as triangle_count
(graph/triangles.py) — oriented out-degree bounded by O(sqrt(E)), so
hub vertices cannot explode the wedge join — and each triangle's three
dyads are then resolved by three shuffle joins against a canonical
dyad-type table (pair a<b with fwd/rev arc flags, one groupBy over the
directed edges).  Classification is a pure CASE expression (JVM-side,
whole-stage codegen); the result is a tiny per-class aggregate.  At
100 TB the dominant cost is the oriented wedge join, identical in
shape to the proven triangle counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import clean_edges

from credigraph_spark.session import eager_checkpoint


TRIAD_CLASSES = ["030T", "030C", "120D", "120U", "120C", "210", "300"]


def _dyads(e: DataFrame) -> DataFrame:
    """Canonical dyad table: (a<b, fwd = a->b exists, rev = b->a exists)."""
    return (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), F.lit(1)).otherwise(F.lit(0)).alias("f"),
            F.when(F.col("src") > F.col("dst"), F.lit(1)).otherwise(F.lit(0)).alias("r"),
        )
        .groupBy("a", "b")
        .agg(F.max("f").alias("fwd"), F.max("r").alias("rev"))
    )


def _triangles_sorted(dyads: DataFrame, shuffle_n: int) -> DataFrame:
    """Enumerate each undirected triangle once as (a < b < c), via
    degree orientation on the undirected support."""
    und = dyads.select("a", "b")
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )
    keyed = (
        und.join(deg.select(F.col("vid").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("vid").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).repartition(shuffle_n, "u")

    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    wedges = e1.join(e2, "u").where(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"], "inner")
    # canonical ascending (a, b, c)
    return tris.select(
        F.least("u", "v1", "v2").alias("a"),
        F.greatest("u", "v1", "v2").alias("c"),
        (F.col("u") + F.col("v1") + F.col("v2")
         - F.least("u", "v1", "v2") - F.greatest("u", "v1", "v2")).alias("b"),
    ).select("a", "b", "c")


def triad_class_census(edges: DataFrame) -> DataFrame:
    """Census of the 7 connected-triangle triad classes.

    Returns (triad_class string, n long) with all 7 classes present
    (zero-filled), ordered by triad_class.
    """
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = clean_edges(edges)
    # eager localCheckpoint, not persist: the returned plan is lazy, so
    # an unpersist-before-return would void a cache; the dyad table
    # feeds FOUR subplans (the triangle enumeration + three lookups)
    dy = _dyads(e).transform(eager_checkpoint)
    tris = _triangles_sorted(dy, shuffle_n)

    j = (
        tris
        .join(dy.select(F.col("a"), F.col("b"),
                        F.col("fwd").alias("f_ab"), F.col("rev").alias("r_ab")),
              ["a", "b"])
        .join(dy.select(F.col("a").alias("b"), F.col("b").alias("c"),
                        F.col("fwd").alias("f_bc"), F.col("rev").alias("r_bc")),
              ["b", "c"])
        .join(dy.select(F.col("a"), F.col("b").alias("c"),
                        F.col("fwd").alias("f_ac"), F.col("rev").alias("r_ac")),
              ["a", "c"])
    )

    m_ab = (F.col("f_ab") == 1) & (F.col("r_ab") == 1)
    m_bc = (F.col("f_bc") == 1) & (F.col("r_bc") == 1)
    m_ac = (F.col("f_ac") == 1) & (F.col("r_ac") == 1)
    n_mut = (
        m_ab.cast("int") + m_bc.cast("int") + m_ac.cast("int")
    )

    # per-vertex in/out degree inside the triangle (arcs among {a,b,c})
    in_a = F.col("r_ab") + F.col("r_ac")
    out_a = F.col("f_ab") + F.col("f_ac")
    in_b = F.col("f_ab") + F.col("r_bc")
    out_b = F.col("r_ab") + F.col("f_bc")
    in_c = F.col("f_ac") + F.col("f_bc")
    out_c = F.col("r_ac") + F.col("r_bc")

    cyc = ((F.col("f_ab") == 1) & (F.col("f_bc") == 1) & (F.col("r_ac") == 1)) | (
        (F.col("r_ab") == 1) & (F.col("r_bc") == 1) & (F.col("f_ac") == 1)
    )

    # third node w of the (single) mutual dyad; its in/out degree
    w_in = (
        F.when(m_ab, in_c).when(m_bc, in_a).otherwise(in_b)
    )
    w_out = (
        F.when(m_ab, out_c).when(m_bc, out_a).otherwise(out_b)
    )

    cls = (
        F.when(n_mut == 3, F.lit("300"))
        .when(n_mut == 2, F.lit("210"))
        .when(
            n_mut == 1,
            F.when(w_in == 2, F.lit("120D"))
            .when(w_out == 2, F.lit("120U"))
            .otherwise(F.lit("120C")),
        )
        .otherwise(F.when(cyc, F.lit("030C")).otherwise(F.lit("030T")))
    )

    counted = j.select(cls.alias("triad_class")).groupBy("triad_class").agg(
        F.count("*").cast("long").alias("n")
    )
    all_cls = spark.createDataFrame(
        [(c,) for c in TRIAD_CLASSES], "triad_class string"
    )
    out = (
        all_cls.join(counted, "triad_class", "left")
        .select("triad_class",
                F.coalesce("n", F.lit(0)).cast("long").alias("n"))
        .orderBy("triad_class")
    )
    return out
