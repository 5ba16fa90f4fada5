"""spark-submit entry point (north rule: packaged for
``spark-submit --py-files`` on multi-executor clusters).

Usage (cluster):
    zip -r credigraph_spark.zip credigraph_spark
    spark-submit --py-files credigraph_spark.zip -m credigraph_spark.cli ...
or locally:
    python -m credigraph_spark.cli <command> [options]

Commands mirror the reference's job scripts (sparkcc.py CLI surface,
:57-140) re-expressed for the engine:

    extract    repos parquet/Iceberg table -> vertices + edges parquet
    pagerank   edges parquet -> ranks parquet (checkpointed, resumable)
    cc         edges parquet -> components parquet
    lpa        edges parquet -> labels parquet
    triangles  edges parquet -> per-vertex counts parquet
    sql        user-supplied SQL over registered views (any scan format)
    bench      run the bench suite (same as bench.py)
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--checkpoint-dir", default=None, help="CheckpointStore root")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--checkpoint-every", type=int, default=5)
    p.add_argument("--no-resume", action="store_true")


def _store(args):
    from credigraph_spark.checkpoint import CheckpointStore

    return CheckpointStore(args.checkpoint_dir, args.run_id) if args.checkpoint_dir else None


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="credigraph-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract", help="repos table -> vertex/edge tables")
    p.add_argument("--input", required=True, help="repos parquet path")
    p.add_argument("--output", required=True, help="output dir (vertices/, edges/)")
    p.add_argument("--langs", default=None, help="comma list to filter before UDF")
    _add_common(p)

    p = sub.add_parser("sql", help="user SQL over registered table views "
                                   "(reference sparkcc.py:480-546)")
    p.add_argument("--table", action="append", required=True,
                   help="name=path[:format], repeatable; format inferred "
                        "from extension when omitted")
    p.add_argument("--query", required=True, help="SQL text (views by --table name)")
    p.add_argument("--output", default=None, help="write result here (else print rows)")
    p.add_argument("--output-format", default="parquet")
    p.add_argument("--limit", type=int, default=20, help="printed-row cap without --output")
    _add_common(p)

    for algo in ("pagerank", "cc", "lpa", "triangles"):
        p = sub.add_parser(algo)
        p.add_argument("--edges", required=True, help="edges parquet (src,dst)")
        p.add_argument("--output", required=True)
        if algo == "pagerank":
            p.add_argument("--damping", type=float, default=0.85)
            p.add_argument("--tol", type=float, default=1e-6)
            p.add_argument("--max-iter", type=int, default=100)
            p.add_argument("--salt-buckets", type=int, default=0)
        if algo in ("cc", "lpa"):
            p.add_argument("--max-iter", type=int, default=200 if algo == "cc" else 10)
        _add_common(p)

    args = ap.parse_args(argv)

    from credigraph_spark.session import get_spark

    spark = get_spark(f"credigraph-{args.cmd}", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    info: dict = {"cmd": args.cmd}

    if args.cmd == "extract":
        from credigraph_spark.extraction import build_graph

        repos = spark.read.parquet(args.input)
        langs = args.langs.split(",") if args.langs else None
        vertices, edges = build_graph(repos, langs=langs)
        vertices.write.mode("overwrite").parquet(f"{args.output}/vertices")
        edges.write.mode("overwrite").parquet(f"{args.output}/edges")
        info["n_vertices"] = spark.read.parquet(f"{args.output}/vertices").count()
        info["n_edges"] = spark.read.parquet(f"{args.output}/edges").count()
    elif args.cmd == "sql":
        from credigraph_spark.io_utils import run_sql, scan_table, write_table

        views = {}
        for spec in args.table:
            name, _, loc = spec.partition("=")
            loc, _, fmt = loc.partition(":")
            views[name] = scan_table(spark, loc, fmt or None)
        result = run_sql(spark, args.query, views)
        if args.output:
            result = result.persist()  # one execution: count + write
            info["rows"] = result.count()
            write_table(result, args.output, fmt=args.output_format)
            result.unpersist()
        else:
            rows = result.limit(args.limit).collect()
            info["rows"] = len(rows)
            info["sample"] = [r.asDict() for r in rows[:5]]
    else:
        edges = spark.read.parquet(args.edges)
        if args.cmd == "pagerank":
            from credigraph_spark.graph import pagerank

            ranks, rinfo = pagerank(
                edges, damping=args.damping, tol=args.tol, max_iter=args.max_iter,
                ckpt=_store(args), checkpoint_every=args.checkpoint_every,
                salt_buckets=args.salt_buckets, resume=not args.no_resume,
            )
            ranks.write.mode("overwrite").parquet(args.output)
            info.update({k: v for k, v in rinfo.items() if k != "l1_history"})
        elif args.cmd == "cc":
            from credigraph_spark.graph import connected_components

            labels, rinfo = connected_components(
                edges, max_iter=args.max_iter, ckpt=_store(args),
                checkpoint_every=args.checkpoint_every, resume=not args.no_resume,
            )
            labels.write.mode("overwrite").parquet(args.output)
            info.update(rinfo)
        elif args.cmd == "lpa":
            from credigraph_spark.graph import label_propagation

            labels, rinfo = label_propagation(
                edges, max_iter=args.max_iter, ckpt=_store(args),
                checkpoint_every=args.checkpoint_every, resume=not args.no_resume,
            )
            labels.write.mode("overwrite").parquet(args.output)
            info.update(rinfo)
        elif args.cmd == "triangles":
            from credigraph_spark.graph import triangle_count

            per_vertex, total = triangle_count(edges)
            per_vertex.write.mode("overwrite").parquet(args.output)
            info["total_triangles"] = total

    print(json.dumps(info))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
