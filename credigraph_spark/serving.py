"""SQLite serving-layer export — the reference's relational store (S12).

Reference parity: ekmpa/CrediGraph builds a single-file SQLite relational
database of post-analytics results for downstream consumers
(`tgrag/construct_relational_database/construct_relational_table.py:93-247`,
single-node pandas `to_sql`). The Spark-native answer splits that into:

* ``write_sqlite_shards`` — DISTRIBUTED: every partition writes its own
  ``shard-NNNNN.sqlite`` file via the Python stdlib ``sqlite3`` driver
  inside ``mapInPandas`` (Arrow batches, no per-row Python beyond the
  DB-API insert the format itself requires). This is the path that holds
  at scale: N executors write N shards in parallel, no driver funnel.
  ``out_dir`` MUST be a POSIX mount shared by driver and executors
  (sqlite3 cannot target HDFS/S3 URIs); attempt-unique temp files +
  atomic rename make task retries and speculation safe.
* ``merge_sqlite_shards`` — the serving-layer final assembly: ATTACH each
  shard and ``INSERT INTO ... SELECT`` into one artifact, then build the
  requested indexes. Runs on one node BY DESIGN: a serving .db is a
  small, post-aggregation artifact (the reference's is too); anything
  big stays in parquet/Iceberg.
* ``read_sqlite`` — verification/serving readback into a DataFrame.

Type mapping: integral → INTEGER, fractional → REAL, binary → BLOB,
boolean → INTEGER 0/1, timestamps/dates → ISO-8601 TEXT, arrays/structs/
maps → JSON TEXT, everything else → TEXT.
"""

from __future__ import annotations

import glob
import json
import os
import sqlite3
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _sqlite_type(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.BooleanType)):
        return "INTEGER"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "REAL"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    return "TEXT"


def _to_cell(v, dt: T.DataType):
    # Arrow batches hand numpy scalars/ndarrays and NaN-nulls to Python;
    # stdlib sqlite3 binds none of those — normalize first.
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        if v is None:
            return None
        if hasattr(v, "tolist"):
            v = v.tolist()
        return json.dumps(v, default=str, sort_keys=isinstance(dt, T.MapType))
    if v is None or (not isinstance(v, (bytes, bytearray)) and pd.isna(v)):
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(dt, T.BooleanType):
        return int(v)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return v.isoformat()
    if isinstance(dt, T.BinaryType):
        return sqlite3.Binary(bytes(v))
    if isinstance(dt, T.DecimalType):
        return float(v)
    return v


def _create_sql(table: str, schema: T.StructType) -> str:
    cols = ", ".join(f'"{f.name}" {_sqlite_type(f.dataType)}' for f in schema.fields)
    return f'CREATE TABLE IF NOT EXISTS "{table}" ({cols})'


def _publish_shard(batches: Iterable[pd.DataFrame], out_dir: str,
                   create_sql: str, insert_sql: str,
                   names: Sequence[str], dtypes: Sequence[T.DataType],
                   pid: int, attempt_id: int) -> int:
    """One task attempt's shard write: build the whole shard in an
    ATTEMPT-UNIQUE temp file, then atomically ``os.replace`` it over the
    final ``shard-<pid>.sqlite``. Two concurrent attempts for the same
    partition (task retry, speculation) therefore never interleave
    writes into one file — whichever publishes last replaces the file
    wholesale, and the survivor is always ONE attempt's complete
    output. Module-level so tests can drive the exact executor code
    path with simulated duplicate attempts."""
    final = os.path.join(out_dir, f"shard-{pid:05d}.sqlite")
    tmp = os.path.join(out_dir, f".shard-{pid:05d}.{attempt_id}.tmp")
    n = 0
    try:
        with sqlite3.connect(tmp) as conn:
            conn.execute(create_sql)
            for pdf in batches:
                pdf = pdf[names]
                rows = [
                    tuple(_to_cell(cell, dt) for cell, dt in zip(tup, dtypes))
                    for tup in pdf.itertuples(index=False, name=None)
                ]
                conn.executemany(insert_sql, rows)
                n += len(rows)
            conn.commit()
        os.replace(tmp, final)  # atomic publish; last attempt wins whole
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return n


def write_sqlite_shards(df: DataFrame, out_dir: str, table: str,
                        shards: int | None = None) -> int:
    """Write ``df`` as per-partition SQLite shard files under ``out_dir``.
    Returns total rows written (counted through the same job — one
    action). Existing shard files for the same table are replaced.

    REQUIRES ``out_dir`` to be a POSIX filesystem shared by the driver
    and every executor (NFS/Lustre/FUSE-mounted object store): sqlite3
    cannot write to HDFS/S3 URIs, and the driver-side merge globs the
    same directory. On executor-local disks the shards would be
    scattered; this is detected after the job (rows written but no shard
    visible to the driver) and raised, not silently merged-empty
    (ADVICE r3). Task retries and SPECULATIVE duplicate attempts are
    safe: each attempt writes an attempt-unique temp file and atomically
    ``os.replace``s it over the final shard name only after its commit,
    so concurrent attempts never interleave writes into one file and the
    survivor is always one attempt's complete output."""
    os.makedirs(out_dir, exist_ok=True)
    for old in glob.glob(os.path.join(out_dir, "shard-*.sqlite")):
        os.remove(old)
    if shards is not None:
        df = df.repartition(shards)
    schema = df.schema
    create_sql = _create_sql(table, schema)
    insert_sql = (f'INSERT INTO "{table}" VALUES '
                  f'({", ".join("?" for _ in schema.fields)})')
    dtypes = [f.dataType for f in schema.fields]
    names = [f.name for f in schema.fields]

    def write_partition(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        n = _publish_shard(batches, out_dir, create_sql, insert_sql, names,
                           dtypes, ctx.partitionId(), ctx.taskAttemptId())
        yield pd.DataFrame({"rows_written": [n]})

    counts = df.mapInPandas(write_partition, "rows_written long")
    total = int(counts.groupBy().sum("rows_written").collect()[0][0] or 0)
    if total > 0 and not glob.glob(os.path.join(out_dir, "shard-*.sqlite")):
        raise RuntimeError(
            f"wrote {total} rows but no shard-*.sqlite is visible under "
            f"{out_dir} from the driver: out_dir must be a filesystem "
            f"shared by driver and executors (see write_sqlite_shards doc)")
    return total


def merge_sqlite_shards(out_dir: str, dst_path: str, table: str,
                        index_cols: Sequence[str] = ()) -> int:
    """ATTACH every shard under ``out_dir`` and append it into one
    serving database at ``dst_path``; build one index per entry of
    ``index_cols``. Returns total rows in the merged table."""
    shard_paths = sorted(glob.glob(os.path.join(out_dir, "shard-*.sqlite")))
    if not shard_paths:
        raise FileNotFoundError(
            f"no shard-*.sqlite under {out_dir} — on a multi-node cluster "
            f"this means out_dir is not shared between executors and the "
            f"driver (write_sqlite_shards requires a shared POSIX mount)")
    if os.path.exists(dst_path):
        os.remove(dst_path)
    with sqlite3.connect(dst_path) as conn:
        with sqlite3.connect(shard_paths[0]) as first:
            create_sql = first.execute(
                "SELECT sql FROM sqlite_master WHERE type='table' AND name=?",
                (table,)).fetchone()[0]
        conn.execute(create_sql)
        for sp in shard_paths:
            conn.execute("ATTACH DATABASE ? AS shard", (sp,))
            conn.execute(f'INSERT INTO "{table}" SELECT * FROM shard."{table}"')
            conn.commit()
            conn.execute("DETACH DATABASE shard")
        for col in index_cols:
            conn.execute(f'CREATE INDEX IF NOT EXISTS "idx_{table}_{col}" '
                         f'ON "{table}" ("{col}")')
        conn.commit()
        return conn.execute(f'SELECT COUNT(*) FROM "{table}"').fetchone()[0]


def write_sqlite(df: DataFrame, dst_path: str, table: str,
                 index_cols: Sequence[str] = (),
                 shards: int | None = None) -> int:
    """One-call export: distributed shard write + driver-side merge into
    a single serving .db (the reference's artifact shape)."""
    out_dir = dst_path + ".shards"
    write_sqlite_shards(df, out_dir, table, shards=shards)
    return merge_sqlite_shards(out_dir, dst_path, table, index_cols)


def read_sqlite(spark: SparkSession, db_path: str, table: str) -> DataFrame:
    """Serving-layer readback (verification / small dims): one driver
    read through sqlite3 → pandas → DataFrame. NOT a scan path for big
    data — that's parquet/Iceberg."""
    with sqlite3.connect(db_path) as conn:
        pdf = pd.read_sql_query(f'SELECT * FROM "{table}"', conn)
    return spark.createDataFrame(pdf)
