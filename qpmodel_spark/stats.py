"""Imported-statistics path: plan with externally supplied stats, no ANALYZE.

The reference consumes Presto-format statistics JSON
(/root/reference/qpmodel/PrestoStats.cs:69-119: {rowCount, columns:
{col: {distinctValuesCount, nullsCount, min, max, dataSize}}}) so it can
cost and join-order the JOB/TPC-DS workloads without loading or scanning
the data.  The Spark-native equivalent writes the same numbers into the
session catalog as `CatalogStatistics`, where the CBO (join reorder,
broadcast thresholds, CE) reads them exactly as if ANALYZE had produced
them.  At 100 TB this is the difference between re-scanning petabytes for
NDVs and shipping a stats file with the dataset.

Implementation note: `CatalogStatistics` carries scala `BigInt`s, which
py4j auto-converts to Python ints on return (BigInt extends
java.lang.Number), so the object cannot be assembled over the gateway.
Instead a ~30-line helper is compiled in-process with Janino — the same
compiler Spark's whole-stage codegen already ships — and invoked once per
import.  Public Spark/Janino APIs only.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import SparkSession

_HELPER_SRC = r"""
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.TableIdentifier;
import org.apache.spark.sql.catalyst.catalog.CatalogColumnStat;
import org.apache.spark.sql.catalyst.catalog.CatalogStatistics;

public class QpStatsHelper {
  public static void setStats(SparkSession spark, String table, long sizeInBytes, long rowCount,
      java.util.Map colStats) {
    scala.math.BigInt size = scala.math.BigInt$.MODULE$.apply(sizeInBytes);
    scala.Option rows = rowCount < 0 ? scala.Option.empty()
        : scala.Option.apply(scala.math.BigInt$.MODULE$.apply(rowCount));
    scala.collection.immutable.Map m = scala.collection.immutable.Map$.MODULE$.empty();
    java.util.Iterator it = colStats.entrySet().iterator();
    while (it.hasNext()) {
      java.util.Map.Entry e = (java.util.Map.Entry) it.next();
      java.util.Map v = (java.util.Map) e.getValue();
      scala.Option dc = v.containsKey("distinctCount")
          ? scala.Option.apply(scala.math.BigInt$.MODULE$.apply(Long.parseLong((String) v.get("distinctCount"))))
          : scala.Option.empty();
      scala.Option mn = v.containsKey("min") ? scala.Option.apply((String) v.get("min")) : scala.Option.empty();
      scala.Option mx = v.containsKey("max") ? scala.Option.apply((String) v.get("max")) : scala.Option.empty();
      scala.Option nc = v.containsKey("nullCount")
          ? scala.Option.apply(scala.math.BigInt$.MODULE$.apply(Long.parseLong((String) v.get("nullCount"))))
          : scala.Option.empty();
      scala.Option al = v.containsKey("avgLen")
          ? scala.Option.apply(Long.valueOf((String) v.get("avgLen"))) : scala.Option.empty();
      scala.Option ml = v.containsKey("maxLen")
          ? scala.Option.apply(Long.valueOf((String) v.get("maxLen"))) : scala.Option.empty();
      CatalogColumnStat cs = new CatalogColumnStat(dc, mn, mx, nc, al, ml, scala.Option.empty(), 2);
      m = (scala.collection.immutable.Map) m.updated(e.getKey(), cs);
    }
    CatalogStatistics stats = new CatalogStatistics(size, rows, m);
    spark.sessionState().catalog().alterTableStats(
        new TableIdentifier(table), scala.Option.apply(stats));
  }
}
"""

# Compiled helper method cache, keyed by JVM gateway id (one JVM per session
# process; recompiling per call would leak Janino classloaders).
_HELPER_CACHE: dict[int, object] = {}


def _helper(spark: SparkSession):
    key = id(spark._jvm)
    if key not in _HELPER_CACHE:
        compiler = spark._jvm.org.codehaus.janino.SimpleCompiler()
        compiler.cook(_HELPER_SRC)
        cls = compiler.getClassLoader().loadClass("QpStatsHelper")
        _HELPER_CACHE[key] = [m for m in cls.getMethods() if m.getName() == "setStats"][0]
    return _HELPER_CACHE[key]


def import_table_stats(
    spark: SparkSession,
    table: str,
    row_count: int,
    col_stats: dict[str, dict[str, object]] | None = None,
    size_in_bytes: int | None = None,
) -> None:
    """Write externally supplied statistics for a catalog table.

    ``col_stats``: {column: {distinctCount, nullCount, min, max, avgLen,
    maxLen}} — any subset per column.  min/max are passed in Spark's
    external string form (numeric columns: decimal string; dates: epoch
    days), matching what ANALYZE itself stores.  The table must exist in
    the session catalog (CREATE TABLE ... USING parquet LOCATION).

    Also flips CBO on (runtime pin, same discipline as Engine.analyze) so
    the imported numbers actually steer join order.
    """
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    jvm = spark._jvm
    if size_in_bytes is None:
        # rough but serviceable: CBO needs relative magnitudes, and the
        # reference's Presto files don't carry table bytes either
        size_in_bytes = max(1, row_count) * 64
    cmap = jvm.java.util.HashMap()
    for col, st in (col_stats or {}).items():
        inner = jvm.java.util.HashMap()
        for k, v in st.items():
            if v is not None:
                inner.put(k, str(v))
        cmap.put(col, inner)
    gw = spark.sparkContext._gateway
    args = gw.new_array(jvm.java.lang.Object, 5)
    args[0] = spark._jsparkSession
    args[1] = table
    args[2] = jvm.java.lang.Long(int(size_in_bytes))
    args[3] = jvm.java.lang.Long(int(row_count))
    args[4] = cmap
    _helper(spark).invoke(None, args)


def import_presto_stats(spark: SparkSession, table: str, path: str) -> None:
    """Import one Presto-format stats JSON (the reference's input format).

    File shape (PrestoStats.cs:38-56): ``{"rowCount": N, "columns":
    {col: {"distinctValuesCount": d, "nullsCount": n, "min": m, "max": M,
    "dataSize": s}}}``.
    """
    doc = json.loads(Path(path).read_text())
    rows = int(doc["rowCount"])
    cols: dict[str, dict[str, object]] = {}
    total_bytes = 0
    for col, st in doc.get("columns", {}).items():
        entry: dict[str, object] = {}
        if st.get("distinctValuesCount") is not None:
            entry["distinctCount"] = int(st["distinctValuesCount"])
        if st.get("nullsCount") is not None:
            entry["nullCount"] = int(st["nullsCount"])
        if st.get("min") is not None:
            entry["min"] = st["min"]
        if st.get("max") is not None:
            entry["max"] = st["max"]
        if st.get("dataSize") is not None:
            total_bytes += int(st["dataSize"])
            if rows:
                entry["avgLen"] = max(1, int(st["dataSize"]) // max(1, rows))
        cols[col] = entry
    import_table_stats(
        spark, table, rows, cols, size_in_bytes=total_bytes or None
    )


def export_table_stats(spark: SparkSession, table: str) -> dict:
    """Export a catalog table's stats in the Presto JSON shape (round-trip
    twin of :func:`import_presto_stats`; ≙ reference StatsSerializer)."""
    cols = {}
    for f in spark.table(table).schema.fields:
        desc = {
            r[0]: r[1]
            for r in spark.sql(f"DESC EXTENDED {table} {f.name}").collect()
        }

        def val(key):
            v = desc.get(key)
            return None if v in (None, "NULL") else v

        cols[f.name] = {
            "distinctValuesCount": int(val("distinct_count") or 0) or None,
            "nullsCount": int(val("num_nulls") or 0),
            "min": val("min"),
            "max": val("max"),
            "dataSize": None,
        }
    row = spark.sql(f"DESC EXTENDED {table}").collect()
    stats_line = next((r[1] for r in row if r[0] == "Statistics"), "")
    import re

    m = re.search(r"(\d+) rows", stats_line or "")
    return {"rowCount": int(m.group(1)) if m else None, "columns": cols}
