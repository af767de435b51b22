package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the table-maintenance pack beyond the DuckDB gate:
  * merge op accounting, diff class/key-sum invariants, checksum
  * sensitivity to single-row corruption, SCD2 interval conservation.
  */
class MaintenanceSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q_merge_upsert: op counts match the derived change batch exactly") {
    val o = Tables.orders(spark, dir)
    val nUpd = o.filter(col("o_orderkey") % 10 === 0).count()
    val nDel = o.filter(col("o_orderkey") % 10 === 1).count()
    val nIns = o.filter(col("o_orderkey") % 10 === 2).count()
    val res = MaintenanceQueries.queries("q_merge_upsert")(spark, dir)
      .agg(sum("n_rows"), sum("n_inserted"), sum("n_updated"))
      .collect()(0)
    assert(res.getLong(0) == o.count() - nDel + nIns, "rows = snapshot - deletes + inserts")
    assert(res.getLong(1) == nIns)
    assert(res.getLong(2) == nUpd)
  }

  test("q_snapshot_diff: classes partition the key space; update victims are 'changed'") {
    val o = Tables.orders(spark, dir)
    val m = MaintenanceQueries.queries("q_snapshot_diff")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.keySet == Set("added", "removed", "changed", "unchanged"))
    assert(m("added")._1 == o.filter(col("o_orderkey") % 10 === 2).count())
    assert(m("removed")._1 == o.filter(col("o_orderkey") % 10 === 1).count())
    assert(m("changed")._1 == o.filter(col("o_orderkey") % 10 === 0).count())
    // Key-hash sums distinguish WHICH keys landed in each class, not just
    // how many: the 'removed' sum must equal the recomputed sum over the
    // delete-victim keys.
    val delSum = o.filter(col("o_orderkey") % 10 === 1)
      .agg(sum(graft.functions.PortableHash.h60p(col("o_orderkey").cast("string"))))
      .collect()(0).getLong(0)
    assert(m("removed")._2 == delSum)
  }

  test("q_table_checksum: a single-row bit flip moves exactly that segment's sum") {
    val base = MaintenanceQueries.queries("q_table_checksum")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // Corrupt one row (add a cent to the lowest-keyed row) and recompute
    // the same checksum shape over the corrupted frame.
    val li = Tables.lineitem(spark, dir)
    val first = li.orderBy("l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_linenumber", "l_returnflag").limit(1).collect()(0)
    val (firstKey, firstLine, flag) = (first.getLong(0), first.getInt(1), first.getString(2))
    val corrupted = li.withColumn("l_extendedprice",
      when(col("l_orderkey") === firstKey && col("l_linenumber") === firstLine,
        col("l_extendedprice") + 0.01).otherwise(col("l_extendedprice")))
    val after = corrupted
      .select(col("l_returnflag"),
        graft.functions.PortableHash.h60p(concat_ws("|",
          col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"),
          floor(col("l_quantity")).cast("long").cast("string"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").cast("string")))
          .as("h"))
      .groupBy("l_returnflag")
      .agg(sum("h").as("content_sum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after(flag) != base(flag), "corrupted segment's checksum must move")
    (base.keySet - flag).foreach(f =>
      assert(after(f) == base(f), s"untouched segment $f must not move"))
  }

  test("q_mv_refresh: incremental old⊕delta equals the merge's full recompute") {
    val inc = MaintenanceQueries.queries("q_mv_refresh")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val full = MaintenanceQueries.queries("q_merge_upsert")(spark, dir)
      .select("o_orderpriority", "n_rows", "total_cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inc == full, "incremental view maintenance diverged from recomputation")
  }

  test("q_scd2_intervals: interval starts = type-change points; opens = distinct users") {
    val res = MaintenanceQueries.queries("q_scd2_intervals")(spark, dir)
      .agg(sum("n_intervals"), sum("n_open")).collect()(0)
    val ev = Tables.events(spark, dir)
    // Every user's LAST event holds an open interval — exactly one per user.
    assert(res.getLong(1) == ev.select("user_id").distinct().count())
    // Interval count = number of (user-ordered) rows whose type differs
    // from the previous row's, computed independently here.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val changes = ev.withColumn("p", lag("event_type", 1).over(w))
      .filter(col("p").isNull || col("p") =!= col("event_type")).count()
    assert(res.getLong(0) == changes)
  }
}
