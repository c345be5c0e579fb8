package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A zone-tagged event (top-level so Spark derives the encoder). */
final case class GeoTagged(user_id: Long, ts: java.sql.Timestamp,
    event_id: Long, zone: String)

/** A zone change for one user: the first event observed in a different
  * zone than the user's previous event.
  */
final case class ZoneTransition(user_id: Long, ts: java.sql.Timestamp,
    event_id: Long, from_zone: String, to_zone: String)

/** Geofencing over event streams (r13) — the spatial x events x streaming
  * cross-cut: tag each event's coordinates with its containing zone via a
  * shuffle-free map-phase fold over the (metadata-sized) zone list, then
  * detect per-user zone TRANSITIONS (enter/exit edges), in batch (one
  * window pass) or as a Structured Streaming stateful operator.
  *
  * Scale shape: zone sets are metadata-sized, so tagging is a pure
  * projection (zero event-keyed exchanges — see [[tagZones]]); transition
  * detection shuffles once on user_id for the lag window (batch) or rides
  * the streaming state store keyed by user_id with ONE string of state per
  * user (streaming).
  */
object Geofence {

  /** Tag each event row with the zone containing (px, py), or 'outside'.
    * `zones` is (zoneCol, geom WKB polygon) — metadata-sized. Containment
    * is boundary-exclusive (OGC contains), so tile-adjacent zones never
    * double-tag an edge point; rows on a shared boundary are 'outside' by
    * that definition (declared — lay zones out half-open like the fixture).
    *
    * Scale shape (r14, closes the r13 verdict's avoidable-shuffle finding):
    * zone sets are metadata-sized, so tagging is a PURE PROJECTION — the
    * zone list folds into the plan as a literal array of (zone, wkb)
    * structs and each event picks min(zone) over its containing zones via
    * codegen array filter/transform. ZERO event-keyed exchanges, where the
    * previous blocked-join form shuffled the full event set twice
    * (groupBy(event_id) + join-back). Zone sets above `broadcastZoneCap`
    * fall back to the grid-blocked spatial join (per-event work there is
    * co-celled candidates only, not all zones).
    */
  def tagZones(events: DataFrame, idCol: String, px: Column, py: Column,
      zones: DataFrame, zoneCol: String, geom: Column, cellSize: Double,
      broadcastZoneCap: Int = 4096): DataFrame = {
    // Null-filter in the QUERY and collect at most cap+1 rows: a zone set
    // far above the cap must never be pulled to the driver just to discover
    // it's over the cap (the OOM the cap exists to prevent) — one extra row
    // is enough to know we're over and go straight to the blocked join.
    val zoneRows = zones
      .select(col(zoneCol).cast("string").as("__z"), geom.cast("binary").as("__g"))
      .where(col("__z").isNotNull && col("__g").isNotNull)
      .limit(broadcastZoneCap + 1)
      .collect()
    if (zoneRows.isEmpty)
      return events.withColumn(zoneCol, lit("outside"))
    if (zoneRows.length > broadcastZoneCap)
      return tagZonesBlocked(events, idCol, px, py, zones, zoneCol, geom, cellSize)
    // min(zone) over containing zones: with properly half-open
    // (disjoint-interior) zones this is the unique match; with OVERLAPPING
    // zones the smallest zone name wins deterministically instead of
    // silently duplicating the event (which would fabricate transitions).
    val entries = zoneRows.map { r =>
      struct(lit(r.getString(0)).as("z"), lit(r.getAs[Array[Byte]](1)).as("g"))
    }
    events
      .withColumn("__pt", call_function("st_point", px.cast("double"), py.cast("double")))
      .withColumn(zoneCol, coalesce(
        array_min(transform(
          filter(array(entries.toIndexedSeq: _*),
            s => call_function("st_contains", s.getField("g"), col("__pt"))),
          s => s.getField("z"))),
        lit("outside")))
      .drop("__pt")
  }

  /** The grid-blocked fallback for zone sets too large to fold into the
    * plan: spatial join, min(zone) per event, left-join back (two
    * event-keyed shuffles — the price of a non-broadcast zone table).
    */
  private[operators] def tagZonesBlocked(events: DataFrame, idCol: String,
      px: Column, py: Column, zones: DataFrame, zoneCol: String,
      geom: Column, cellSize: Double): DataFrame = {
    val pts = events.select(col(idCol), px.cast("double").as("__px"), py.cast("double").as("__py"))
    val matched = SpatialJoin.pointInPolygon(
      pts, zones.select(col(zoneCol), geom.as("__geom")),
      col("__px"), col("__py"), col("__geom"), cellSize, boundaryExclusive = true)
      .groupBy(col(idCol)).agg(min(col(zoneCol)).as(zoneCol))
    events.join(matched, Seq(idCol), "left")
      .withColumn(zoneCol, coalesce(col(zoneCol), lit("outside")))
  }

  /** Per-user zone transitions from a tagged frame (user_id, ts, event_id,
    * zone): rows where the zone differs from the user's previous event
    * (ordered by ts, tie-broken by event_id — deterministic).
    */
  def zoneTransitions(tagged: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    tagged
      .withColumn("__prev", lag(col("zone"), 1).over(w))
      .filter(col("__prev").isNotNull && col("__prev") =!= col("zone"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("__prev").as("from_zone"), col("zone").as("to_zone"))
  }

  /** Streaming transition detection: flatMapGroupsWithState keyed by
    * user_id, state = the user's last zone (one string). Events within a
    * micro-batch are sorted by (ts, event_id) per user; the state carries
    * the last zone ACROSS batches, so a user whose move spans two batches
    * still emits exactly one transition.
    */
  def transitionsStream(tagged: Dataset[GeoTagged]): Dataset[ZoneTransition] = {
    import tagged.sparkSession.implicits._
    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState[String, ZoneTransition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[GeoTagged], state: GroupState[String]) =>
          val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
          var last = state.getOption.orNull
          val out = Seq.newBuilder[ZoneTransition]
          sorted.foreach { e =>
            if (last != null && last != e.zone)
              out += ZoneTransition(uid, e.ts, e.event_id, last, e.zone)
            last = e.zone
          }
          if (last != null) state.update(last)
          out.result().iterator
      }
  }
}
