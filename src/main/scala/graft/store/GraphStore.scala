package graft.store

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

import graft.model.Model

/** Parquet-backed property-graph store with MERGE-semantics writes.
  *
  * Spark-native replacement for the reference's Neo4j client
  * (`pkg/neo4j/client.go`): instead of one Bolt round-trip per node/edge
  * (`client.go:104-212`, the reason its self-index takes ~45 s —
  * BASELINE.md), ingest is two DataFrame writes. Upsert identity is a
  * deterministic hash of (label, merge-key columns), so re-ingesting is
  * idempotent like Neo4j MERGE (`client.go:135-179`).
  *
  * Scale design:
  *   - `nodes` partitioned by `label`, `edges` by `relType` → label/type
  *     predicates become partition pruning, the Parquet analog of Neo4j's
  *     label indexes (`schema.go:82-203`);
  *   - MERGE = union + window keep-latest: one hash shuffle on `id`, no
  *     driver loops;
  *   - writes go to a new snapshot directory then swap, so readers never
  *     see a half-written graph (job-atomic, SURVEY §4.2).
  */
class GraphStore(spark: SparkSession, val basePath: String) {
  import GraphStore._

  // Snapshots are versioned directories + a pointer file: a MERGE writes
  // a brand-new directory and atomically repoints, so concurrent readers
  // (and Spark's global file-listing cache) never observe a half-swapped
  // or stale path. The previous snapshot is removed after the repoint.
  import org.apache.hadoop.fs.Path

  private def fs = new Path(basePath).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def pointer(kind: String) = new Path(s"$basePath/$kind.current")

  /** Current snapshot dir for `kind`, or None before the first write.
    * If the pointer file is momentarily absent (crash or concurrent
    * repoint between delete and rename), fall back to the newest
    * retained version directory instead of reporting an empty graph. */
  private def currentDir(kind: String): Option[String] = {
    val ptr = pointer(kind)
    if (fs.exists(ptr)) {
      val in = fs.open(ptr)
      try {
        val v = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        Some(s"$basePath/$v")
      } finally in.close()
    } else versions(kind).lastOption.map(v => s"$basePath/$v")
  }

  def nodes: DataFrame = read("nodes", Model.nodeSchema)
  def edges: DataFrame = read("edges", Model.edgeSchema)

  private def read(kind: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    currentDir(kind) match {
      case Some(dir) =>
        spark.read.parquet(dir).select(schema.fields.map(f =>
          col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
      case None => GraphStore.emptyDf(spark, schema)
    }

  def nodesByLabel(label: String): DataFrame =
    nodes.filter(col("label") === label)

  def edgesByType(relType: String): DataFrame =
    edges.filter(col("relType") === relType)

  /** Upsert nodes. Incoming rows may carry any subset of the node schema
    * plus `label`; ids are derived from merge keys when absent. Keep-latest
    * per id (incoming wins over existing; within incoming, greatest
    * updatedAt then arbitrary-but-deterministic).
    */
  def mergeNodes(incoming: DataFrame): Unit = {
    val withId = ensureNodeIds(incoming)
    val aligned = align(withId, Model.nodeSchema)
    writeSnapshot(keepLatest(nodes, aligned), "nodes", Seq("label"))
  }

  /** Upsert edges: identity = (src, dst, relType). */
  def mergeEdges(incoming: DataFrame): Unit = {
    def keyed(df: DataFrame): DataFrame =
      df.withColumn("id", xxhash64(col("src"), col("dst"), col("relType")))
    val aligned = keyed(align(incoming, Model.edgeSchema))
    val existing = keyed(edges)
    val merged = keepLatest(existing, aligned).drop("id")
    writeSnapshot(merged, "edges", Seq("relType"))
  }

  /** Drop edges whose endpoints are absent from `nodes` — the existence
    * join the reference performs before each relationship insert
    * (`client.go:184-188`, SURVEY J11). */
  def danglingEdges(): DataFrame = {
    val ids = nodes.select(col("id"))
    val key = edges.select(col("src"), col("dst"), col("relType"))
    key.join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .union(key.join(ids.withColumnRenamed("id", "dst"),
        Seq("dst"), "left_anti"))
      .distinct()
  }

  private def writeSnapshot(df: DataFrame, kind: String,
      partitionBy: Seq[String]): Unit = {
    val version = s"${kind}_v${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
      .parquet(s"$basePath/$version")
    // atomic repoint: write pointer to a tmp file, rename over.
    // Previous snapshot dirs are retained (snapshot isolation — handles
    // created against an older version stay readable); reclaim with
    // vacuum().
    val tmpPtr = new Path(s"$basePath/$kind.current.__tmp")
    val out = fs.create(tmpPtr, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    fs.delete(pointer(kind), false)
    fs.rename(tmpPtr, pointer(kind))
  }

  /** Retained snapshot versions of `kind` ("nodes"|"edges"), oldest
    * first (time-travel surface over the versioned store). */
  def versions(kind: String): Seq[String] = {
    val base = new Path(basePath)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"${kind}_v"))
      .sortBy(_.getModificationTime)
      .map(_.getPath.getName)
  }

  /** Read a specific retained snapshot version (from [[versions]]). */
  def nodesAt(version: String): DataFrame =
    spark.read.parquet(s"$basePath/$version")
      .select(Model.nodeSchema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

  def edgesAt(version: String): DataFrame =
    spark.read.parquet(s"$basePath/$version")
      .select(Model.edgeSchema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

  /** Delete all non-current snapshot versions. */
  def vacuum(): Unit = {
    val keep = Seq("nodes", "edges").flatMap(currentDir)
      .map(d => new Path(d).getName).toSet
    if (fs.exists(new Path(basePath))) {
      fs.listStatus(new Path(basePath)).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory &&
            (name.startsWith("nodes_v") || name.startsWith("edges_v")) &&
            !keep.contains(name))
          fs.delete(st.getPath, true)
      }
    }
  }
}

object GraphStore {

  /** Deterministic node id: hash of label + the label's merge-key columns
    * (Model.MergeKeys). The Spark analog of elementId(n): stable across
    * re-ingests so MERGE works (SURVEY §1.7). */
  def nodeId(label: String, keyCols: Column*): Column =
    xxhash64((lit(label) +: keyCols): _*)

  /** Fill ids for rows that lack one, using per-label merge keys. A label
    * whose merge-key columns are not ALL present falls through to the
    * hash-of-all-columns default — substituting nulls would silently
    * collapse every row of the label to one id (xxhash64 skips null
    * inputs). */
  def ensureNodeIds(df: DataFrame): DataFrame = {
    val withIdCol =
      if (df.columns.contains("id")) df else df.withColumn("id", lit(null))
    val keyExpr = Model.MergeKeys.foldLeft(lit(null).cast("long")) {
      case (acc, (label, keys)) =>
        if (!keys.forall(withIdCol.columns.contains)) acc
        else when(col("label") === label,
          xxhash64((lit(label) +: keys.map(k => col(k).cast("string"))): _*))
          .otherwise(acc)
    }
    withIdCol.withColumn("id",
      coalesce(col("id").cast("long"), keyExpr,
        xxhash64(col("label"), to_json(struct(withIdCol.columns
          .filterNot(_ == "id").sorted.map(col): _*)))))
  }

  /** Union + keep one row per id: incoming beats existing, newer updatedAt
    * beats older. One shuffle; no driver round-trips. */
  def keepLatest(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val e = existing.withColumn("_gen", lit(0))
    val i = incoming.withColumn("_gen", lit(1))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("_gen").desc, col("updatedAt").desc_nulls_last)
    e.unionByName(i)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_gen")
  }

  /** Project a loosely-shaped DataFrame onto `schema`: missing columns
    * become nulls, present ones are cast; extra columns are folded into
    * the `properties` overflow map only if already provided. */
  def align(df: DataFrame, schema: StructType): DataFrame = {
    val cols = schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema)

  /** Union heterogenous node-row families into one schema-aligned frame
    * (ids filled per family) so an ingest can MERGE once instead of once
    * per family — each MERGE rewrites the snapshot, so batching is
    * O(graph) instead of O(families × graph). */
  def unionNodeFamilies(dfs: Seq[DataFrame]): DataFrame =
    dfs.map(df => align(ensureNodeIds(df), Model.nodeSchema))
      .reduce(_.unionByName(_))

  def unionEdgeFamilies(dfs: Seq[DataFrame]): DataFrame =
    dfs.map(df => align(df, Model.edgeSchema)).reduce(_.unionByName(_))
}
