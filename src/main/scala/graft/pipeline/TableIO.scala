package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Stage-boundary table IO with per-partition lineage + metrics, enabling
 * exact resume (BASELINE.json north_rule: "every stage checkpoints
 * per-partition lineage + metrics to enable exact resume").
 *
 * Storage is Parquet with an Iceberg-compatible layout (partition columns +
 * a `_lineage.json` manifest we write ourselves — no Iceberg runtime jar
 * ships in this environment, SURVEY.md §7.1). The write API is thin enough
 * that `format("iceberg")` can be swapped in unchanged.
 *
 * A stage is: `TableIO.stage(spark, dir, "postings") { compute }` —
 * if the stage's manifest + _SUCCESS exist, the computed DataFrame is NOT
 * recomputed; the persisted table is read back. Otherwise the stage runs,
 * writes atomically (tmp dir + rename), records per-partition row counts,
 * total rows, wall time and schema into the manifest, then returns the
 * persisted table. Idempotent re-runs skip completed stages.
 */
object TableIO {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

  def manifestPath(dir: String, name: String): java.nio.file.Path =
    Paths.get(dir, name, "_lineage.json")

  /** Per-partition lineage: rows per physical file of the persisted table,
   *  read from the PARQUET FOOTERS (driver-side, ~KB of metadata per file)
   *  instead of re-scanning the written data — the previous
   *  input_file_name() groupBy re-read every byte just written, a full
   *  extra pass over each stage's output (guide §1.2: don't recompute what
   *  the write already knows). Footer row counts are exact (the writer
   *  records them per row group), so the manifest is unchanged. The
   *  partition directory (e.g. bucket=7/part-...) is kept so lineage
   *  identifies the physical partition, not just a basename. */
  private def lineage(stagePath: String): Array[(String, Long)] = {
    val base = Paths.get(stagePath)
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = {
      val s = Files.walk(base)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        .filter { p =>
          val n = p.getFileName.toString
          Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
        }.toArray
      finally s.close()
    }
    // footer opens are ~ms each and a partitioned stage can hold hundreds
    // of shard files — read them concurrently (bounded pool), not serially
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, math.max(1, files.length)))
    try {
      val futures = files.map { p =>
        pool.submit(new java.util.concurrent.Callable[(String, Long)] {
          def call(): (String, Long) = {
            val rel = base.relativize(p).toString
            val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p.toUri), conf)
            val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            val rows = try {
              var t = 0L
              reader.getFooter.getBlocks.forEach(b => t += b.getRowCount)
              t
            } finally reader.close()
            (rel, rows)
          }
        })
      }
      futures.map(_.get()).filter(_._2 > 0).sortBy(_._1)
    } finally pool.shutdown()
  }

  def isComplete(dir: String, name: String): Boolean =
    Files.exists(manifestPath(dir, name)) &&
      Files.exists(Paths.get(dir, name, "_SUCCESS"))

  /**
   * Run (or resume past) a stage. `partitionBy` columns become the table's
   * physical partitioning (cell-bucket pruning at read time); `sortBy`
   * orders within files so min/max row-group stats prune (the Parquet
   * stand-in for Iceberg sort orders).
   */
  def stage(spark: SparkSession, dir: String, name: String,
            partitionBy: Seq[String] = Nil)
           (compute: => DataFrame): DataFrame = {
    val path = s"$dir/$name"
    if (isComplete(dir, name)) return spark.read.parquet(path)
    stageWrite(spark, dir, name, partitionBy)(compute)
    spark.read.parquet(path)
  }

  /** The write half of [[stage]] without the read-back: constructing the
   *  persisted-table handle runs partition discovery over every output
   *  directory (a parallel listing job for wide partitioned stages —
   *  measured ~1 s for a 470-shard stage on tmpfs), which a caller that
   *  already holds the computed rows and only needs the stage AT REST
   *  (ingest state appends) never uses. Identical layout, manifest and
   *  completeness semantics; does nothing when the stage is complete. */
  def stageWrite(spark: SparkSession, dir: String, name: String,
                 partitionBy: Seq[String] = Nil)
                (compute: => DataFrame): Unit = {
    val path = s"$dir/$name"
    if (isComplete(dir, name)) return

    val t0 = System.nanoTime()
    val df = compute
    // Iceberg-style hash write distribution (write.distribution-mode=hash):
    // cluster rows by the partition columns before a dynamic-partition
    // write, so each task writes whole partition values. Without it every
    // task holds every partition value and the writer opens tasks x values
    // files — measured 6.2 s -> 1.2 s for a 470-shard stage, and the
    // many-small-files layout is exactly what guide §6 warns reads pay for.
    // explicit width: a column-only repartition is AQE-coalescible and a
    // tiny stage collapses to ONE writer task (measured 15 s serial)
    val out = if (partitionBy.nonEmpty)
        df.repartition(spark.sessionState.conf.numShufflePartitions,
          partitionBy.map(col): _*)
      else df
    val writer0 = out.write.mode("overwrite")
    val writer = if (partitionBy.nonEmpty) writer0.partitionBy(partitionBy: _*) else writer0
    writer.parquet(path)
    val perFile = lineage(path)
    val totalRows = perFile.map(_._2).sum
    val perFileJson = perFile.map { case (f, n) => s"""{"file": "${esc(f)}", "rows": $n}""" }
    val wallSec = (System.nanoTime() - t0) / 1e9
    val manifest =
      s"""{
         |  "stage": "${esc(name)}",
         |  "rows": $totalRows,
         |  "wall_sec": $wallSec,
         |  "schema": "${esc(df.schema.simpleString)}",
         |  "partition_by": [${partitionBy.map(p => s""""${esc(p)}"""").mkString(", ")}],
         |  "partitions": [${perFileJson.mkString(", ")}]
         |}""".stripMargin
    Files.write(manifestPath(dir, name), manifest.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /**
   * A stage persisted as an EXTERNAL BUCKETED table: hash-bucketed and
   * sorted by `key` into `nBuckets` files per partition, registered in the
   * catalog so the reader's `outputPartitioning` carries the bucketing.
   * Joins and aggregations keyed on `key` then skip their shuffle entirely
   * (asserted in TableIOSpec) — the co-located-join layout for tables that
   * are repeatedly joined on one key (postings on `term`, objects on
   * `cell`). At warehouse scale the catalog is the metastore and the
   * registration outlives every session; here the catalog is session-local,
   * so a fresh session re-registers over the existing files from the DDL
   * recorded in the manifest (`bucket_ddl`) — the data itself is never
   * rewritten on resume.
   *
   * Returns `spark.table(...)`, the bucket-aware handle (a plain
   * `read.parquet` of the same path would silently drop the bucket
   * metadata and re-shuffle).
   *
   * Assumes a SINGLE writer per (dir, name): stages are pipeline steps, not
   * a concurrency primitive. Both the complete and the incomplete-recovery
   * branches verify the registered table's canonical location before
   * trusting (or dropping) it, so a table-name hash collision fails loudly
   * rather than racing two stages onto one path.
   */
  /** Reverse of [[esc]] for manifest string fields. */
  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case '"' => b += '"'; i += 2
        case '\\' => b += '\\'; i += 2
        case 'n' => b += '\n'; i += 2
        case 'u' =>
          // a truncated/garbled \u escape means manifest corruption — fail
          // with a descriptive error, not an index/number exception
          if (i + 6 > s.length) sys.error(s"corrupt manifest escape in: $s")
          val hex = s.substring(i + 2, i + 6)
          require(hex.forall(c => Character.digit(c, 16) >= 0),
            s"corrupt manifest escape \\u$hex")
          b += Integer.parseInt(hex, 16).toChar; i += 6
        case c => b += c; i += 2
      } else { b += s.charAt(i); i += 1 }
    }
    b.toString
  }

  /** JSON string field extractor that respects escapes (a naive non-greedy
   *  `.*?` would stop at the first escaped quote). */
  private def manifestField(manifest: String, field: String): Option[String] =
    (s""""$field": "((?:[^"\\\\]|\\\\.)*)"""").r
      .findFirstMatchIn(manifest).map(m => unesc(m.group(1)))
  private def manifestLong(manifest: String, field: String): Option[Long] =
    (s""""$field": (\\d+)""").r.findFirstMatchIn(manifest).map(_.group(1).toLong)

  def bucketedStage(spark: SparkSession, dir: String, name: String,
                    key: String, nBuckets: Int)
                   (compute: => DataFrame): DataFrame = {
    val path = s"$dir/$name"
    // the catalog name carries the DIRECTORY (stages with the same name in
    // two output dirs are different tables) — a dir-less name would make
    // the tableExists shortcut silently return the other dir's data
    val tbl = f"graft_${name}_by_${key}_${path.hashCode & 0x7fffffff}%08x"
    def ddl(schema: String) =
      s"""CREATE TABLE $tbl ($schema) USING parquet
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $nBuckets BUCKETS
         |LOCATION '$path'""".stripMargin
    def requireLayout(manifest: String): Unit = {
      // the physical files are bucketed by the RECORDED layout; declaring a
      // different one would make Spark elide shuffles it must not elide
      // (silently wrong joins), so a mismatch fails loudly
      val mKey = manifestField(manifest, "bucket_key")
      val mN = manifestLong(manifest, "n_buckets")
      require(mKey.contains(key) && mN.contains(nBuckets.toLong),
        s"stage $name at $path is bucketed by (${mKey.orNull}, ${mN.orNull}) " +
          s"but was requested as ($key, $nBuckets); delete the stage to re-bucket")
    }
    val registered = spark.catalog.tableExists(tbl)
    if (registered && isComplete(dir, name)) {
      requireLayout(Files.readString(manifestPath(dir, name)))
      // the hash-suffixed name is collision-resistant, not collision-free:
      // verify the registered table really points at THIS stage directory
      val loc = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location
      val canonical = new java.io.File(path).getCanonicalPath
      require(new java.io.File(loc.getPath).getCanonicalPath == canonical,
        s"catalog table $tbl points at ${loc.getPath}, not $canonical — name collision")
      return spark.table(tbl)
    }
    if (!registered && isComplete(dir, name)) {
      // resume in a fresh session: re-register over the existing files
      val manifest = Files.readString(manifestPath(dir, name))
      requireLayout(manifest)
      val schemaDdl = manifestField(manifest, "bucket_ddl_schema")
        .getOrElse(sys.error(s"stage $name exists but has no bucket_ddl_schema"))
      spark.sql(ddl(schemaDdl))
      return spark.table(tbl)
    }
    // registered but NOT complete: a previous attempt died between
    // saveAsTable and the manifest write — drop the half-registered table
    // and recompute instead of failing on the missing manifest forever.
    // Same canonical-location check as the complete branch: a hashCode
    // collision must not drop ANOTHER stage's registration (stages assume a
    // single writer per (dir, name) — concurrent writers are out of scope).
    if (registered) {
      val loc = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location
      val canonical = new java.io.File(path).getCanonicalPath
      require(new java.io.File(loc.getPath).getCanonicalPath == canonical,
        s"catalog table $tbl points at ${loc.getPath}, not $canonical — name " +
          "collision; refusing to drop another stage's registration")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
    val t0 = System.nanoTime()
    val df = compute
    // cluster by the bucket key into nBuckets tasks before the bucketed
    // write: Spark's bucket id and HashPartitioning share the same
    // murmur3 hash, so each task then holds exactly one bucket and the
    // stage lands as nBuckets files instead of tasks x buckets tiny files
    // (same hash-distribution rationale as stage() above)
    df.repartition(nBuckets, col(key)).write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(tbl)
    val written = spark.table(tbl)
    // same per-partition lineage as stage() — footer metadata, no re-read
    val perFile = lineage(path)
    val totalRows = perFile.map(_._2).sum
    val perFileJson = perFile.map { case (f, n) => s"""{"file": "${esc(f)}", "rows": $n}""" }
    val wallSec = (System.nanoTime() - t0) / 1e9
    val manifest =
      s"""{
         |  "stage": "${esc(name)}",
         |  "rows": $totalRows,
         |  "wall_sec": $wallSec,
         |  "schema": "${esc(df.schema.simpleString)}",
         |  "bucket_key": "${esc(key)}",
         |  "n_buckets": $nBuckets,
         |  "bucket_ddl_schema": "${esc(df.schema.toDDL)}",
         |  "partitions": [${perFileJson.mkString(", ")}]
         |}""".stripMargin
    Files.write(manifestPath(dir, name), manifest.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    written
  }
}
