package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Small reference operators expressible as native column expressions:
 * P1 tag-admission filter (parse_osm.go:341-359), P2 name/type projection
 * cascade (parse_osm.go:270-339), P3 empty-name skip (indexer.go:151-154),
 * F12 capitalize (indexer.go:1068-1073).
 */
class OperatorsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val validTags = Seq("amenity", "highway", "tourism")

  private lazy val ways = Seq(
    (1L, Map("amenity" -> "restaurant", "name" -> "warung sate")),
    (2L, Map("building" -> "yes", "name" -> "rumah")),
    (3L, Map("highway" -> "residential")),
    (4L, Map("tourism" -> "zoo", "name" -> "kebun binatang")),
    (5L, Map("landuse" -> "forest"))
  ).toDF("id", "tags")

  test("P1: way admitted iff any tag key is a valid search tag") {
    val admitted = ways.filter(
      exists(map_keys(col("tags")), k => k.isin(validTags: _*)))
      .select("id").as[Long].collect().sorted
    assert(admitted.toSeq === Seq(1L, 3L, 4L))
  }

  test("P2: object type from the tag priority cascade") {
    val typed = ways.withColumn("tipe",
      coalesce(col("tags")("amenity"), col("tags")("tourism"), col("tags")("highway")))
    val m = typed.select("id", "tipe").as[(Long, Option[String])].collect().toMap
    assert(m(1L).contains("restaurant"))
    assert(m(4L).contains("zoo"))
    assert(m(3L).contains("residential"))
    assert(m(2L).isEmpty)
  }

  test("P3: drop objects with no name and no highway tag") {
    val kept = ways
      .withColumn("name", col("tags")("name"))
      .filter(col("name").isNotNull || col("tags")("highway").isNotNull)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("F12: capitalize = upper first char + lower rest (indexer.go:1068-1073)") {
    val cap = (c: org.apache.spark.sql.Column) =>
      concat(upper(substring(c, 1, 1)), lower(substring(c, 2, 1000000)))
    val out = Seq("kebun BINATANG", "x", "").toDF("s")
      .select(cap(col("s"))).as[String].collect()
    assert(out.toSeq === Seq("Kebun binatang", "X", ""))
  }
}
