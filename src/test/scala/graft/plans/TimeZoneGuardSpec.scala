package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.meta.{MetadataStore, OffloadMetadata}
import graft.orchestrate.OffloadRunner

class TimeZoneGuardSpec extends SparkSpec {

  test("offload records the writer session timezone in metadata") {
    val base = Files.createTempDirectory("graft_tz").toString
    val steps = OffloadRunner.offload(spark, OffloadRunner.OffloadConfig(
      sourceTable = "nation",
      sourcePath = sf("sf0.001") + "/nation.parquet",
      stagingPath = s"$base/staging", finalPath = s"$base/final",
      metadataDir = s"$base/meta"))
    assert(steps.forall(_.ok))
    val meta = MetadataStore.load(s"$base/meta", "nation").get
    assert(meta.writerTimeZone.contains(TimeZoneGuard.sessionTz(spark)))
    // round-trips through the JSON store
    assert(MetadataStore.fromJson(MetadataStore.toJson(meta)) == meta)
  }

  test("check passes on match, throws on mismatch; legacy metadata passes") {
    val here = TimeZoneGuard.sessionTz(spark)
    val ok = OffloadMetadata("t", "b", "FULL", writerTimeZone = Some(here))
    TimeZoneGuard.check(spark, ok) // no throw
    val other = OffloadMetadata("t", "b", "FULL",
      writerTimeZone = Some("America/New_York"))
    val e = intercept[TimeZoneGuard.TimeZoneMismatch] {
      TimeZoneGuard.check(spark, other)
    }
    assert(e.getMessage.contains("America/New_York"))
    // metadata written before the guard existed has no TZ: passes
    TimeZoneGuard.check(spark, OffloadMetadata("t", "b", "FULL"))
  }

  test("pinned runs the body under the writer zone and restores") {
    val prev = TimeZoneGuard.sessionTz(spark)
    val meta = OffloadMetadata("t", "b", "FULL",
      writerTimeZone = Some("America/New_York"))
    val seen = TimeZoneGuard.pinned(spark, meta) {
      TimeZoneGuard.sessionTz(spark)
    }
    assert(seen == "America/New_York")
    assert(TimeZoneGuard.sessionTz(spark) == prev)
    // restore happens even when the body throws
    intercept[RuntimeException] {
      TimeZoneGuard.pinned(spark, meta) { throw new RuntimeException("x") }
    }
    assert(TimeZoneGuard.sessionTz(spark) == prev)
  }
}
