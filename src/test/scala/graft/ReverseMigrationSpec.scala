package graft

import org.apache.spark.sql.functions._
import graft.catalog._

/** Invariants of the reverse migration that the flat e2e gate can't
  * express directly: id continuation above the existing metastore,
  * FK closure of the generated tables, and the skewed string-list
  * codec roundtrip. */
class ReverseMigrationSpec extends SparkSpecBase {

  private lazy val f = new {
    val dbs = CatalogFixtures.dbs(spark, sfDir)
    val dbParams = CatalogFixtures.dbParams(spark, sfDir)
    val tbls = CatalogFixtures.tbls(spark, sfDir)
    val tblParams = CatalogFixtures.tblParams(spark, sfDir)
    val sds = CatalogFixtures.sds(spark, sfDir)
    val serdes = CatalogFixtures.serdes(spark, sfDir)
    val columnsV2 = CatalogFixtures.columnsV2(spark, sfDir)
    val skewed = CatalogFixtures.skewedColNames(spark, sfDir)
    val skewedVals = CatalogFixtures.skewedStringListValues(spark, sfDir)
    val skewedLocMap = CatalogFixtures.skewedColValueLocMap(spark, sfDir)
    val partitionsRel = CatalogFixtures.partitions(spark, sfDir)
    val partKeyVals = CatalogFixtures.partitionKeyVals(spark, sfDir)
    val partKeys = CatalogFixtures.partitionKeys(spark, sfDir)
  }

  private lazy val rel: Map[String, org.apache.spark.sql.DataFrame] = {
    val sdsT = MetastoreTransformer.storageDescriptorsWithSkew(
      f.sds, f.serdes, f.columnsV2, f.skewed, f.skewedVals, f.skewedLocMap)
    val databasesT = MetastoreTransformer.databases(f.dbs, f.dbParams)
    val tablesT = MetastoreTransformer.tables(
      databasesT, f.tbls, f.tblParams, sdsT, f.partKeys)
    val partitionsT = MetastoreTransformer.partitionsWithSd(
      f.partitionsRel, f.partKeyVals, tablesT, sdsT)
    ReverseMigration.transform(
      databasesT.drop("DB_ID"), tablesT.drop("TBL_ID"),
      partitionsT.drop("PART_ID"),
      Map(
        "DB_ID" -> ReverseMigration.startId(Some(f.dbs), "DB_ID"),
        "TBL_ID" -> ReverseMigration.startId(Some(f.tbls), "TBL_ID"),
        "SD_ID" -> ReverseMigration.startId(Some(f.sds), "SD_ID"),
        "CD_ID" -> ReverseMigration.startId(Some(f.sds), "CD_ID"),
        "SERDE_ID" -> ReverseMigration.startId(Some(f.sds), "SERDE_ID"),
        "PART_ID" -> ReverseMigration.startId(Some(f.partitionsRel), "PART_ID"),
        "STRING_LIST_ID_KID" ->
          ReverseMigration.startId(Some(f.skewedLocMap), "STRING_LIST_ID_KID")))
  }

  test("all 19 metastore tables are produced in FK write order") {
    assert(ReverseMigration.writeOrder.size == 19)
    assert(ReverseMigration.writeOrder.toSet == rel.keySet)
  }

  test("FK levels respect every parent edge and compress 19 jobs to 5 barriers") {
    val lv = graft.sources.JdbcIO.fkLevels(
      ReverseMigration.writeOrder, ReverseMigration.fkParents)
    // every child strictly after all its parents
    ReverseMigration.fkParents.foreach { case (child, parents) =>
      parents.foreach(p => assert(lv(child) > lv(p),
        s"$child (level ${lv(child)}) must load after $p (level ${lv(p)})"))
    }
    // the flat writeOrder is one valid linearization of the graph:
    // levels must be monotone along it for parent/child pairs (already
    // implied above) and the graph must collapse to 5 levels
    assert(lv.values.max == 4, s"expected 5 levels, got ${lv.values.max + 1}")
    assert(lv.keySet == ReverseMigration.writeOrder.toSet)
    // a cycle is a caller error
    intercept[IllegalArgumentException] {
      graft.sources.JdbcIO.fkLevels(Seq("A", "B"),
        Map("A" -> Seq("B"), "B" -> Seq("A")))
    }
  }

  test("generated ids continue consecutively above the existing max") {
    def ids(t: String, c: String): Seq[Long] =
      rel(t).select(col(c).cast("long")).collect().map(_.getLong(0)).toSeq.sorted
    val dbIds = ids("DBS", "DB_ID")
    val dbStart = ReverseMigration.startId(Some(f.dbs), "DB_ID")
    assert(dbIds == (dbStart until dbStart + dbIds.size))
    val tblIds = ids("TBLS", "TBL_ID")
    val tblStart = ReverseMigration.startId(Some(f.tbls), "TBL_ID")
    assert(tblIds == (tblStart until tblStart + tblIds.size))
    val sdIds = ids("SDS", "SD_ID")
    val sdStart = ReverseMigration.startId(Some(f.sds), "SD_ID")
    assert(sdIds == (sdStart until sdStart + sdIds.size))
    val partIds = ids("PARTITIONS", "PART_ID")
    val partStart = ReverseMigration.startId(Some(f.partitionsRel), "PART_ID")
    assert(partIds == (partStart until partStart + partIds.size))
  }

  test("FK closure: every child id resolves to a parent row") {
    def orphanCount(child: String, key: String, parent: String): Long =
      rel(child).join(rel(parent), Seq(key), "left_anti").count()
    assert(orphanCount("TBLS", "DB_ID", "DBS") == 0)
    assert(orphanCount("TBLS", "SD_ID", "SDS") == 0)
    assert(orphanCount("PARTITIONS", "TBL_ID", "TBLS") == 0)
    assert(orphanCount("PARTITIONS", "SD_ID", "SDS") == 0)
    assert(orphanCount("COLUMNS_V2", "CD_ID", "CDS") == 0)
    assert(orphanCount("SKEWED_COL_NAMES", "SD_ID", "SDS") == 0)
    assert(orphanCount("SKEWED_COL_VALUE_LOC_MAP", "SD_ID", "SDS") == 0)
    assert(rel("SKEWED_STRING_LIST_VALUES")
      .join(rel("SKEWED_STRING_LIST"), Seq("STRING_LIST_ID"), "left_anti")
      .count() == 0)
  }

  test("skewed string lists roundtrip through the encode/F6-decode codec") {
    // original values (id-agnostic): one (region, idx) → value mapping
    val orig = f.skewedVals.select("STRING_LIST_VALUE", "INTEGER_IDX")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val back = rel("SKEWED_STRING_LIST_VALUES")
      .select(col("STRING_LIST_VALUE"), col("INTEGER_IDX"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(back == orig, s"decoded values $back != original $orig")
  }
}
