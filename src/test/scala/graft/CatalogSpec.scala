package graft

import org.apache.spark.sql.functions._
import graft.catalog._

class CatalogSpec extends SparkSpecBase {

  private lazy val dbs = CatalogFixtures.dbs(spark, sfDir)
  private lazy val tablesT = MetastoreTransformer.tables(
    MetastoreTransformer.databases(dbs, CatalogFixtures.dbParams(spark, sfDir)),
    CatalogFixtures.tbls(spark, sfDir),
    CatalogFixtures.tblParams(spark, sfDir),
    MetastoreTransformer.storageDescriptors(
      CatalogFixtures.sds(spark, sfDir), CatalogFixtures.serdes(spark, sfDir),
      CatalogFixtures.columnsV2(spark, sfDir), CatalogFixtures.skewedColNames(spark, sfDir)),
    CatalogFixtures.partitionKeys(spark, sfDir))

  test("every table entity carries an SD with idx-ordered columns") {
    val rows = tablesT.select(col("name"),
      col("storageDescriptor.columns").as("cols")).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val cols = r.getSeq[org.apache.spark.sql.Row](1)
      assert(cols.nonEmpty, s"${r.getString(0)} has no columns")
    }
  }

  test("s3n/s3a locations are normalized in entities") {
    val locs = tablesT.select(col("storageDescriptor.location")).collect()
    assert(locs.forall(_.getString(0).startsWith("s3://")))
  }

  test("null-safe fills: tables without params get empty maps not nulls") {
    val n = tablesT.where(col("parameters").isNull).count()
    assert(n == 0)
  }

  test("decompose inverts assemble for partition key vals") {
    val partsT = MetastoreTransformer.partitions(
      CatalogFixtures.partitions(spark, sfDir),
      CatalogFixtures.partitionKeyVals(spark, sfDir),
      tablesT,
      null)
    val back = DataCatalogTransformer.partitionKeyVals(partsT)
    val src = CatalogFixtures.partitionKeyVals(spark, sfDir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src.select(col("PART_ID"), col("INTEGER_IDX"),
      col("PART_KEY_VAL"))).isEmpty)
  }

  test("partition names follow key(type)=vals format") {
    val partsT = MetastoreTransformer.partitions(
      CatalogFixtures.partitions(spark, sfDir),
      CatalogFixtures.partitionKeyVals(spark, sfDir),
      tablesT, null)
    val names = partsT.select("partitionName").collect().map(_.getString(0))
    assert(names.forall(_.matches("""year\(int\),month\(int\)=\d{4},\d{1,2}""")))
  }
}
