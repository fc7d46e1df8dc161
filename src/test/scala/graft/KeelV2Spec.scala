package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

class KeelV2Spec extends SparkSpecBase {

  private val keel =
    """@relation toy2d
      |@attribute x real [0.0, 10.0]
      |@attribute y real [0.0, 10.0]
      |@attribute class {A, B}
      |@inputs x, y
      |@outputs class
      |@data
      |1.0, 1.0, A
      |1.5, 1.2, A
      |8.0, 8.5, B
      |8.2, 8.0, B
      |5.0, 5.0, A
      |""".stripMargin

  private def writeDir(nFiles: Int): String = {
    val dir = Files.createTempDirectory("keelv2")
    (1 to nFiles).foreach(i => Files.writeString(dir.resolve(s"part$i.dat"), keel))
    dir.toString
  }

  test("format(keel) resolves via DataSourceRegister; schema inferred from header") {
    val df = spark.read.format("keel").load(writeDir(1))
    assert(df.schema.fieldNames.toSeq === Seq("x", "y", "class"))
    assert(df.schema("x").dataType === DoubleType)
    assert(df.schema("class").dataType === IntegerType)
    val rows = df.orderBy("x").collect()
    assert(rows.length === 5)
    assert(rows.head.getDouble(0) === 0.1)  // 1.0 normalized by header [0,10]
    assert(rows.head.getInt(2) === 0)       // A → 0
    assert(rows.last.getDouble(1) === 0.80) // 8.0 / 10
    assert(rows.last.getInt(2) === 1)       // B → 1
  }

  test("a directory of KEEL files scans as one table, one partition per file") {
    val df = spark.read.format("keel").load(writeDir(3))
    assert(df.count() === 15)
    assert(df.rdd.getNumPartitions === 3)
  }

  test("column pruning reaches the reader (scan readSchema = projected columns)") {
    val df = spark.read.format("keel").load(writeDir(1)).select("y")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("y"))
    assert(df.as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect().sorted.toSeq === Seq(0.1, 0.12, 0.5, 0.8, 0.85))
  }

  test("empty directory fails schema inference with a clear message, not a bare head()") {
    val dir = Files.createTempDirectory("keelv2_empty")
    Files.writeString(dir.resolve("_SUCCESS"), "")
    val e = intercept[IllegalArgumentException](
      spark.read.format("keel").load(dir.toString).schema)
    assert(e.getMessage.contains("no data files"))
  }

  test("missing/malformed fields emit NULL per the nullable schema, not task death") {
    val dirty =
      """@relation toy2d
        |@attribute x real [0.0, 10.0]
        |@attribute y real [0.0, 10.0]
        |@attribute class {A, B}
        |@data
        |?, 1.0, A
        |2.0, oops, B
        |3.0, 3.0, C
        |4.0
        |5.0, 5.0, B
        |""".stripMargin
    val dir = Files.createTempDirectory("keelv2_dirty")
    Files.writeString(dir.resolve("part1.dat"), dirty)
    val rows = spark.read.format("keel").load(dir.toString).orderBy("x").collect()
    assert(rows.length === 5)
    assert(rows(0).isNullAt(0) && rows(0).getDouble(1) === 0.1)   // '?' → NULL
    assert(rows(1).isNullAt(1))                                   // unparseable real
    assert(rows(2).isNullAt(2))                                   // unknown nominal ≠ -1
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2))            // short row
    assert(rows(4).getInt(2) === 1)                               // clean row intact
  }

  test("DSv2 column values match the KeelSource convenience loader") {
    val dir = writeDir(1)
    val v2 = spark.read.format("keel").load(dir)
      .select(array(col("x"), col("y")).as("v"), col("class").as("label"))
    val v1 = graft.sources.KeelSource.read(spark, dir + "/part1.dat")
      .select(col("v"), col("label"))
    assert(collectSet(v2) === collectSet(v1))
  }
}
