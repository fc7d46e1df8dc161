package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KEEL-format compatibility source (SURVEY.md §2.3 note, FIXTURES.md §B).
  *
  * The reference consumes KEEL datasets: an `@relation`/`@attribute`
  * header declaring per-attribute type and `[min, max]` range, then CSV
  * data lines; real attributes are min-max normalized to [0,1] using the
  * HEADER ranges (no data pass — the normalize bounds constant-fold into
  * the scan projection, exactly the reference's KeelParser behavior
  * [LINEAGE]), nominals and the class label integer-encode by declared
  * position.
  *
  * Distributed shape: the header (a few lines) is collected once; data
  * parsing is pure Catalyst — `split` + per-attribute projections — so
  * pushdown/codegen apply and nothing else touches the driver.
  */
object KeelSource {

  sealed trait Kind
  case class RealAttr(min: Double, max: Double) extends Kind
  case class NominalAttr(values: Seq[String]) extends Kind
  case class Attr(name: String, kind: Kind)

  case class Schema(relation: String, attrs: Seq[Attr], inputs: Seq[String], output: String)

  private val RealRe = """(?i)@attribute\s+(\S+)\s+(?:real|integer)\s*\[\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)\s*\]""".r
  private val NominalRe = """(?i)@attribute\s+(\S+)\s*\{\s*([^}]*)\}""".r
  private val RelationRe = """(?i)@relation\s+(\S+)""".r
  private val InputsRe = """(?i)@inputs\s+(.*)""".r
  private val OutputsRe = """(?i)@outputs\s+(.*)""".r

  def parseHeader(lines: Seq[String]): Schema = {
    var relation = ""
    val attrs = Seq.newBuilder[Attr]
    var inputs: Seq[String] = Nil
    var output = ""
    lines.map(_.trim).filter(_.nonEmpty).foreach {
      case RelationRe(r) => relation = r
      case RealRe(n, lo, hi) => attrs += Attr(n, RealAttr(lo.toDouble, hi.toDouble))
      case NominalRe(n, vs) => attrs += Attr(n, NominalAttr(vs.split(",").map(_.trim).toSeq))
      case InputsRe(ns) => inputs = ns.split(",").map(_.trim).toSeq
      case OutputsRe(n) => output = n.trim
      case _ => // @data / comments
    }
    val as = attrs.result()
    Schema(relation,
      as,
      if (inputs.nonEmpty) inputs else as.dropRight(1).map(_.name),
      if (output.nonEmpty) output else as.last.name)
  }

  /** One Column per attribute from the split CSV line: real → min-max
    * normalized via header bounds (constant-folded literals), nominal →
    * declared-position index.
    */
  private def attrCol(parts: Column, idx: Int, attr: Attr): Column = {
    val raw = trim(element_at(parts, idx + 1))
    attr.kind match {
      case RealAttr(lo, hi) if hi > lo =>
        (raw.cast("double") - lit(lo)) / lit(hi - lo)
      case RealAttr(_, _) => raw.cast("double")
      case NominalAttr(vs) =>
        vs.zipWithIndex.foldLeft(lit(-1)) { case (acc, (v, i)) =>
          when(raw === v, lit(i)).otherwise(acc)
        }
    }
  }

  /** Read a KEEL file → (id BIGINT, v ARRAY<DOUBLE> [normalized inputs],
    * label INT) — the engine's classification-relation shape (Tables /
    * SURVEY §1.2), ready for `Fknn`.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val header = spark.sparkContext.textFile(path)
      .filter(_.trim.startsWith("@")).collect().toSeq
    val schema = parseHeader(header)
    val byName = schema.attrs.map(a => a.name -> a).toMap
    val attrIdx = schema.attrs.map(_.name).zipWithIndex.toMap

    val lines = spark.read.textFile(path).toDF("line")
      .filter(!trim(col("line")).startsWith("@") && trim(col("line")) =!= "")
    val parts = split(col("line"), ",")
    val inputCols = schema.inputs.map { n => attrCol(parts, attrIdx(n), byName(n)).cast("double") }
    val labelCol = attrCol(parts, attrIdx(schema.output), byName(schema.output)).cast("int")
    lines.select(
      monotonically_increasing_id().as("id"),
      array(inputCols: _*).as("v"),
      labelCol.as("label"))
  }
}
