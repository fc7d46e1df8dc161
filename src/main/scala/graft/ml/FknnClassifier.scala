package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{IntParam, ParamMap, ParamValidators, Params}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.core.Fknn

/** spark.ml Pipeline wrapper for the FkNN core — the "MLlib pipeline +
  * DataFrame operations" surface named in BASELINE.json. `fit` runs
  * stage 1 (Keller class-membership degrees over train) and caches it in
  * the model; `transform` runs stage 2 against any query frame.
  *
  * Input contract (both stages): columns `vec_id BIGINT`,
  * `v ARRAY<DOUBLE>`, `label INT` — the engine's classification-relation
  * shape (SURVEY §1.2); the model appends `predicted INT`.
  */
trait FknnParams extends Params {
  final val k = new IntParam(this, "k", "number of neighbors", ParamValidators.gt(0))
  final val nClasses = new IntParam(this, "nClasses", "number of classes", ParamValidators.gt(1))
  def getK: Int = $(k)
  def getNClasses: Int = $(nClasses)
  setDefault(k -> 5, nClasses -> 10)

  protected def validate(schema: StructType): StructType = {
    require(Seq("vec_id", "v", "label").forall(n => schema.fieldNames.contains(n)),
      s"expected columns (vec_id, v, label), got ${schema.fieldNames.mkString(", ")}")
    StructType(schema.fields :+ StructField("predicted", IntegerType, nullable = false))
  }
}

class FknnClassifier(override val uid: String) extends Estimator[FknnModel] with FknnParams {
  def this() = this(Identifiable.randomUID("fknn"))

  def setK(value: Int): this.type = set(k, value)
  def setNClasses(value: Int): this.type = set(nClasses, value)

  override def fit(dataset: Dataset[_]): FknnModel = {
    val train = dataset.select(col("vec_id"), col("v"), col("label"))
    val memberships = Fknn.membershipInit(train, getK, getNClasses)
    val model = new FknnModel(uid, train, memberships, getK)
    copyValues(model.setParent(this))
  }

  override def transformSchema(schema: StructType): StructType = validate(schema)
  override def copy(extra: ParamMap): FknnClassifier = defaultCopy(extra)
}

class FknnModel(
    override val uid: String,
    private val train: DataFrame,
    val memberships: DataFrame,
    private val kValue: Int)
  extends Model[FknnModel] with FknnParams {

  override def transform(dataset: Dataset[_]): DataFrame = {
    val queries = dataset.select(col("vec_id"), col("v"), col("label"))
    val pred = Fknn.classify(memberships, train, queries, kValue)
      .withColumnRenamed("q_id", "vec_id")
    dataset.toDF().join(pred, "vec_id")
  }

  override def transformSchema(schema: StructType): StructType = validate(schema)
  override def copy(extra: ParamMap): FknnModel =
    copyValues(new FknnModel(uid, train, memberships, kValue)).setParent(parent)
}
