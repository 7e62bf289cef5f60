package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal SQL-model layer — the Spark analog of the reference's dbt
  * integration (reference: etl/factories/dbt_factory.py maps dbt models /
  * sources onto the asset graph). A model is named SQL selecting from source
  * tables and/or upstream models; models materialize as temp views in
  * dependency order and every intermediate stays a lazy Catalyst plan —
  * referencing a model inlines its plan, so the optimizer sees through the
  * whole chain (filter pushdown across model boundaries for free).
  */
object SqlModels {

  /** A named model: `sql` may reference sources and previously-run models. */
  final case class Model(name: String, sql: String, deps: Seq[String] = Nil)

  /** Materialize `sources` as temp views, then run models in topological
    * order. Returns the model frames by name.
    */
  def run(spark: SparkSession, sources: Map[String, DataFrame], models: Seq[Model]): Map[String, DataFrame] = {
    sources.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    val byName = models.map(m => m.name -> m).toMap
    var done = Map.empty[String, DataFrame]

    def visit(name: String, stack: Set[String]): Unit = {
      if (!done.contains(name)) {
        require(!stack.contains(name), s"model dependency cycle at $name")
        val m = byName.getOrElse(name,
          throw new IllegalArgumentException(s"unknown model $name"))
        m.deps.filter(byName.contains).foreach(visit(_, stack + name))
        val df = spark.sql(m.sql)
        df.createOrReplaceTempView(m.name)
        done += name -> df
      }
    }
    models.foreach(m => visit(m.name, Set.empty))
    done
  }
}
