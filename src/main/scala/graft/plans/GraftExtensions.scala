package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Cluster-deploy entry point for graft's native expressions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  *
  * Sessions the library does not construct (notebooks, Thrift server,
  * spark-submit) get `graft_dot_long` & co. at session build time; for
  * sessions that already exist, [[GraftFunctions.register]] installs the
  * same functions at runtime — both paths end in the same registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // no-op until spark.graft.rangeJoin.bucketWidth is set > 0
    ext.injectOptimizerRule(_ => RangeJoinRule)
    // plans AsofJoinPlan nodes (built by AsOf.asofJoinNative)
    ext.injectPlannerStrategy(_ => AsofStrategy)
    // SQL views over GraftCatalog tables (CREATE/ALTER/DROP/SHOW VIEW
    // + read substitution) — no-op on plans that touch no graft view.
    // HINT batch, not Resolution: ResolveSessionCatalog hard-refuses
    // view DDL on non-session catalogs before resolution rules run
    ext.injectHintResolutionRule(_ => graft.sources.GraftViewRule)
    // CREATE/REFRESH/DROP MATERIALIZED VIEW — Spark's grammar has no
    // such statement; the delegating parser claims exactly those
    // three forms and passes every other statement through verbatim
    ext.injectParser((_, delegate) =>
      new graft.sources.GraftSqlParser(delegate))
  }
}
