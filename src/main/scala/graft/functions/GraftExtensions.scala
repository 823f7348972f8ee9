package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes the
  * native functions available to pure-SQL users cluster-wide.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.CollapseDistinctShingles)
    ext.injectOptimizerRule(session => graft.plans.ManifestPrune(session))
    ext.injectOptimizerRule(session => graft.plans.ManifestAgg(session))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo("graft.functions", "graft_cosine"),
      args => QuantizedCosine(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo("graft.functions", "graft_simhash64"),
      args => SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo("graft.functions", "graft_rolling_hash"),
      args => RollingHash(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo("graft.functions", "graft_pq_adc"),
      args => PqAdc(args(0), args(1))))
  }
}
