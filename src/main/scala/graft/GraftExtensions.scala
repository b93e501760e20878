package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the engine's native
  * expressions at session BUILD time, so they resolve in plain SQL text
  * (`SELECT graft_dot(a, b)`) on every session of a cluster configured
  * with
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * This is the deployment-grade twin of the runtime registration in
  * [[graft.functions.Functions.register]] (which call sites use on
  * already-running sessions): injected functions survive session
  * cloning, reach pure-SQL clients (JDBC/thrift), and need no driver
  * code to run first. Both paths register the SAME expression builders,
  * so a plan is identical however the function was resolved.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injected.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
}

object GraftExtensions {
  /** The engine's native-function surface, single-sourced for the
    * extension injection and (by construction of the builders) identical
    * to the runtime registration path. */
  val injected: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    (graft.functions.Functions.DotName, classOf[graft.functions.DotProduct],
      graft.functions.Functions.dotBuilder),
    (graft.functions.PqEncode.Name, classOf[graft.functions.PqEncode],
      graft.functions.PqEncode.builder),
    (graft.functions.NfcNormalize.Name, classOf[graft.functions.NfcNormalize],
      graft.functions.NfcNormalize.builder),
    (graft.functions.JpegSofOffset.Name, classOf[graft.functions.JpegSofOffset],
      graft.functions.JpegSofOffset.builder),
  )
}
