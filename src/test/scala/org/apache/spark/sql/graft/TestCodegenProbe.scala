package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** Test-only: force-compile every WholeStageCodegen stage of a plan.
  *
  * Executing a plan whose generated Java breaks the JVM's 64 KB method
  * limit does NOT fail — Spark logs `Failed to compile the generated
  * Java code` and silently re-plans the stage interpreted (a 10x-class
  * cliff on arithmetic-heavy scans). A plan-string assertion cannot see
  * that, so codegen pins ALSO run the generated source through janino
  * eagerly and let the compile exception fail the spec.
  */
object TestCodegenProbe {
  def assertCompiles(df: DataFrame): Unit = {
    val stages = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    require(stages.nonEmpty, "no WholeStageCodegen stage in plan")
    stages.foreach { w =>
      val (_, code) = w.doCodeGen()
      CodeGenerator.compile(code)
    }
  }
}
