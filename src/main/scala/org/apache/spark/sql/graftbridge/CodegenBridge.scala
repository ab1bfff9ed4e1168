package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}

/** Bridge into `private[sql]` codegen internals: a whole-stage codegen
  * COMPILE failure (janino's 64KB method limit, typically) is caught at
  * runtime and silently falls back to the interpreted path — the plan
  * string still shows `WholeStageCodegen`, so plan inspection cannot prove
  * a kernel stays codegen'd. This compiles every whole-stage subtree of a
  * physical plan eagerly and throws on janino failure, which is what the
  * scale specs assert. */
object CodegenBridge {

  /** Compile every WholeStageCodegenExec in `plan`; returns how many stages
    * were compiled. Throws (janino CompileException wrapped by Spark) if any
    * stage's generated code fails to compile. */
  def compileWholeStageCode(plan: SparkPlan): Int = {
    val stages = plan.collect { case w: WholeStageCodegenExec => w }
    stages.foreach { w =>
      val (_, code) = w.doCodeGen()
      CodeGenerator.compile(code)
    }
    stages.size
  }
}
