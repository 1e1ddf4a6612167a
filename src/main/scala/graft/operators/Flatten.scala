package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive schema flattening (SURVEY.md §2.8 F16; reference
  * utils.py:165-179 flatten_dict — nested dicts become underscore-joined
  * scalar columns, lists become ", "-joined strings). Resolved at plan
  * time from the schema: no UDF, no row-level recursion. */
object Flatten {

  private def leafCols(dt: DataType, path: Column, name: String): Seq[(String, Column)] =
    dt match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f =>
          leafCols(f.dataType, path.getField(f.name), s"${name}_${f.name}"))
      case ArrayType(_: StructType, _) =>
        // struct lists keep full fidelity as JSON (the reference str()s them)
        Seq(name -> to_json(path))
      case ArrayType(_, _) =>
        Seq(name -> array_join(path.cast("array<string>"), ", "))
      case _ => Seq(name -> path)
    }

  /** Flatten every nested column; scalars pass through unchanged. */
  def flatten(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case _: StructType | _: ArrayType => leafCols(f.dataType, col(f.name), f.name)
        case _ => Seq(f.name -> col(f.name))
      }
    }
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }
}
