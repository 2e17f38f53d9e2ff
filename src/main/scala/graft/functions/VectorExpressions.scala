package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{shim => sqlshim}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-heavy operators (SURVEY.md §2
  * B5). The built-in higher-order functions (`zip_with` + `aggregate`) are
  * interpreted per element with boxing — fine for occasional use, 10ms/row
  * for a 96-plane LSH projection. These expressions run the same arithmetic
  * as a tight JVM loop inside whole-stage codegen.
  *
  * Arithmetic order matches the HOF formulation exactly (sequential
  * left-fold in double), so results — and the DuckDB oracle parity — are
  * bit-for-bit unchanged.
  */
object VectorExpressions {

  /** cosine(a, b) as a Column; arrays of float or double. */
  def cosine(a: Column, b: Column): Column =
    sqlshim.column(CosineSim(sqlshim.expression(a), sqlshim.expression(b)))

  /** All LSH table keys for a vector: long[tables], bit j of key t = sign of
    * the projection onto plane t*k+j.
    */
  def hyperplaneKeys(vec: Column, planes: Array[Array[Double]], tables: Int, k: Int): Column =
    sqlshim.column(HyperplaneSignKeys(sqlshim.expression(vec), planes, tables, k))
}

/** Cosine similarity of two numeric arrays, computed in one pass:
  * dot/(sqrt(na)*sqrt(nb)), sequential fold in document order.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // dimension mismatch → null, never a silently-truncated score
    if (n != y.numElements()) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xv = (double) $a.$lGet($i);
            double $yv = (double) $b.$rGet($i);
            $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Packed sign-LSH table keys: for each of `tables` tables, a long whose k
  * low bits are the signs of the vector's projections onto that table's
  * hyperplanes. One pass over tables×k×dim in codegen'd arithmetic.
  */
case class HyperplaneSignKeys(child: Expression, planes: Array[Array[Double]],
                              tables: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    val isF = elemIsFloat
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bits = 0L
      var j = 0
      while (j < k) {
        val row = planes(t * k + j)
        var proj = 0.0
        val n = math.min(dim, row.length)
        var i = 0
        while (i < n) {
          val v = if (isF) vec.getFloat(i).toDouble else vec.getDouble(i)
          proj += v * row(i)
          i += 1
        }
        if (proj > 0) bits |= (1L << j)
        j += 1
      }
      keys(t) = bits
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, vec => {
      val keys = ctx.freshName("keys"); val t = ctx.freshName("t"); val j = ctx.freshName("j")
      val bits = ctx.freshName("bits"); val proj = ctx.freshName("proj")
      val row = ctx.freshName("row"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
        long[] $keys = new long[$tables];
        int ${n}dim = $vec.numElements();
        for (int $t = 0; $t < $tables; $t++) {
          long $bits = 0L;
          for (int $j = 0; $j < $k; $j++) {
            double[] $row = $planesRef[$t * $k + $j];
            double $proj = 0.0;
            int $n = java.lang.Math.min(${n}dim, $row.length);
            for (int $i = 0; $i < $n; $i++) {
              $proj += ((double) $vec.$get($i)) * $row[$i];
            }
            if ($proj > 0) $bits |= (1L << $j);
          }
          $keys[$t] = $bits;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignKeys =
    copy(child = newChild)
}
