package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BmpDecodeExpr, BmpEncodeExpr, BmpPoolExpr, BmpResizeExpr, DotProductExpr, KmvSketchAgg, PngDecodeExpr, PngEncodeExpr, PrioritySampleAgg, RollingHashExpr, WavDecodeExpr, WavEncodeExpr, WavPoolExpr, WavResampleExpr}

/** Session-extension wiring for the library's native expressions —
  * the `SparkSessionExtensions` integration point, so a cluster deploy
  * adds `spark.sql.extensions=graft.plans.GraftExtensions` and every
  * SQL surface (spark.sql, JDBC, notebooks) sees the same codegen
  * fast paths the Scala API uses:
  *
  *   SELECT graft_dot(a.e, b.e) FROM ...
  *
  * plans the fused multiply-add loop of [[graft.functions.DotProductExpr]]
  * inside whole-stage codegen — not an interpreted higher-order
  * function, not a UDF.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injections.foreach(ext.injectFunction)
    // naive |lt - rt| <= B interval joins (no equi conjunct → would
    // plan as a nested loop) rewrite to the bucketized equi-join
    ext.injectOptimizerRule(_ => IntervalJoinBucketize)
  }
}

object GraftExtensions {

  /** The injected function set, shared by the extensions path and
    * [[register]] so both wirings stay in lockstep. */
  private[plans] val injections: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b) takes exactly two arguments")
        DotProductExpr(args.head, args(1))
      }), (
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "graft_rolling_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_rolling_hash(text, k) takes exactly two arguments")
        args(1) match {
          case Literal(k: Int, IntegerType) => RollingHashExpr(args.head, k)
          case other => throw new IllegalArgumentException(
            s"graft_rolling_hash window must be an integer literal, got $other")
        }
      }), (
      FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv"),
      (args: Seq[Expression]) => {
        // the analyzer wraps a bare AggregateFunction returned from a
        // registry builder in an AggregateExpression itself
        require(args.length == 2, "graft_kmv(hashed, k) takes two arguments")
        args(1) match {
          case Literal(k: Int, IntegerType) => KmvSketchAgg(args.head, k)
          case other => throw new IllegalArgumentException(
            s"graft_kmv sketch width must be an integer literal, got $other")
        }
      }), (
      FunctionIdentifier("graft_priority_sample"),
      new ExpressionInfo(classOf[PrioritySampleAgg].getName,
        "graft_priority_sample"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_priority_sample(hash, value, k) takes three arguments")
        args(2) match {
          case Literal(k: Int, IntegerType) =>
            PrioritySampleAgg(args.head, args(1), k)
          case other => throw new IllegalArgumentException(
            s"graft_priority_sample width must be an integer literal, got $other")
        }
      }), (
      FunctionIdentifier("graft_bmp_encode"),
      new ExpressionInfo(classOf[BmpEncodeExpr].getName, "graft_bmp_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_bmp_encode(doc_id) takes one argument")
        BmpEncodeExpr(args.head)
      }), (
      FunctionIdentifier("graft_bmp_decode"),
      new ExpressionInfo(classOf[BmpDecodeExpr].getName, "graft_bmp_decode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_bmp_decode(payload) takes one argument")
        BmpDecodeExpr(args.head)
      }), (
      FunctionIdentifier("graft_bmp_resize"),
      new ExpressionInfo(classOf[BmpResizeExpr].getName, "graft_bmp_resize"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_bmp_resize(payload, out_w, out_h) takes three arguments")
        (args(1), args(2)) match {
          case (Literal(w: Int, IntegerType), Literal(h: Int, IntegerType)) =>
            BmpResizeExpr(args.head, w, h)
          case other => throw new IllegalArgumentException(
            s"graft_bmp_resize target shape must be integer literals, got $other")
        }
      }), (
      FunctionIdentifier("graft_bmp_pool"),
      new ExpressionInfo(classOf[BmpPoolExpr].getName, "graft_bmp_pool"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_bmp_pool(payload, grid_w, grid_h) takes three arguments")
        (args(1), args(2)) match {
          case (Literal(w: Int, IntegerType), Literal(h: Int, IntegerType)) =>
            BmpPoolExpr(args.head, w, h)
          case other => throw new IllegalArgumentException(
            s"graft_bmp_pool grid shape must be integer literals, got $other")
        }
      }), (
      FunctionIdentifier("graft_png_encode"),
      new ExpressionInfo(classOf[PngEncodeExpr].getName, "graft_png_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_png_encode(doc_id) takes one argument")
        PngEncodeExpr(args.head)
      }), (
      FunctionIdentifier("graft_png_decode"),
      new ExpressionInfo(classOf[PngDecodeExpr].getName, "graft_png_decode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_png_decode(payload) takes one argument")
        PngDecodeExpr(args.head)
      }), (
      FunctionIdentifier("graft_wav_encode"),
      new ExpressionInfo(classOf[WavEncodeExpr].getName, "graft_wav_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_wav_encode(doc_id) takes one argument")
        WavEncodeExpr(args.head)
      }), (
      FunctionIdentifier("graft_wav_decode"),
      new ExpressionInfo(classOf[WavDecodeExpr].getName, "graft_wav_decode"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_wav_decode(payload) takes one argument")
        WavDecodeExpr(args.head)
      }), (
      FunctionIdentifier("graft_wav_resample"),
      new ExpressionInfo(classOf[WavResampleExpr].getName, "graft_wav_resample"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_wav_resample(payload, factor) takes two arguments")
        args(1) match {
          case Literal(f: Int, IntegerType) => WavResampleExpr(args.head, f)
          case other => throw new IllegalArgumentException(
            s"graft_wav_resample factor must be an integer literal, got $other")
        }
      }), (
      FunctionIdentifier("graft_wav_pool"),
      new ExpressionInfo(classOf[WavPoolExpr].getName, "graft_wav_pool"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_wav_pool(payload, n_bands) takes two arguments")
        args(1) match {
          case Literal(n: Int, IntegerType) => WavPoolExpr(args.head, n)
          case other => throw new IllegalArgumentException(
            s"graft_wav_pool band count must be an integer literal, got $other")
        }
      }))

  /** Runtime registration on a live session (the notebook/REPL path —
    * same functions, no restart needed). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
