package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression reporting the RAW JSON token kind at an
  * object-key path — the piece `get_json_object` cannot provide because
  * it strips quotes: the JSON number `5` and the JSON string `"5"` both
  * extract as the text `5`, so a schema validator built purely on path
  * extracts cannot enforce `type: string`/`boolean` strictly (VERDICT
  * r5–r8, closed by this expression).
  *
  * `elements = false`: kind of the value at the path — one of
  * `string | number | boolean | null | object | array`, or SQL NULL if
  * the path is missing or the document is malformed.
  * `elements = true`: array of element kinds if the path holds an
  * array, SQL NULL otherwise — lets `items` type checks stay strict
  * even though elements travel through `from_json(ArrayType(String))`
  * coercion (which quote-strips scalars exactly like get_json_object).
  *
  * One streaming Jackson pass per evaluation (the same parser family
  * get_json_object uses), `skipChildren` over non-matching subtrees, no
  * DOM allocation; codegen calls the same static helper as interpreted
  * eval (parity by construction, asserted in JsonSchemaLiteSpec).
  * Path steps are object keys only (the shape JsonSchemaLite compiles);
  * first occurrence of a duplicated key wins, matching Jackson's
  * streaming order.
  */
case class JsonTokenKind(child: Expression, steps: Seq[String],
    elements: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    if (elements) ArrayType(StringType) else StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (elements) "json_element_kinds" else "json_token_kind"

  private val stepsArr = steps.toArray

  override def nullSafeEval(s: Any): Any =
    if (elements) JsonTokenKind.elementKindsAt(s.asInstanceOf[UTF8String], stepsArr)
    else JsonTokenKind.kindAt(s.asInstanceOf[UTF8String], stepsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stepsRef = ctx.addReferenceObj("steps", stepsArr, "java.lang.String[]")
    val fn = if (elements) "elementKindsAt" else "kindAt"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JsonTokenKind.$fn($c, $stepsRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): JsonTokenKind = copy(child = newChild)
}

object JsonTokenKind {
  private val factory = new JsonFactory()

  /** Walk object-key steps; returns the value token positioned at the
    * parser, or null if any step is missing / the input is malformed. */
  private def navigate(p: JsonParser, steps: Array[String]): JsonToken = {
    var t = p.nextToken()
    var si = 0
    while (si < steps.length) {
      if (t != JsonToken.START_OBJECT) return null
      var found = false
      var tok = p.nextToken() // FIELD_NAME or END_OBJECT
      while (!found && tok == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        val v = p.nextToken() // the field's value token
        if (name == steps(si)) { t = v; found = true }
        else { p.skipChildren(); tok = p.nextToken() }
      }
      if (!found) return null
      si += 1
    }
    t
  }

  private def kindOf(t: JsonToken): UTF8String = t match {
    case JsonToken.VALUE_STRING => K_STRING
    case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT => K_NUMBER
    case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE => K_BOOLEAN
    case JsonToken.VALUE_NULL => K_NULL
    case JsonToken.START_OBJECT => K_OBJECT
    case JsonToken.START_ARRAY => K_ARRAY
    case _ => null
  }

  private val K_STRING = UTF8String.fromString("string")
  private val K_NUMBER = UTF8String.fromString("number")
  private val K_BOOLEAN = UTF8String.fromString("boolean")
  private val K_NULL = UTF8String.fromString("null")
  private val K_OBJECT = UTF8String.fromString("object")
  private val K_ARRAY = UTF8String.fromString("array")

  /** Shared by interpreted eval and generated code. */
  def kindAt(s: UTF8String, steps: Array[String]): UTF8String = {
    val p = factory.createParser(s.toString)
    try kindOf(navigate(p, steps))
    catch { case _: java.io.IOException => null }
    finally p.close()
  }

  /** Element kinds of the array at the path; null if not an array. */
  def elementKindsAt(s: UTF8String, steps: Array[String]): ArrayData = {
    val p = factory.createParser(s.toString)
    try {
      if (navigate(p, steps) != JsonToken.START_ARRAY) return null
      val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      var tok = p.nextToken()
      while (tok != null && tok != JsonToken.END_ARRAY) {
        out += kindOf(tok)
        if (tok == JsonToken.START_OBJECT || tok == JsonToken.START_ARRAY)
          p.skipChildren()
        tok = p.nextToken()
      }
      new GenericArrayData(out.toArray[Any])
    } catch { case _: java.io.IOException => null }
    finally p.close()
  }

  /** Kind of the raw token at `$.a.b`-style object-key path. */
  def tokenKind(c: Column, steps: Seq[String]): Column =
    ColumnShim.column(JsonTokenKind(ColumnShim.expression(c), steps,
      elements = false))

  /** Element kinds of the array at the path (null if not an array). */
  def elementKinds(c: Column, steps: Seq[String]): Column =
    ColumnShim.column(JsonTokenKind(ColumnShim.expression(c), steps,
      elements = true))
}
