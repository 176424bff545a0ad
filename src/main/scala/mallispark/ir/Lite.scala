package mallispark.ir

import SchemaIR._

/** Data-first schema building — the `malli.experimental.lite` analogue
  * (reference: src/malli/experimental/lite.cljc:1-23; fixture:
  * test/malli/experimental/lite_test.cljc). Plain key→value pairs build
  * a `:map` schema; values can be SchemaIR nodes, vector-syntax form
  * STRINGS (parsed via [[Export.fromForm]], e.g. `":int"` or
  * `"[:string {:min 1}]"`), nested [[Lite.obj]] maps, or
  * [[Lite.optional]]-wrapped entries.
  *
  * Entry order is the argument order (Scala's `Map` drops ordering past
  * 4 entries, so the map-literal surface of the Clojure original
  * becomes varargs pairs here). */
object Lite {

  /** Marks a map entry optional (lite.cljc `-Optional`). Only valid as
    * an entry value inside [[obj]]. */
  final case class Opt(value: Any)
  def optional(x: Any): Opt = Opt(x)

  def maybe(x: Any): SchemaIR = SMaybe(schema(x))
  def set(x: Any): SchemaIR = SSet(schema(x))
  def vector(x: Any): SchemaIR = SVector(schema(x))
  def mapOf(k: Any, v: Any): SchemaIR = SMapOf(schema(k), schema(v))
  def tuple(xs: Any*): SchemaIR = STuple(xs.map(schema))
  def and(xs: Any*): SchemaIR = SAnd(xs.map(schema))
  def or(xs: Any*): SchemaIR = SOr(xs.map(schema))

  /** The `{:k v}` → `[:map [:k v]]` surface (lite.cljc `-entry`). */
  def obj(entries: (String, Any)*): SchemaIR =
    SMap(entries.map {
      case (k, Opt(inner)) => Entry(k, schema(inner), optional = true)
      case (k, v) => Entry(k, schema(v))
    })

  /** Coerce any lite value to a schema: pass-through for IR nodes,
    * vector-syntax parse for strings, [[obj]] for ordered pair seqs. */
  def schema(x: Any): SchemaIR = x match {
    case s: SchemaIR => s
    case Opt(_) => throw new IllegalArgumentException(
      "Lite.optional is only valid as a map entry value")
    case s: String => Export.fromForm(s)
    case m: scala.collection.immutable.ListMap[_, _] =>
      obj(m.toSeq.map { case (k, v) => (k.toString, v: Any) }: _*)
    case other => throw new IllegalArgumentException(
      s"cannot build a lite schema from $other " +
        "(use a SchemaIR, a form string, Lite.obj, or Lite.optional)")
  }
}
