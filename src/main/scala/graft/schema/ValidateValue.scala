package graft.schema

import scala.collection.immutable.ListMap
import java.util.IdentityHashMap

/** Driver-side data validation + normalization against a schema — the analog
  * of the reference's `validate` API (reference: frontend.lua:740–938
  * copy_data) with its exact error contract (goldens:
  * test/ddt_suite/validate.lua): `Not a int: 42.1`, `Field X missing`,
  * `Z: Unknown field`, `XXX: Unexpected key in union` — note this is a
  * DIFFERENT message family from the compiled flatten/unflatten runtime
  * errors (`Expecting INT, encountered STR`), which live in
  * [[graft.ops.ConvertValue]] and [[graft.ops.Validate]].
  */
object ValidateValue {

  /** Rendered MsgPack-ish type token of a runtime value — used by the
    * *runtime* error family (reference: runtime.lua:193–197 typenames).
    */
  def typeToken(v: Any): String = v match {
    case null => "NIL"
    case false => "FALSE"
    case true => "TRUE"
    case _: Int | _: Long | _: Short | _: Byte | _: BigInt => "LONG"
    case _: Float => "FLOAT"
    case _: Double => "DOUBLE"
    case _: String => "STR"
    case _: Array[Byte] => "BIN"
    case _: Seq[_] => "ARRAY"
    case _: Map[_, _] => "MAP"
    case _ => "EXT"
  }

  /** Lua-style value rendering for validate errors
    * (`Not a int: 42.1`, `Not a string: 42`).
    */
  private def render(v: Any): String = v match {
    case null => "nil"
    case s: String => s
    case d: Double => if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case f: Float => render(f.toDouble)
    case b: Array[Byte] => new String(b, "ISO-8859-1")
    case other => other.toString
  }

  final class Ctx(val schema: AvroSchema) {
    val path = scala.collection.mutable.ArrayBuffer.empty[String]
    val visiting = new IdentityHashMap[AnyRef, AnyRef]()
    def fail(msg: String): Nothing = {
      val p = path.mkString("/")
      throw new ValidationFailure(if (p.isEmpty) msg else s"$p: $msg")
    }
    def in[A](seg: String)(body: => A): A = {
      path += seg
      try body finally path.remove(path.length - 1)
    }
  }

  final class ValidationFailure(val msg: String) extends RuntimeException(msg)

  /** JSON value → runtime value (for defaults and JSON-ingested data). */
  def fromJson(j: JValue): Any = j match {
    case JNull => null
    case JBool(b) => b
    case JLong(n) => n
    case JDouble(d) => d
    case JString(s) => s
    case JArray(items) => items.map(fromJson)
    case JObject(fields) =>
      ListMap(fields.map { case (k, v) => k -> fromJson(v) }: _*)
  }

  def validate(schema: AvroSchema, data: Any): Either[String, Any] = {
    val ctx = new Ctx(schema)
    try Right(check(ctx, schema.root, data))
    catch { case e: ValidationFailure => Left(e.msg) }
  }

  /** Default values are given in first-branch form for unions
    * (reference: frontend.lua:974–987).
    */
  def validateDefault(schema: AvroSchema, t: AvroType,
      default: JValue): Either[String, Any] = {
    val ctx = new Ctx(schema)
    try Right(schema.resolve(t) match {
      case u: UnionType => check(ctx, u.branches.head, fromJson(default))
      case resolved if resolved.nullable && default == JNull => null
      case resolved => check(ctx, resolved, fromJson(default))
    })
    catch { case e: ValidationFailure => Left(e.msg) }
  }

  private def intInRange(v: Long): Boolean =
    v >= Int.MinValue && v <= Int.MaxValue

  private def asLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  private def asNumber(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case _ => None
  }

  /** `Not a <name>: <value>` — named types use their type NAME
    * (`Not a fixed16: …`, `Not a foo: …`, validate.lua:401–441).
    */
  private def notA(ctx: Ctx, t: AvroType, v: Any): Nothing = {
    val name = t match {
      case n: NamedType => n.name
      case other => other.typeName
    }
    ctx.fail(s"Not a $name: ${render(v)}")
  }

  def check(ctx: Ctx, tpe: AvroType, data: Any): Any = {
    val t = ctx.schema.resolve(tpe)
    if (data == null) {
      t match {
        case PrimitiveType("null", _) => return null
        case _ if t.nullable => return null
        case u: UnionType =>
          if (u.branches.exists(_.typeName == "null")) return null
          else ctx.fail("Unexpected type in union: null")
        case PrimitiveType("any", _) => return null
        case _ => notA(ctx, t, data)
      }
    }
    t match {
      case PrimitiveType("null", _) => notA(ctx, t, data)
      case PrimitiveType("any", _) => data
      case PrimitiveType("boolean", _) => data match {
        case b: Boolean => b
        case _ => notA(ctx, t, data)
      }
      case PrimitiveType("int", _) => asLong(data) match {
        case Some(v) if intInRange(v) => v
        case _ => notA(ctx, t, data)
      }
      case PrimitiveType("long", _) => asLong(data) match {
        case Some(v) => v
        case None => notA(ctx, t, data)
      }
      case PrimitiveType("float" | "double", _) => asNumber(data) match {
        case Some(v) => v
        case None => notA(ctx, t, data)
      }
      case PrimitiveType("string", _) => data match {
        case s: String => s
        case _ => notA(ctx, t, data)
      }
      case PrimitiveType("bytes", _) => data match {
        case b: Array[Byte] => b
        case s: String => s
        case _ => notA(ctx, t, data)
      }
      case f: FixedType =>
        val ok = data match {
          case b: Array[Byte] => b.length == f.size
          case s: String => s.length == f.size
          case _ => false
        }
        if (!ok) notA(ctx, f, data)
        data
      case e: EnumType => data match {
        case s: String if e.symbolIndex.contains(s) => s
        case _ => notA(ctx, e, data)
      }
      case a: ArrayType => data match {
        case xs: Seq[_] => cycleGuard(ctx, xs) {
          xs.zipWithIndex.map { case (x, i) =>
            ctx.in((i + 1).toString)(check(ctx, a.items, x))
          }
        }
        case _ => notA(ctx, a, data)
      }
      case m: MapType => data match {
        case kv: Map[_, _] => cycleGuard(ctx, kv) {
          ListMap(kv.toSeq.map {
            case (k: String, v) => k -> ctx.in(k)(check(ctx, m.values, v))
            case (k, _) => ctx.fail(s"Non-string map key: ${render(k)}")
          }: _*)
        }
        case _ => notA(ctx, m, data)
      }
      case r: RecordType => data match {
        case kv: Map[_, _] => cycleGuard(ctx, kv) {
          val fieldsByName = r.fields.map(f => f.name -> f).toMap
          val aliasTo = r.fields.flatMap(f => f.aliases.map(_ -> f.name)).toMap
          kv.keys.foreach {
            case k: String =>
              if (!fieldsByName.contains(k) && !aliasTo.contains(k))
                ctx.in(k)(ctx.fail("Unknown field"))
            case k => ctx.fail(s"Non-string map key: ${render(k)}")
          }
          val smap = kv.asInstanceOf[Map[String, Any]]
          ListMap(r.fields.flatMap { f =>
            val present = smap.get(f.name)
              .orElse(f.aliases.collectFirst {
                case a if smap.contains(a) => smap(a) })
            present match {
              case Some(v) => Some(f.name -> ctx.in(f.name)(check(ctx, f.tpe, v)))
              case None => f.default match {
                case Some(d) =>
                  Some(f.name -> ctx.in(f.name)(defaultValue(ctx, f.tpe, d)))
                case None =>
                  val ft = ctx.schema.resolve(f.tpe)
                  if (ft.nullable) Some(f.name -> null)
                  else ft match {
                    case u: UnionType
                        if u.branches.exists(_.typeName == "null") =>
                      Some(f.name -> null)
                    case _ => ctx.fail(s"Field ${f.name} missing")
                  }
              }
            }
          }: _*)
        }
        case _ => notA(ctx, r, data)
      }
      case u: UnionType => data match {
        case kv: Map[_, _] =>
          if (kv.size > 1) {
            // reference walks next(data): the extra key — the first one
            // that is not the consumed branch key — is reported
            // (frontend.lua:906–918, validate.lua:377–386)
            kv.keys.collectFirst { case k if !k.isInstanceOf[String] =>
              ctx.fail(s"Non-string map key: ${render(k)}")
            }
            val keys = kv.keys.collect { case s: String => s }.toVector
            val extra = keys
              .find(k => !u.branches.exists(b =>
                branchTag(ctx.schema, b) == k))
              .getOrElse(keys(1))
            ctx.in(extra)(ctx.fail("Unexpected key in union"))
          }
          if (kv.size != 1) notA(ctx, u, data)
          val (k, v) = kv.head match {
            case (k: String, v) => (k, v)
            case (k, _) => ctx.fail(s"Non-string map key: ${render(k)}")
          }
          val branch = u.branches.find(b => branchTag(ctx.schema, b) == k)
          branch match {
            case Some(b) => ListMap(k -> ctx.in(k)(check(ctx, b, v)))
            case None => ctx.in(k)(ctx.fail("Unexpected key in union"))
          }
        case _ => notA(ctx, u, data)
      }
      case ref: Reference => check(ctx, ctx.schema.resolve(ref), data)
    }
  }

  private def defaultValue(ctx: Ctx, t: AvroType, d: JValue): Any =
    ctx.schema.resolve(t) match {
      case u: UnionType =>
        if (d == JNull) null
        else ListMap(branchTag(ctx.schema, u.branches.head) ->
          check(ctx, u.branches.head, fromJson(d)))
      case resolved if resolved.nullable && d == JNull => null
      case resolved => check(ctx, resolved, fromJson(d))
    }

  /** Union branch discriminator (reference: frontend.lua:899–919 — the name
    * for named types, the bare type name otherwise).
    */
  def branchTag(schema: AvroSchema, b: AvroType): String =
    schema.resolve(b) match {
      case n: NamedType => n.fullName
      case other => other.typeName
    }

  private def cycleGuard[A](ctx: Ctx, ref: AnyRef)(body: => A): A = {
    if (ctx.visiting.containsKey(ref))
      ctx.fail("Infinite loop detected in the data")
    ctx.visiting.put(ref, ref)
    try body finally ctx.visiting.remove(ref)
  }
}
