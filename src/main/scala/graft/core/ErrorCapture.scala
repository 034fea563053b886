package graft.core

import scala.reflect.runtime.universe.TypeTag
import scala.util.control.NonFatal

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import graft.core.model._

/** Typed error capture for arbitrary Scala lambdas — the direct analog of
  * wrapping a user `KeyValueMapper` / `ValueMapper` / flat variants
  * (ErrorCapturingKeyValueMapper.java, ErrorCapturingFlatValueMapper.java).
  *
  * Implemented with one `mapPartitions` pass producing
  * `Processed(value | error)`; `values` / `errors` are narrow filters.
  * Use the expression-level [[ErrorFrame]] API when the transform is
  * SQL-expressible — it stays in codegen. This path exists for logic that
  * genuinely needs Scala.
  */
object ErrorCapture {

  final class Captured[O](val processed: Dataset[Processed[O]]) extends Serializable {
    def values(implicit enc: Encoder[O]): Dataset[O] =
      processed.filter(_.value.isDefined).map(_.value.get)

    def errors: Dataset[CapturedError] = {
      implicit val enc: Encoder[CapturedError] = Encoders.product[CapturedError]
      processed.filter(_.error.isDefined).map(_.error.get)
    }

    /** DLQ records in the reference's DeadLetter.avsc shape. */
    def deadLetters(description: String): Dataset[DeadLetter] = {
      implicit val enc: Encoder[DeadLetter] = Encoders.product[DeadLetter]
      errors.map { e =>
        DeadLetter(
          input_value = e.input,
          topic = None, partition = None, offset = None,
          description = description,
          cause = Cause(Some(e.error_class), e.message, Some(e.stack_trace)),
          input_timestamp = None)
      }
    }
  }

  private def capture[I, O](in: I, f: I => O, show: I => String): Processed[O] =
    try Processed[O](Some(f(in)), None)
    catch {
      case NonFatal(t) =>
        Processed[O](None, Some(CapturedError(
          Option(show(in)), t.getClass.getName,
          Option(t.getMessage), GraftErrors.stackTraceString(t))))
    }

  /** captureErrors(mapper) — one output per input. */
  def map[I, O: TypeTag](ds: Dataset[I])(f: I => O): Captured[O] = {
    implicit val enc: Encoder[Processed[O]] = Encoders.product[Processed[O]]
    new Captured[O](ds.mapPartitions(_.map(i => capture[I, O](i, f, (x: I) => String.valueOf(x)))))
  }

  /** captureErrors(mapper with key) — ErrorCapturingValueMapperWithKey /
    * ErrorCapturingKeyValueMapper: the key rides along and is available
    * to the function.
    */
  def mapWithKey[K, V, O: TypeTag](ds: Dataset[(K, V)])(f: (K, V) => O): Captured[O] =
    map(ds)(t => f(t._1, t._2))

  /** captureErrors(flat mapper) — 0..n outputs per input
    * (ErrorCapturingFlatValueMapper.java). A failure inside the returned
    * iterator is captured too (the reference materializes the iterable
    * inside its try block).
    */
  def flatMap[I, O: TypeTag](ds: Dataset[I])(f: I => IterableOnce[O]): Captured[O] = {
    implicit val enc: Encoder[Processed[O]] = Encoders.product[Processed[O]]
    new Captured[O](ds.mapPartitions(_.flatMap { i =>
      try f(i).iterator.map(o => Processed[O](Some(o), None)).toList
      catch {
        case NonFatal(t) =>
          Processed[O](None, Some(CapturedError(
            Option(String.valueOf(i)), t.getClass.getName,
            Option(t.getMessage), GraftErrors.stackTraceString(t)))) :: Nil
      }
    }))
  }

  /** ErrorLoggingValueMapper.java semantics: log the failing input on the
    * executor, emit only successes.
    */
  def mapLoggingErrors[I, O: TypeTag](ds: Dataset[I])(f: I => O)(implicit enc: Encoder[O]): Dataset[O] =
    ds.mapPartitions { it =>
      val log = org.slf4j.LoggerFactory.getLogger("graft.ErrorLogging")
      it.flatMap { i =>
        try Some(f(i))
        catch {
          case NonFatal(t) =>
            log.error(s"Cannot process ('${String.valueOf(i)}')", t)
            None
        }
      }
    }

  /** ErrorDescribingValueMapper.java semantics: rethrow with the input
    * value in the message so the job failure is debuggable.
    */
  def mapDescribingErrors[I, O: TypeTag](ds: Dataset[I])(f: I => O)(implicit enc: Encoder[O]): Dataset[O] =
    ds.mapPartitions(_.map { i =>
      try f(i)
      catch {
        case NonFatal(t) =>
          throw new RuntimeException(s"Cannot process ('${String.valueOf(i)}')", t)
      }
    })
}
