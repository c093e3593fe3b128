package graft

/** Typed error taxonomy for the pipeline.
  *
  * Mirrors the reference's four per-module exception classes
  * (reference: src/etl/config.py:11-12 ConfigError, src/etl/extract.py:14-15
  * ExtractionError, src/etl/transform.py:12-13 TransformationError,
  * src/etl/load.py:14-15 LoadError), re-expressed as a sealed Scala
  * hierarchy so callers can match exhaustively. Messages stay actionable,
  * following the reference's style (auth hints etc., extract.py:26-29).
  */
sealed abstract class PipelineError(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

final case class ConfigError(msg: String, cause: Throwable = null)
    extends PipelineError(msg, cause)
final case class ExtractError(msg: String, cause: Throwable = null)
    extends PipelineError(msg, cause)
final case class TransformError(msg: String, cause: Throwable = null)
    extends PipelineError(msg, cause)
final case class LoadError(msg: String, cause: Throwable = null)
    extends PipelineError(msg, cause)
