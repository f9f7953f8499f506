package graft

/** Error ADT mirroring the reference's HTTP status mapping
  * (reference main.rs:114 load→500, main.rs:136/144/152/177/273 →400).
  * Library code throws these; the optional HTTP shell maps them to
  * status codes; tests assert on the subtype.
  */
sealed abstract class GraftException(msg: String) extends RuntimeException(msg)

/** 400-equivalent: bad column, bad cast, empty input, degenerate math. */
final case class BadRequestException(msg: String) extends GraftException(msg)

/** 500-equivalent: dataset failed to load (reference main.rs:114). */
final case class DatasetLoadException(msg: String, cause: Throwable)
    extends GraftException(msg) { initCause(cause) }
