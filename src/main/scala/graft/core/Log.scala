package graft.core

/** Verbosity-gated stderr logger — the local counterpart of the
  * reference's `logging.getLogger("amaxa")` configured by the CLI `-v`
  * flag (reference `amaxa/__main__.py:31-52`, level map quiet/errors/
  * normal/verbose → NOTSET/ERROR/INFO/DEBUG).
  *
  * Defaults to [[Log.Errors]] so embedded/library use (the `queries()`
  * surface, tests, benchmarks) stays quiet; the CLI sets [[Log.Normal]]
  * — the reference's default — unless `-v` says otherwise. Messages are
  * by-name, so a suppressed level pays nothing: in particular the
  * engines' per-step record counts (reference
  * `amaxa/amaxa.py:560-565`) force a Spark count job and are therefore
  * logged at `verbose` only — the lazy accumulator design must not pay
  * an extra action per step at the default level.
  */
object Log {
  sealed abstract class Level(val rank: Int, val name: String)
  case object Quiet extends Level(0, "quiet")
  case object Errors extends Level(1, "errors")
  case object Normal extends Level(2, "normal")
  case object Verbose extends Level(3, "verbose")

  /** CLI choice strings, reference `amaxa/__main__.py:31-36`. */
  val levels: Map[String, Level] =
    Seq(Quiet, Errors, Normal, Verbose).map(l => l.name -> l).toMap

  @volatile var level: Level = Errors

  def error(msg: => String): Unit = if (level.rank >= Errors.rank) emit(msg)
  def info(msg: => String): Unit = if (level.rank >= Normal.rank) emit(msg)
  def debug(msg: => String): Unit = if (level.rank >= Verbose.rank) emit(msg)

  private def emit(msg: String): Unit = System.err.println(msg)
}
