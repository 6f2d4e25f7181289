package graft

import org.apache.spark.sql.SparkSession

/** Validated session-conf accessors shared across the packs (one parser,
  * one error message — previously copy-pasted per knob). */
object Confs {
  def long(s: SparkSession, key: String, default: Long): Long =
    s.conf.getOption(key).map { raw =>
      try raw.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$key must be a long, got '$raw'")
      }
    }.getOrElse(default)
}
