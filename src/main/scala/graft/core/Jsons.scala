package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Minimal JSON persistence for engine control state (databases, grants,
 * groups, collection meta, STAC docs). Jackson-databind ships with Spark.
 * Writes are atomic (temp file + move) — the engine's single-writer catalog
 * commit protocol (SURVEY.md §7.4.2).
 */
object Jsons {
  private val mapper = new ObjectMapper()

  /** Scala structures -> JSON text. Maps/Seqs/primitives/null only. */
  def write(value: Any): String = mapper.writeValueAsString(toJava(value))

  def read(text: String): Any = fromJava(mapper.readValue(text, classOf[Object]))

  def save(path: String, value: Any): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, write(value))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def load(path: String): Option[Any] = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(read(Files.readString(p))) else None
  }

  def loadMap(path: String): Map[String, Any] =
    load(path).map(_.asInstanceOf[Map[String, Any]]).getOrElse(Map.empty)

  def loadSeq(path: String): Seq[Any] =
    load(path).map(_.asInstanceOf[Seq[Any]]).getOrElse(Seq.empty)

  private def toJava(v: Any): Object = v match {
    case m: Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, Object]()
      m.foreach { case (k, x) => jm.put(k.toString, toJava(x)) }
      jm
    case s: Seq[_] => s.map(toJava).asJava
    case o: Option[_] => o.map(toJava).orNull
    case other => other.asInstanceOf[Object]
  }

  private def fromJava(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> fromJava(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(fromJava).toSeq
    case i: java.lang.Integer => i.longValue()
    case other => other
  }
}
