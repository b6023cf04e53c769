package graft.spec

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.yaml.snakeyaml.{LoaderOptions, Yaml => SnakeYaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

/** BOM-tolerant YAML loading to an untyped Scala tree.
  *
  * Several reference files carry a UTF-8 BOM (README.md, .gitignore,
  * YAMLs — SURVEY §1.2) and one filename contains a space
  * (`download-ts-tmin-day copy.yml`); both must load cleanly.
  * SafeConstructor: plain data only, no arbitrary object instantiation.
  */
object Yaml {
  private def yaml = new SnakeYaml(new SafeConstructor(new LoaderOptions))

  def parse(text: String): Any = {
    val clean = if (text.startsWith("\uFEFF")) text.substring(1) else text
    toScala(yaml.load[Any](clean))
  }

  def loadFile(path: Path): Any =
    parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))

  def loadPipeline(path: Path): Pipeline =
    Pipeline.fromYaml(loadFile(path), Some(path.toString))

  /** java.util tree → immutable Scala tree (preserving insertion order
    * is not required by any reference semantics). */
  def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.map(toScala).toList
    case other => other
  }

  /** Render a Scala tree back to YAML (catalog_yaml_sync sink). */
  def dump(v: Any): String = {
    val snake = new SnakeYaml()
    snake.dump(toJava(v))
  }

  def toJava(v: Any): Any = v match {
    case m: Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, x) => jm.put(String.valueOf(k), toJava(x)) }
      jm
    case l: Seq[_] =>
      val jl = new java.util.ArrayList[Any]()
      l.foreach(x => jl.add(toJava(x)))
      jl
    case other => other
  }
}
