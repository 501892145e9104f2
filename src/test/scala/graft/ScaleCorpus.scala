package graft

import java.nio.file.{Files, Paths}

/** Shared 12×-replication corpus helpers (GoFrontendScaleSpec +
  * McpScaleSpec): the reference tree's Go files, replicated with
  * per-replica package rewriting (package X → repK_X) so every
  * replica's symbols are distinct and the graph genuinely scales ~12×.
  */
object ScaleCorpus {
  val Replicas = 12

  def referenceFiles(): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get("/root/reference")).iterator().asScala
      .filter(p => p.toString.endsWith(".go"))
      .map(p => (p.toString.stripPrefix("/root/reference/"),
        new String(Files.readAllBytes(p), "UTF-8")))
      .toSeq.sortBy(_._1)
  }

  private val pkgLine = "(?m)^package\\s+(\\w+)".r

  def replicate(base: Seq[(String, String)]): Seq[(String, String)] =
    (0 until Replicas).flatMap { k =>
      base.map { case (path, content) =>
        (s"rep$k/$path",
          pkgLine.replaceAllIn(content,
            m => s"package rep${k}_${m.group(1)}"))
      }
    }

  /** The JDK-17 module opens Spark 4 needs when forked outside
    * spark-submit — shared by every spec that launches `graft.Cli`
    * as a real child JVM. */
  val jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
}
