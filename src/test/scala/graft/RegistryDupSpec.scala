package graft

import org.scalatest.funsuite.AnyFunSuite

/** A Scala `Map(...)` literal with a duplicated key silently keeps the
  * LAST entry — so a query accidentally declared twice within one module
  * would silently shadow the original, shrink the registry, and weaken
  * the correctness gate without any error (the cross-module `require` in
  * SparkEntry only catches duplicates BETWEEN modules). This spec scans
  * the source tree for `"name" -> QuerySpec` declarations and asserts
  * every declared name is unique across the whole tree, and that the
  * runtime registry carries exactly the declared set. */
class RegistryDupSpec extends AnyFunSuite {

  private def scalaSources(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).toSeq.flatten.flatMap { f =>
      if (f.isDirectory) scalaSources(f)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    }

  test("no query name is declared twice anywhere in the source tree") {
    val decl = raw""""([A-Za-z0-9_]+)"\s*->\s*QuerySpec\(""".r
    val found = scalaSources(new java.io.File("src/main/scala"))
      .flatMap { f =>
        val text = java.nio.file.Files.readString(f.toPath)
        decl.findAllMatchIn(text).map(m => (m.group(1), f.getPath)).toSeq
      }
    val dups = found.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicated query declarations: ${dups.map { case (n, fs) =>
        s"$n (${fs.map(_._2).mkString(", ")})" }.mkString("; ")}")
    // Declared set == runtime registry (nothing shadowed, nothing lost).
    assert(found.map(_._1).toSet == SparkEntry.queries.keySet)
  }
}
