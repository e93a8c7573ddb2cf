package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  private def propsFile(entries: (String, String)*): String = {
    val f = Files.createTempFile("graft_cfg", ".properties")
    val w = new java.io.PrintWriter(f.toFile, "UTF-8")
    entries.foreach { case (k, v) => w.println(s"$k=$v") }
    w.close()
    f.toString
  }

  test("explicit overrides beat properties-file values") {
    val file = propsFile("fs.store.key" -> "from-file", "other.key" -> "x")
    val cfg = new GraftConfig(
      overrides = Map("fs.store.key" -> "from-override"),
      resource = Some(file))
    assert(cfg("fs.store.key") == "from-override")
    assert(cfg("other.key") == "x")
  }

  test("sessionConf honors the same precedence and prefix filter") {
    val file = propsFile("fs.store.key" -> "from-file",
      "fs.store.other" -> "keep", "unrelated.key" -> "drop")
    val cfg = new GraftConfig(
      overrides = Map("fs.store.key" -> "from-override"),
      resource = Some(file))
    assert(cfg.sessionConf("fs.") == Map(
      "fs.store.key" -> "from-override", "fs.store.other" -> "keep"))
  }

  test("missing key names every lookup layer in the error") {
    val cfg = new GraftConfig()
    val e = intercept[NoSuchElementException] { cfg("absent.key") }
    assert(e.getMessage.contains("ABSENT_KEY")) // env-var spelling included
  }
}
