package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** S2 YAML config source: safe-load parsing, dot-path access, section
  * flattening, file loading, env-beats-YAML-beats-default precedence, and
  * rejection of class-instantiation tags (the reason safe_load exists). */
class YamlConfigSpec extends AnyFunSuite {

  private val doc =
    """logging_dir: /var/log/graft/
      |data:
      |  sf_dir: /data/sf1
      |  output_dir: /data/out
      |spark:
      |  cpus: 32
      |  conf:
      |    spark.sql.shuffle.partitions: 32
      |    spark.sql.adaptive.enabled: true
      |jdbc:
      |  url: jdbc:postgresql://db:5432/graft
      |  user: graft
      |  password: secret
      |  nested:
      |    ignored: deep
      |""".stripMargin

  test("dot-path scalars, stringified numbers/bools, missing -> None") {
    val c = YamlConfig.parse(doc)
    assert(c.get("logging_dir").contains("/var/log/graft/"))
    assert(c.get("data.sf_dir").contains("/data/sf1"))
    assert(c.get("spark.cpus").contains("32"))
    assert(c.get("spark.conf.spark.sql.adaptive.enabled").isEmpty,
      "conf keys contain dots — they are section entries, not paths")
    assert(c.get("nope").isEmpty && c.get("data.nope").isEmpty)
    assert(c.get("data").isEmpty, "a mapping is not a scalar")
  }

  test("section flattening is builder/sink-ready; scalars only") {
    val c = YamlConfig.parse(doc)
    assert(c.section("spark.conf") == Map(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.enabled" -> "true"))
    val jdbc = c.section("jdbc")
    assert(jdbc("url") == "jdbc:postgresql://db:5432/graft" && jdbc("user") == "graft")
    assert(!jdbc.contains("nested"), "sub-maps are skipped, not stringified")
    assert(c.section("missing").isEmpty && c.section("logging_dir").isEmpty)
  }

  test("file load (the reference's config_yml_path entry form)") {
    val f = java.nio.file.Files.createTempFile("graft-conf", ".yml")
    java.nio.file.Files.writeString(f, doc)
    try assert(YamlConfig.load(f.toString).get("data.output_dir").contains("/data/out"))
    finally java.nio.file.Files.delete(f)
  }

  test("precedence: env beats YAML beats default") {
    val yml = Some(YamlConfig.parse(doc))
    val env = Map("SPARK_GRAFT_CPUS" -> "8")
    val r = YamlConfig.resolve(env.get, yml) _
    assert(r("SPARK_GRAFT_CPUS", "spark.cpus", "4") == "8")
    assert(r("SPARK_GRAFT_SF_DIR", "data.sf_dir", "/default") == "/data/sf1")
    assert(r("SPARK_GRAFT_SF_DIR", "data.nope", "/default") == "/default")
    assert(YamlConfig.resolve(_ => None, None)("K", "p", "/default") == "/default")
  }

  test("safe-load: class-instantiation tags are rejected, not executed") {
    intercept[org.yaml.snakeyaml.error.YAMLException] {
      YamlConfig.parse("evil: !!java.lang.ProcessBuilder [[echo]]")
    }
    intercept[org.yaml.snakeyaml.error.YAMLException] {
      YamlConfig.parse("evil: !!javax.script.ScriptEngineManager []")
    }
  }

  test("empty/scalar documents yield an empty config") {
    assert(YamlConfig.parse("").get("x").isEmpty)
    assert(YamlConfig.parse("just a string").get("x").isEmpty)
  }
}
