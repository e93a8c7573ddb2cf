package graft.sources

import java.util.Properties

/** Source-connection configuration (reference S10,
  * ApplaudoETL.scala:24-33, 270-275: classpath properties + Azure SAS
  * session conf).
  *
  * Unlike the reference — which ships live-looking credentials inside
  * `application.properties` — values resolve from, in order: explicit
  * overrides, environment variables (UPPER_SNAKE of the key), then an
  * optional classpath/file properties resource. No credential ever
  * lives in the repo.
  */
final class GraftConfig(overrides: Map[String, String] = Map.empty,
                        resource: Option[String] = None) {

  private lazy val fromResource: Map[String, String] = resource match {
    case None => Map.empty
    case Some(r) =>
      val stream = Option(getClass.getResourceAsStream(s"/$r"))
        .orElse {
          val f = new java.io.File(r)
          if (f.exists) Some(new java.io.FileInputStream(f)) else None
        }
      stream.fold(Map.empty[String, String]) { in =>
        try {
          val p = new Properties()
          p.load(in)
          import scala.jdk.CollectionConverters._
          p.asScala.toMap
        } finally in.close()
      }
  }

  private def envKey(key: String): String =
    key.toUpperCase.replaceAll("[.\\-]", "_")

  def get(key: String): Option[String] =
    overrides.get(key)
      .orElse(sys.env.get(envKey(key)))
      .orElse(fromResource.get(key))

  def apply(key: String): String =
    get(key).getOrElse(throw new NoSuchElementException(
      s"config '$key' not set (override, env ${envKey(key)}, or properties)"))

  /** Session conf entries to apply before reading a remote store, e.g.
    * an object-store SAS key (reference ApplaudoETL.scala:33).
    * Each key resolves through [[get]], so the documented precedence
    * (overrides > env > resource) holds here too. Env-only keys are
    * surfaced best-effort by scanning for the prefix's UPPER_SNAKE
    * form and mapping `_` back to `.` — exact for the common
    * `fs.store.key` naming; keys that legitimately contain `_` or `-`
    * need an override or properties entry to appear here. */
  def sessionConf(prefix: String): Map[String, String] = {
    val envPrefix = envKey(prefix)
    val fromEnv = sys.env.keysIterator
      .filter(_.startsWith(envPrefix))
      .map(_.toLowerCase.replace('_', '.'))
    val keys = (fromResource.keySet ++ overrides.keySet ++ fromEnv)
      .filter(_.startsWith(prefix))
    keys.iterator.flatMap(k => get(k).map(k -> _)).toMap
  }
}
