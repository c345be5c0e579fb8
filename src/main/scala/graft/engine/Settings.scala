package graft.engine

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Declarative settings registry, re-implementing the reference's
  * `SET [SESSION|GLOBAL] gizmosql.*` surface
  * (`/root/reference/src/duckdb/duckdb_statement.cpp:1196-1622`): same
  * setting names, scopes, types, env-var fallbacks and defaults. GLOBAL
  * writes require the admin role; SESSION values overlay GLOBAL ones.
  */
object Settings {

  sealed trait SettingType { def validate(v: String): Either[String, String] }
  case object IntSetting extends SettingType {
    def validate(v: String): Either[String, String] =
      v.toLongOption.map(_ => v).toRight(s"expected integer, got '$v'")
  }
  case object BoolSetting extends SettingType {
    def validate(v: String): Either[String, String] =
      if (Set("true", "false").contains(v.toLowerCase)) Right(v.toLowerCase)
      else Left(s"expected boolean, got '$v'")
  }
  case object StringSetting extends SettingType {
    def validate(v: String): Either[String, String] = Right(v)
  }

  final case class SettingDef(
      name: String, typ: SettingType, envVar: String, default: String,
      sessionScoped: Boolean = true, globalScoped: Boolean = true)

  /** Same registry contents as the reference (names/defaults at
    * `duckdb_statement.cpp:1196-1622`; queue defaults
    * `gizmosql_library.h:42-44`).
    */
  val defs: Seq[SettingDef] = Seq(
    SettingDef("gizmosql.query_timeout", IntSetting, "GIZMOSQL_QUERY_TIMEOUT", "0"),
    SettingDef("gizmosql.query_log_level", StringSetting, "GIZMOSQL_QUERY_LOG_LEVEL", "info"),
    SettingDef("gizmosql.auth_log_level", StringSetting, "GIZMOSQL_AUTH_LOG_LEVEL", "info",
      sessionScoped = false),
    SettingDef("gizmosql.capture_query_profile", BoolSetting, "GIZMOSQL_CAPTURE_QUERY_PROFILE", "false"),
    SettingDef("gizmosql.bypass_queue", BoolSetting, "GIZMOSQL_BYPASS_QUEUE", "false"),
    SettingDef("gizmosql.session_tag", StringSetting, "GIZMOSQL_SESSION_TAG", ""),
    SettingDef("gizmosql.query_tag", StringSetting, "GIZMOSQL_QUERY_TAG", ""),
    SettingDef("gizmosql.max_concurrent_statements", IntSetting, "GIZMOSQL_MAX_CONCURRENT_STATEMENTS", "0",
      sessionScoped = false),
    SettingDef("gizmosql.max_queued_statements", IntSetting, "GIZMOSQL_MAX_QUEUED_STATEMENTS", "0",
      sessionScoped = false),
    SettingDef("gizmosql.max_queue_wait", IntSetting, "GIZMOSQL_MAX_QUEUE_WAIT", "300",
      sessionScoped = false),
    SettingDef("gizmosql.graceful_shutdown", BoolSetting, "GIZMOSQL_GRACEFUL_SHUTDOWN", "true",
      sessionScoped = false),
    SettingDef("gizmosql.shutdown_grace_period_seconds", IntSetting, "GIZMOSQL_SHUTDOWN_GRACE_PERIOD_SECONDS", "30",
      sessionScoped = false))

  val byName: Map[String, SettingDef] = defs.map(d => d.name -> d).toMap

  def defaultFor(d: SettingDef): String = sys.env.getOrElse(d.envVar, d.default)
}

/** Global (server-wide) settings store. */
final class GlobalSettings {
  private val values = new ConcurrentHashMap[String, String]()
  // Components sized from global settings (e.g. the admission controller,
  // `gizmosql_library.h:42-44`) subscribe here so a successful SET GLOBAL
  // actually re-governs the engine, mirroring the reference where the
  // setting writes through to the live AdmissionController
  // (`duckdb_statement.cpp:1540-1570`).
  private val listeners = new java.util.concurrent.CopyOnWriteArrayList[(String, String) => Unit]()

  def onChange(f: (String, String) => Unit): Unit = listeners.add(f)

  def get(name: String): Option[String] =
    Settings.byName.get(name).map(d => Option(values.get(name)).getOrElse(Settings.defaultFor(d)))

  def set(name: String, value: String, isAdmin: Boolean): Either[String, Unit] =
    Settings.byName.get(name) match {
      case None => Left(s"unknown setting '$name'")
      case Some(d) if !d.globalScoped => Left(s"setting '$name' has no GLOBAL scope")
      case Some(_) if !isAdmin => Left("GLOBAL settings require the admin role")
      case Some(d) => d.typ.validate(value).map { v =>
        values.put(name, v)
        listeners.forEach(_.apply(name, v))
      }.map(_ => ())
    }

  def snapshot: Map[String, String] =
    Settings.defs.map(d => d.name -> get(d.name).get).toMap
}

/** Per-session overlay over the global store. */
final class SessionSettings(global: GlobalSettings) {
  private val values = new ConcurrentHashMap[String, String]()

  def get(name: String): Option[String] =
    Option(values.get(name)).orElse(global.get(name))

  def set(name: String, value: String): Either[String, Unit] =
    Settings.byName.get(name) match {
      case None => Left(s"unknown setting '$name'")
      case Some(d) if !d.sessionScoped => Left(s"setting '$name' is GLOBAL-only")
      case Some(d) => d.typ.validate(value).map(v => values.put(name, v)).map(_ => ())
    }

  /** Rows for the `gizmosql_settings()` table function: (name, value, scope). */
  def rows: Seq[(String, String, String)] =
    Settings.defs.map { d =>
      val sessionOverride = Option(values.get(d.name))
      (d.name, sessionOverride.orElse(global.get(d.name)).getOrElse(""),
        if (sessionOverride.isDefined) "SESSION" else "GLOBAL")
    }
}
