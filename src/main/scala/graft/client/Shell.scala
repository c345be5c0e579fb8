package graft.client

import graft.{GraftSession, Tables}
import graft.engine._
import org.apache.spark.sql.DataFrame
import scala.io.StdIn

/** Interactive SQL shell, re-implementing the reference CLI's core surface
  * (`/root/reference/src/client/command_processor.cpp:124-912`): dot-commands
  * (.tables .schema .catalogs .timer .maxrows .mode), SQL statements through
  * the full engine pipeline (guard, intercepts, admission, timeout), and
  * aligned-column or CSV rendering.
  *
  * Run: sbt "runMain graft.client.Shell [sfDir]"   (reads stdin; EOF exits)
  */
object Shell {

  private var timer = false
  private var maxRows = 40
  private var mode = "table" // table | csv | json | jsonl | markdown | line
  private var headers = true
  private var nullValue = "NULL"
  private var output: Option[java.io.PrintWriter] = None
  private var color = false     // .color on: ANSI header/null/keyword styling
  private var pagerSize = 0     // .pager N: page stdout every N lines (0 = off)

  val modes: Set[String] = Set("table", "csv", "json", "jsonl", "markdown", "line")

  def render(df: DataFrame): String =
    renderRows(df.columns, df.limit(maxRows + 1).collect())

  private def csvQuote(v: String): String =
    if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  private def jsonQuote(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One JSON field: raw for numbers/booleans, quoted otherwise. Non-finite
    * floats (NaN/Infinity) are quoted — bare they would make the document
    * invalid JSON.
    */
  private def jsonField(r: org.apache.spark.sql.Row, i: Int): String =
    r.get(i) match {
      case null => "null"
      case b: Boolean => b.toString
      case n: Byte => n.toString
      case n: Short => n.toString
      case n: Int => n.toString
      case n: Long => n.toString
      case n: Float if java.lang.Float.isFinite(n) => n.toString
      case n: Double if java.lang.Double.isFinite(n) => n.toString
      case n: java.math.BigDecimal => n.toString
      case v => jsonQuote(v.toString)
    }

  def renderRows(cols: Array[String], rows: Array[org.apache.spark.sql.Row]): String = {
    val truncated = rows.length > maxRows
    val shown = rows.take(maxRows)
    val cells = shown.map(r => cols.indices.map(i =>
      Option(r.get(i)).map(_.toString).getOrElse(nullValue)).toArray)
    val note = if (truncated) s"\n-- truncated at $maxRows rows" else ""
    mode match {
      case "csv" =>
        val body = cells.map(_.map(csvQuote).mkString(","))
        ((if (headers) Seq(cols.map(csvQuote).mkString(",")) else Seq.empty) ++ body)
          .mkString("\n") + note
      // json/jsonl omit the truncation note: appended after the closing ']'
      // (or as a bare line in jsonl) it would make the output invalid JSON.
      case "json" =>
        shown.map(r => cols.indices.map(i =>
            jsonQuote(cols(i)) + ":" + jsonField(r, i)).mkString("{", ",", "}"))
          .mkString("[", ",", "]")
      case "jsonl" =>
        shown.map(r => cols.indices.map(i =>
            jsonQuote(cols(i)) + ":" + jsonField(r, i)).mkString("{", ",", "}"))
          .mkString("\n")
      case "markdown" =>
        val widths = cols.indices.map(i => (cols(i).length +: cells.map(_(i).length)).max)
        def line(vals: Seq[String]) =
          vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
        (Seq(line(cols.toIndexedSeq),
          widths.map("-" * _).mkString("| ", " | ", " |")) ++
          cells.map(c => line(c.toIndexedSeq))).mkString("\n") + note
      case "line" =>
        val w = if (cols.isEmpty) 0 else cols.map(_.length).max
        cells.map(c => cols.indices.map(i =>
            cols(i).reverse.padTo(w, ' ').reverse + " = " + c(i)).mkString("\n"))
          .mkString("\n\n") + note
      case _ =>
        val widths = cols.indices.map(i => (cols(i).length +: cells.map(_(i).length)).max)
        // ANSI wrapping happens AFTER width computation so alignment is on
        // visible characters, not escape bytes.
        def paint(v: String, w: Int, code: String) = {
          val padded = v.padTo(w, ' ')
          if (color) s"\u001b[${code}m$padded\u001b[0m" else padded
        }
        def line(vals: Seq[String], code: String) =
          vals.zip(widths).map { case (v, w) => paint(v, w, code) }.mkString("| ", " | ", " |")
        def bodyLine(vals: Seq[String]) =
          vals.zip(widths).map { case (v, w) =>
            paint(v, w, if (v == nullValue) "2" else "0")
          }.mkString("| ", " | ", " |")
        val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
        ((if (headers) Seq(sep, line(cols.toIndexedSeq, "1"), sep) else Seq(sep)) ++
          cells.map(c => bodyLine(c.toIndexedSeq)) :+ sep).mkString("\n") + note
    }
  }

  /** ANSI SQL syntax highlighting for echoed statements (reference CLI's
    * renderer, `src/client/output_renderer.cpp` — keywords/strings/numbers/
    * comments). Pure string → string, so the coloring is unit-testable; the
    * shell applies it only when `.color on` and stdout is a terminal.
    */
  private val sqlKeywords = Set(
    "select", "from", "where", "group", "by", "order", "having", "limit",
    "offset", "join", "inner", "left", "right", "full", "cross", "on", "using",
    "union", "intersect", "except", "all", "distinct", "as", "and", "or",
    "not", "in", "exists", "between", "like", "is", "null", "case", "when",
    "then", "else", "end", "cast", "with", "insert", "into", "values",
    "update", "set", "delete", "create", "table", "view", "drop", "describe",
    "explain", "show", "attach", "detach", "use", "copy", "export", "import")

  def highlightSql(sql: String): String = {
    val token = "(?s)('(?:[^']|'')*')|(--[^\n]*)|(\\b\\d+(?:\\.\\d+)?\\b)|(\\b[A-Za-z_][A-Za-z_0-9]*\\b)".r
    token.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        if (m.group(1) != null) s"\u001b[32m${m.group(1)}\u001b[0m"            // string: green
        else if (m.group(2) != null) s"\u001b[2m${m.group(2)}\u001b[0m"        // comment: dim
        else if (m.group(3) != null) s"\u001b[36m${m.group(3)}\u001b[0m"       // number: cyan
        else if (sqlKeywords.contains(m.group(4).toLowerCase))
          s"\u001b[1;34m${m.group(4)}\u001b[0m"                                // keyword: bold blue
        else m.group(4)))
  }

  /** Split rendered output into pager pages of `pageSize` lines (reference
    * CLI's pager, `src/client/shell_loop.cpp`). Pure, for testability; the
    * interactive loop prompts between pages.
    */
  def paginate(text: String, pageSize: Int): Seq[String] =
    text.split("\n", -1).grouped(math.max(1, pageSize)).map(_.mkString("\n")).toSeq

  def handleDot(cmd: String, session: SessionState): String = {
    val parts = cmd.trim.split("\\s+")
    parts.head match {
      case ".tables" =>
        render(SystemCatalog.tables(session.spark,
          tablePattern = parts.lift(1)))
      case ".catalogs" => render(SystemCatalog.catalogs(session.spark))
      case ".schemas" => render(SystemCatalog.dbSchemas(session.spark))
      case ".schema" if parts.length > 1 =>
        session.spark.table(parts(1)).schema.treeString
      case ".timer" => timer = parts.lift(1).forall(_ == "on"); s"timer ${if (timer) "on" else "off"}"
      case ".maxrows" => maxRows = parts.lift(1).flatMap(_.toIntOption).getOrElse(40); s"maxrows $maxRows"
      case ".mode" =>
        val m = parts.lift(1).getOrElse("table")
        if (modes.contains(m)) { mode = m; s"mode $mode" }
        else s"unknown mode '$m' (${modes.toSeq.sorted.mkString("|")})"
      case ".headers" => headers = parts.lift(1).forall(_ == "on"); s"headers ${if (headers) "on" else "off"}"
      case ".nullvalue" => nullValue = parts.lift(1).getOrElse("NULL"); s"nullvalue $nullValue"
      case ".color" => color = parts.lift(1).forall(_ == "on"); s"color ${if (color) "on" else "off"}"
      case ".pager" =>
        pagerSize = parts.lift(1) match {
          case Some("off") | None => 0
          case Some("on") => 40
          case Some(n) => n.toIntOption.getOrElse(0)
        }
        if (pagerSize > 0) s"pager $pagerSize lines" else "pager off"
      case ".output" =>
        output.foreach(_.close())
        output = parts.lift(1).filter(_ != "stdout").map(f =>
          new java.io.PrintWriter(new java.io.FileWriter(f)))
        s"output ${parts.lift(1).getOrElse("stdout")}"
      case ".settings" => render(session.spark.table("gizmosql_settings"))
      case ".help" =>
        ".tables [pattern] | .schema <table> | .catalogs | .schemas | .settings | " +
          ".timer on|off | .maxrows N | .mode table|csv|json|jsonl|markdown|line | " +
          ".headers on|off | .nullvalue S | .color on|off | .pager N|on|off | " +
          ".output FILE|stdout | .quit"
      case ".quit" | ".exit" => null
      case other => s"unknown command: $other (try .help)"
    }
  }

  /** Remote mode: `Shell --http <url> <user> <password>` — authenticates via
    * the server's Basic→JWT handshake, then streams SQL lines over the wire
    * (JSON row arrays back), like the reference CLI against its Flight server.
    */
  private def httpMain(url: String, user: String, password: String): Unit = {
    val client = java.net.http.HttpClient.newHttpClient()
    def post(path: String, body: String, headers: (String, String)*) = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url + path))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      headers.foreach { case (k, v) => b.header(k, v) }
      client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    }
    val creds = java.util.Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes("UTF-8"))
    val auth = post("/auth", "", "Authorization" -> s"Basic $creds")
    if (auth.statusCode() != 200) { println(s"auth failed: ${auth.body()}"); return }
    val token = auth.body().split("\"token\":\"")(1).split("\"")(0)
    println(s"graft shell — connected to $url")
    try {
      var line: String = null
      while ({ line = StdIn.readLine("graft> "); line != null }) {
        val input = line.trim
        if (input == ".quit" || input == ".exit") return
        else if (input.nonEmpty) {
          val resp = post("/sql", input.stripSuffix(";"),
            "Authorization" -> s"Bearer $token", "Accept" -> "application/json")
          println(if (resp.statusCode() == 200) resp.body()
          else s"error ${resp.statusCode()}: ${resp.body()}")
        }
      }
    } finally
      // release the server-side session (isolated SparkSession + views)
      post("/close", "", "Authorization" -> s"Bearer $token")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--http")) {
      args.lift(1) match {
        case None => println("usage: Shell --http <url|gizmosql://host:port?...> [user] [password]")
        case Some(raw) if raw.startsWith("gizmosql://") =>
          // reference-style connection URI + env fallbacks (client_config.cpp)
          ClientConfig.parseUri(raw) match {
            case Left(err) => println(s"error: $err")
            case Right(parsed) =>
              val c = ClientConfig.resolveEnv(parsed)
              val scheme = if (c.useTls) "https" else "http"
              httpMain(s"$scheme://${c.host}:${c.port}",
                args.lift(2).orElse(Option(c.username).filter(_.nonEmpty))
                  .getOrElse("gizmosql_username"),
                args.lift(3).orElse(Option(c.password).filter(_ => c.passwordProvided))
                  .getOrElse("gizmosql_password"))
          }
        case Some(url) =>
          val env = ClientConfig.resolveEnv(ClientConfig())
          httpMain(url,
            args.lift(2).orElse(Option(env.username).filter(_.nonEmpty))
              .getOrElse("gizmosql_username"),
            args.lift(3).orElse(Option(env.password).filter(_ => env.passwordProvided))
              .getOrElse("gizmosql_password"))
      }
      return
    }
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    val global = new GlobalSettings
    val sessions = new SessionManager(spark, global)
    val admission = new AdmissionController(4, 32, 300)
    val session = sessions.getOrCreate(java.util.UUID.randomUUID().toString,
      sys.env.getOrElse("USER", "local"), "admin")
    Tables.ensure(session.spark, dir)
    Statement.registerPseudoFunctions(session, "local-instance", "local-cluster")
    Statement.refreshSettingsView(session)
    SystemCatalog.install(session.spark)

    println(s"graft shell (${Statement.Version}) — tables from $dir — .help for commands")
    var line: String = null
    while ({ line = StdIn.readLine("graft> "); line != null }) {
      val input = line.trim
      if (input.nonEmpty) {
        try {
          if (input.startsWith(".")) {
            val out = handleDot(input, session)
            if (out == null) return
            println(out)
          } else {
            // With color on, echo the statement back highlighted (the
            // no-line-editor stand-in for as-you-type highlighting);
            // terminal sessions only — piped input stays clean.
            if (color && System.console() != null) println(highlightSql(input))
            val t0 = System.nanoTime()
            // Full pipeline: guard + intercepts (create), then admission slot
            // and gizmosql.query_timeout around the collection.
            val df = Statement.create(sessions, session, global, input.stripSuffix(";"))
            val timeout = session.settings.get("gizmosql.query_timeout")
              .flatMap(_.toLongOption).getOrElse(0L)
            val rows = admission.withSlot(bypass = false, () => session.killRequested) {
              Statement.executeWithTimeout(session, timeout)(df.limit(maxRows + 1).collect())
            }
            // Never write ANSI codes into a redirected output file.
            val rendered = {
              val c0 = color
              if (output.isDefined) color = false
              try renderRows(df.columns, rows) finally color = c0
            }
            output match {
              // rows holds up to maxRows+1 (the truncation probe); only
              // maxRows of them were rendered.
              case Some(w) =>
                w.println(rendered); w.flush()
                val written = math.min(rows.length, maxRows)
                val more = if (rows.length > maxRows) " (truncated)" else ""
                println(s"-- $written rows written$more")
              case None =>
                // Prompt between pages only on a real terminal: with piped
                // input the readLine would consume the NEXT SQL statements
                // as page-continue keypresses.
                if (pagerSize > 0 && System.console() != null) {
                  val pages = paginate(rendered, pagerSize)
                  pages.zipWithIndex.foreach { case (p, i) =>
                    println(p)
                    if (i < pages.size - 1) StdIn.readLine(s"-- more (${i + 1}/${pages.size}, enter) --")
                  }
                } else println(rendered)
            }
            if (timer) println(f"-- ${(System.nanoTime() - t0) / 1e9}%.3f s")
          }
        } catch {
          case e: Exception => println(s"error: ${e.getMessage}")
        }
      }
    }
  }
}
